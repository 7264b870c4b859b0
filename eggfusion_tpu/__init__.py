"""EggFusion-TPU: a TPU-native real-time RGB-D dense SLAM / 3D reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of EGG-Fusion
("Efficient 3D Reconstruction with Geometry-aware Gaussian Surfel on the Fly",
reference: panxkun/eggfusion). The compute path is pure JAX (jit/XLA + Pallas
TPU kernels); the host side is a thin driver with threaded prefetch.

Layer map (mirrors reference /root/reference SURVEY.md §1, redesigned TPU-first):
  CLI / entry            eggfusion_tpu.main
  System orchestration   eggfusion_tpu.system.EGGFusion
  Tracking               eggfusion_tpu.core.tracker (jitted pyramid Gauss-Newton)
  Mapping                eggfusion_tpu.core.mapper / core.surfels / core.renderer
  Frame / pyramid        eggfusion_tpu.core.frame / ops.pyramid
  Data                   eggfusion_tpu.data (TUM/Replica/ScanNet++/Azure/synthetic)
  Math / eval            eggfusion_tpu.geometry, eggfusion_tpu.utils.eval
  Kernels                eggfusion_tpu.ops (XLA + Pallas TPU kernels)
  Multi-chip             eggfusion_tpu.parallel (mesh / pjit shardings)
"""

__version__ = "0.1.0"

# Geometry correctness: TPU matmuls default to bf16 inputs, which injects
# ~0.4% relative noise into every pose/vertex transform, decimation-matmul
# and J^T J reduction (measured: synthetic-sequence ATE 0.53cm -> 3.1cm).
# None of this framework's matmuls are FLOP-bound (they are 3x3/6xN/banded
# image operators riding the MXU for layout reasons), so full-f32 passes are
# free; kernels that deliberately want bf16 throughput opt in locally via
# `precision=` / `jax.default_matmul_precision`.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
