"""Per-device-count scaling table for the multichip dryrun (VERDICT r2 #6).

Runs the production-renderer data-parallel opt step + sharded fusion at
256x128 / 16k surfels on 2/4/8-device virtual CPU meshes and writes
`results/mesh_scaling.json`. The interesting column off-TPU is that the
SPMD program compiles and executes at every device count with fused counts
in the hundreds; the timing column becomes meaningful on a real pod.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/mesh_scaling.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")


def main():
    import jax

    # the axon sitecustomize pin overrides JAX_PLATFORMS env; only the
    # config route forces the virtual-device CPU platform (the TPU is a
    # single chip — and shared: a stray client wedges the tunnel)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

    rows = []
    for n in (2, 4, 8):
        if n > len(jax.devices()):
            print(f"skip {n} devices (have {len(jax.devices())})")
            continue
        from eggfusion_tpu.parallel.mesh import run_multichip_dryrun

        rows.append(run_multichip_dryrun(n))
    os.makedirs("results", exist_ok=True)
    with open("results/mesh_scaling.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
