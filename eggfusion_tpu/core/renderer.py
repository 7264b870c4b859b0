"""Renderer facade: selects the rasterizer backend.

Interface contract = reference `Renderer.render` (`/root/reference/src/core/
render.py:53-104`): given a camera and surfel render params, produce
color/normal/depth/opacity maps. Outputs are channel-last (H, W, C) —
TPU lane-friendly — where the reference returns (C, H, W) and permutes at
every call site.

Backends:
  "xla"    — golden depth-sorted compositor (`ops.raster_xla`), exact,
             O(N*H*W); default on CPU/tests.
  "pallas" — tile-binned Pallas TPU kernel (`ops.raster_pallas`);
             default on TPU.
"""
from __future__ import annotations

import jax

from eggfusion_tpu.ops.raster_xla import render_xla


def _default_backend() -> str:
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


class Renderer:
    def __init__(self, cfg, backend: str | None = None):
        surfel = cfg.Surfel
        self.max_sh_degree = int(surfel.max_sh_degree)
        active = int(surfel.active_sh_degree)
        self.active_sh_degree = self.max_sh_degree if active < 0 else active
        self.backend = backend or str(cfg.System.get("render_backend", "")) or _default_backend()
        # Per-tile entry capacity of the Pallas compositor (4 sub-columns of
        # cap/4 entries each). THE at-scale quality knob: at production
        # densities (>=0.25 surfels/pixel — 20k at 320x240, 600k at
        # 1280x704) cap 512 overflows every sub-column and drops ~60-80% of
        # the image (measured: 60% empty pixels vs the XLA oracle's 4% on
        # the same 20k-surfel map), which the mapper misreads as uncovered
        # space and floods with spawns until the map saturates. 2048 holds
        # ~4 fused layers per pixel; compile time is cap-independent (the
        # sweep is a while_loop) and runtime is bounded by the per-tile
        # deepest sub-column COUNT (round 5: transmittance exits measurably
        # never fire on fused maps — raster_pallas EXIT_MODE). Reference
        # comparison: the CUDA
        # rasterizer uses variable-length per-tile lists — no cap at all
        # (`diff_gaussian_rasterization`, SURVEY N2).
        self.raster_cap = int(cfg.System.get("raster_cap", 2048))
        # Entry capacity for OPTIMIZATION renders (gradient path only). The
        # coverage-critical renders (spawn mask + tracking model view) must
        # never overflow — holes there trigger the spawn-flood death spiral
        # (cap 1024 live: PSNR 10.8, map 321k; see ACCURACY.md) — but the
        # optimization render only feeds gradients against keyframes of a
        # HEALTHY map, whose occupancy fits a smaller slab (measured max
        # sub-column count 244 < 1024/4 on the 134k production map), and the
        # stratified tail degrades overflow gracefully. Priced end-to-end by
        # the `optcap1024` A/B arm (ATE 0.0009 cm, PSNR 29.49 vs 29.61 —
        # noise-level — at -23 ms/frame), hence default 1024 (never above
        # raster_cap). 0 = use raster_cap.
        self.opt_raster_cap = min(
            int(cfg.System.get("opt_raster_cap", 0)) or 1024, self.raster_cap
        )
        # Adaptive MODEL-render cap (round 5). The per-frame fusion/spawn/
        # tracking render is coverage-critical: a fixed cap 1024 death-spirals
        # during map FORMATION (overflow holes -> spawn flood, ACCURACY.md),
        # so 2048 was the blanket default — but on a HEALTHY steady map the
        # true occupancy fits the 1024 slab with its stratified tail, and the
        # 2048 render pays double slab-gather + sweep (~6 ms/frame at the
        # 155k rung). The mapper therefore renders at `model_cap_min` only
        # while the measured occupancy signal (max sub-column candidate
        # count, shipped with the lag-N fusion stats) stays safely under the
        # small slab's stratified ceiling, and escalates back to raster_cap
        # the moment it rises — the death spiral is impossible by
        # construction because the signal is the pre-clip TRUE occupancy.
        self.adaptive_model_cap = (
            bool(cfg.System.get("adaptive_model_cap", True))
            and self.backend == "pallas"
        )
        self.model_cap_min = min(
            int(cfg.System.get("model_cap_min", 0)) or 1024, self.raster_cap
        )

    def render(self, frame, params: dict) -> dict:
        """Render `params` from `frame`'s current pose estimate."""
        return self.render_at(params, frame.w2c_matrix(), frame.intr, frame.width, frame.height)

    def render_at(self, params: dict, w2c, intr, width: int, height: int, cache=None,
                  geom_only: bool = False, need_grad: bool = True,
                  tile_keep=None, cap: int | None = None,
                  with_occupancy: bool = False) -> dict:
        """`geom_only=True` returns only {depth, opacity} — the fusion/spawn
        render (`mapper.map_update`) reads nothing else, and the Pallas
        backend then skips SH + color/normal compositing. `need_grad=False`
        (forward-only renders) skips the gradient back-map sort. `tile_keep`
        (Pallas only) composites a tile subset — stochastic map optimization.
        `cap` overrides the entry capacity (must match `cache`'s, if any).
        `with_occupancy` (Pallas only) adds "max_occupancy" — the true
        deepest sub-column candidate count, the adaptive model-cap signal."""
        if self.backend == "pallas":
            from eggfusion_tpu.ops.raster_pallas import render_pallas

            return render_pallas(params, w2c, intr, width, height,
                                 sh_degree=self.active_sh_degree,
                                 cap=cap or self.raster_cap,
                                 binning=cache, geom_only=geom_only,
                                 need_grad=need_grad, tile_keep=tile_keep,
                                 with_occupancy=with_occupancy)
        out = render_xla(params, w2c, intr, width, height, sh_degree=self.active_sh_degree)
        if geom_only:
            out = {"depth": out["depth"], "opacity": out["opacity"]}
        return out

    def precompute_cache(self, params: dict, w2c, intr, width: int, height: int,
                         cap: int | None = None):
        """Per-camera render cache (tile binning), reusable across a few
        optimization steps on the same camera; None for backends without one."""
        if self.backend == "pallas":
            from eggfusion_tpu.ops.raster_pallas import compute_binning

            return compute_binning(params, w2c, intr, width, height,
                                   cap=cap or self.raster_cap)
        return None
