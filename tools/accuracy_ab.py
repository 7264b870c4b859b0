"""Accuracy cost of the TPU-fast deviations at Replica scale (VERDICT r1 #5).

Runs the synthetic end-to-end pipeline at 1280x704 twice on the same
sequence — once with reference-exact settings (solver_stride=1,
opt_tile_fraction=1.0: every solver pixel, every optimization pixel, every
step) and once with the shipped TPU-fast defaults (solver_stride=2,
opt_tile_fraction=0.5) — and reports ATE RMSE + render metrics side by
side, plus throughput. The remaining deviation (the Pallas rasterizer's
footprint truncation vs the exhaustive XLA oracle) is measured separately
by `tools/parity_large.py` as a direct image diff at >=100k surfels.

    python tools/accuracy_ab.py          # writes results/accuracy_ab.json

Reference contract: `/root/reference/src/core/tracker.py:194-251` solves on
every valid pixel; `/root/reference/src/core/mapper.py:336-378` optimizes
every pixel of every window keyframe each step.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def _r(v, nd):
    """Round, mapping None/non-finite to None so the JSON stays strict."""
    import math

    if v is None:
        return None
    v = float(v)
    return round(v, nd) if math.isfinite(v) else None


def one_run(name, tracking, mapping, width, height, n_frames, system=None):
    import shutil

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run

    save_dir = f"results/ab_{name}"
    # ADVICE r2: rotate the save_dir so a failed run can't silently report a
    # stale render_metrics.json from a previous invocation
    shutil.rmtree(save_dir, ignore_errors=True)
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": n_frames,
            # fully unique frames: cycling poses (bench-style unique_frames)
            # insert a large pose jump at every wrap — fine for a throughput
            # bench, disqualifying for a quality/accuracy measurement
            "unique_frames": n_frames,
            "device_frames": True,
            "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 600_000},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        Tracking=tracking,
        Mapping=mapping,
        # ADVICE r2: run() must not pre-run the ATE sweep / render eval we
        # compute below from return values (duplicate work + stale files)
        System={
            "save_dir": save_dir,
            "eval_render": False,
            "eval_tracking": False,
            "capacity_bucketing": False,
            **(system or {}),
        },
    )
    t0 = time.perf_counter()
    ef = run(cfg)
    wall = time.perf_counter() - t0
    ate = ef.evaluate_trajectory(plot=False)
    render = ef.evaluate_render()
    # steady-state per-frame host ms (frames past compile/warm transients) —
    # ADVICE r2: wall_s includes jit compile of late-firing programs, so it
    # cannot be compared across configs with different cache temperature
    per_frame = [
        m["track_ms"] + m["map_ms"] + m["post_ms"]
        for m in ef.metrics
        if m.get("frame", -1) >= 12 and "track_ms" in m
    ]
    import numpy as np

    steady_ms = float(np.median(per_frame)) if per_frame else float("nan")
    return {
        "name": name,
        "tracking": tracking,
        "mapping": mapping,
        "ate_cm": _r(ate, 4),
        "psnr": _r(render.get("psnr", float("nan")), 3),
        "ssim": _r(render.get("ssim", float("nan")), 4),
        "ms_ssim": _r(render.get("ms_ssim", float("nan")), 4),
        "depth_l1": _r(render.get("depth_l1", float("nan")), 5),
        "wall_s": round(wall, 1),
        "steady_frame_ms": _r(steady_ms, 1),
        "surfels": int(ef.mapper.surfels.num_active()),
        # settled-skip observability: how many frames actually skipped
        "render_skips": int(getattr(ef.mapper, "render_skips", 0)),
    }


def main():
    width = int(os.environ.get("AB_WIDTH", 1280))
    height = int(os.environ.get("AB_HEIGHT", 704))
    n_frames = int(os.environ.get("AB_FRAMES", 48))

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    # The shipped production values (configs/base.yaml) — DEFAULTS went back
    # to reference parity in round 5 (ADVICE r4), so the arms state them
    # explicitly.
    PROD_T = {"solver_stride": 2, "pyramid_iters": [3, 3, 2]}
    PROD_M = {"opt_tile_fraction": 0.5, "opt_step_scale": 0.5}
    arms = {
        # shipped TPU-fast defaults first: it is the headline quality number
        "fast": (PROD_T, PROD_M),
        "exact": ({"solver_stride": 1, "pyramid_iters": [3, 3, 3]},
                  {"opt_tile_fraction": 1.0, "opt_step_scale": 1.0}),
        # VERDICT r2 #4: price the amortized schedule against the
        # reference-exact burst schedule at equal total steps
        "burst": ({"solver_stride": 2}, {"opt_tile_fraction": 0.5, "opt_schedule": "burst"}),
        # smaller entry capacity for the OPTIMIZATION render only (the
        # coverage-critical model/spawn renders stay at raster_cap): prices
        # the gradient fidelity of the stratified-tail slab at 1024
        "optcap1024": ({"solver_stride": 2},
                       {"opt_tile_fraction": 0.5},
                       {"opt_raster_cap": 1024}),
        # equal optimized-pixel throughput in FEWER, bigger steps: 1
        # step/frame at tile fraction 0.75 vs 1.5 steps at 0.5 — each step
        # pays fixed costs (projection, slab expand, back-map gather), so
        # fewer steps cut ~9 ms/frame if quality holds
        "steps1x075": ({"solver_stride": 2},
                       {"opt_tile_fraction": 0.75, "local_map_iter": 2}),
        # round 4: drop one finest-level GN iteration (the full-res level
        # dominates dense_track's 18.6 ms/frame device cost)
        "iters332": ({"solver_stride": 2, "pyramid_iters": [3, 3, 2]},
                     {"opt_tile_fraction": 0.5}),
        # round 4: optimization render at cap 768 (capsub 192 vs the 134k
        # map's max sub-column run ~322 -> stratified tail compresses to
        # ~190) — prices gradient fidelity one rung below optcap1024
        "optcap768": ({"solver_stride": 2},
                      {"opt_tile_fraction": 0.5},
                      {"opt_raster_cap": 768}),
        # round 5: 0.75 amortized opt steps/frame (scale 0.5, now the
        # shipped default) and the previous 1.0-step default, for the record
        "steps05": (PROD_T, {**PROD_M, "opt_step_scale": 0.5}),
        "steps0667": (PROD_T, {**PROD_M, "opt_step_scale": 0.667}),
        # round 5 tracking-cost arms: drop the 2nd finest-level GN iteration
        # / thin the finest constraint grid to stride 3 (level 0 holds ~80%
        # of the gather cost)
        "iters331": ({**PROD_T, "pyramid_iters": [3, 3, 1]}, PROD_M),
        # round 5: thinner stochastic tile subset per opt step (the bwd
        # compositor kernel scales with the kept fraction)
        "tile0375": (PROD_T, {**PROD_M, "opt_tile_fraction": 0.375}),
        # NOTE: solver_stride_fine=3 reproducibly CRASHES the tunnel TPU
        # worker (kernel fault, twice) — the knob exists but stride-3
        # full-res shapes are not TPU-safe on this stack; not adopted
        "stride3fine": ({**PROD_T, "solver_stride_fine": 3}, PROD_M),
        # round 5c: finest level at stride 4 (power-of-two shapes, unlike
        # the crashing stride 3): level-0 gathers drop to 1/4 of the
        # shipped stride-2 grid — the single biggest dense_track cost
        "stride4fine": ({**PROD_T, "solver_stride_fine": 4}, PROD_M),
        # round 5c: separable bilateral depth filter (26 taps vs the
        # reference-exact 169) — the full-res depth filter is ~2.9 ms/frame
        "bilatsep": (PROD_T, PROD_M, {"bilateral_mode": "separable"}),
        # round 5c: the combined candidate production config
        "r5c": ({**PROD_T, "solver_stride_fine": 4}, PROD_M,
                {"bilateral_mode": "separable"}),
        # round 5b: model view at HALF resolution (Tracking.model_view_down
        # 2). Tracking pairs the half-res model with the frame pyramid one
        # octave down at stride 1, so the finest-level constraint count
        # equals the shipped full-res stride-2 grid; the coverage render,
        # postprocess and spawn mask run at 1/4 the pixels. The opt path
        # (keyframe renders) stays full-res.
        "halfview": ({**PROD_T, "model_view_down": 2, "solver_stride": 1},
                     PROD_M),
        # same, with the model-render slab doubled: at half resolution a
        # sub-column spans 2x the scene width, so per-sub-column occupancy
        # roughly doubles — cap 4096 keeps the per-sub capacity at the
        # full-res cap-2048 equivalent (slab cost still halves: T/4 x 2).
        "halfview4096": ({**PROD_T, "model_view_down": 2, "solver_stride": 1},
                         PROD_M,
                         {"raster_cap": 4096}),
        # round 5b: settled-frame render skip — fuse-only frames (no model
        # render, no spawn, tracker keeps the previous view) when lag-N
        # surfel counts are flat and tracking is healthy, at most every
        # other frame
        "settledskip": (PROD_T, {**PROD_M, "settled_skip": True}),
    }
    which = [a for a in (os.environ.get("AB_ARMS", "fast,exact,burst").split(",")) if a]

    os.makedirs("results", exist_ok=True)
    try:  # merge with prior arms so partial runs don't clobber the record
        with open("results/accuracy_ab.json") as f:
            rows = json.load(f)
    except Exception:
        rows = []
    suffix = os.environ.get("AB_SUFFIX", "")  # e.g. "96" for longer runs
    for name in which:
        tracking, mapping, *sysrest = arms[name]
        row = one_run(name + suffix, tracking, mapping, width, height, n_frames,
                      system=sysrest[0] if sysrest else None)
        rows = [r for r in rows if r.get("name") != name] + [row]
        print(json.dumps(row), flush=True)
        with open("results/accuracy_ab.json", "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
