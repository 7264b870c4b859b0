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


def one_run(name, tracking, mapping, width, height, n_frames):
    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run

    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": n_frames,
            "unique_frames": 16,
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
        System={
            "save_dir": f"results/ab_{name}",
            "eval_render": True,
            "capacity_bucketing": False,
        },
    )
    t0 = time.perf_counter()
    ef = run(cfg)
    wall = time.perf_counter() - t0
    ate = ef.evaluate_trajectory(plot=False)
    render = {}
    rm = os.path.join(f"results/ab_{name}", "render_metrics.json")
    if os.path.exists(rm):
        with open(rm) as f:
            render = json.load(f)["mean"]
    return {
        "name": name,
        "tracking": tracking,
        "mapping": mapping,
        "ate_cm": round(float(ate), 4),
        "psnr": round(render.get("psnr", float("nan")), 3),
        "ssim": round(render.get("ssim", float("nan")), 4),
        "ms_ssim": round(render.get("ms_ssim", float("nan")), 4),
        "depth_l1": round(render.get("depth_l1", float("nan")), 5),
        "wall_s": round(wall, 1),
        "surfels": int(ef.mapper.surfels.num_active()),
    }


def main():
    width = int(os.environ.get("AB_WIDTH", 1280))
    height = int(os.environ.get("AB_HEIGHT", 704))
    n_frames = int(os.environ.get("AB_FRAMES", 48))

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    rows = []
    rows.append(
        one_run(
            "exact",
            {"solver_stride": 1},
            {"opt_tile_fraction": 1.0},
            width, height, n_frames,
        )
    )
    rows.append(
        one_run(
            "fast",
            {"solver_stride": 2},
            {"opt_tile_fraction": 0.5},
            width, height, n_frames,
        )
    )
    os.makedirs("results", exist_ok=True)
    with open("results/accuracy_ab.json", "w") as f:
        json.dump(rows, f, indent=2)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
