"""Bisect the at-scale quality collapse (VERDICT r2 missing #2).

Runs the 1280x704 / 600k synthetic workload under controlled variations and
reports ATE + render metrics per arm, e.g.:

    python -u tools/probe_scale_quality.py gt        # only_mapping (GT poses)
    python -u tools/probe_scale_quality.py gt_burst  # + reference burst opt
    python -u tools/probe_scale_quality.py gt_150k   # + smaller capacity
    python -u tools/probe_scale_quality.py track     # full tracking (baseline)

Each arm also dumps surfel/render forensics: rendered-opacity histogram,
depth stats vs GT, surfel opacity/scale distributions, spawn counts.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

ARMS = {
    "track": {},
    "gt": {"System": {"only_mapping": True}},
    "gt_burst": {"System": {"only_mapping": True},
                 "Mapping": {"opt_schedule": "burst"}},
    "gt_150k": {"System": {"only_mapping": True},
                "Viewer": {"max_surfels_num": 150_000}},
    "gt_lowres": {"System": {"only_mapping": True}, "_res": (640, 352)},
    "track_burst": {"Mapping": {"opt_schedule": "burst"}},
    # entry-capacity ladder: the gt arm showed 78% of pixels render EMPTY at
    # 600k surfels — per-sub-column overflow (cap/4 = 128 entries per 32x32
    # px) drops most of the map. The reference's CUDA rasterizer has
    # variable-length tile lists (no cap at all).
    "gt_cap1024": {"System": {"only_mapping": True, "raster_cap": 1024}},
    "gt_cap2048": {"System": {"only_mapping": True, "raster_cap": 2048}},
    "gt_cap4096": {"System": {"only_mapping": True, "raster_cap": 4096}},
    "track_cap2048": {"System": {"raster_cap": 2048}},
    "track_cap4096": {"System": {"raster_cap": 4096}},
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "gt"
    arm = ARMS[name]
    width, height = arm.get("_res", (1280, 704))
    n_frames = int(os.environ.get("PROBE_FRAMES", 48))

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np
    import jax.numpy as jnp

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run

    save_dir = f"results/probe_scale_{name}"
    import shutil

    shutil.rmtree(save_dir, ignore_errors=True)
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": n_frames,
            "unique_frames": n_frames,
            "device_frames": True,
            "preload": False,
            "Calibration": {
                "fx": 600.0 * width / 1280, "fy": 600.0 * width / 1280,
                "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": arm.get("Viewer", {}).get("max_surfels_num", 600_000)},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        Mapping=arm.get("Mapping", {}),
        System={
            "save_dir": save_dir,
            "eval_render": False,
            "eval_tracking": False,
            "capacity_bucketing": False,
            **arm.get("System", {}),
        },
    )
    ef = run(cfg)
    ate = ef.evaluate_trajectory(plot=False)
    render = ef.evaluate_render()

    # forensics on the final state + keyframe-0 render
    s = ef.mapper.surfels
    km = ef.mapper.keyframe_manager
    kf = km.keyframes[km.ids()[0]]
    out = ef.mapper._render_model(
        s, jnp.asarray(kf.w2c), jnp.asarray(kf.intr), kf.width, kf.height
    )
    opa = np.asarray(out["opacity"]).squeeze()
    dep = np.asarray(out["depth"]).squeeze()
    ref_dep = np.asarray(kf.maps["depth"]).squeeze()
    act = np.asarray(s.active)
    import jax.nn as jnn

    surf_opa = np.asarray(jnn.sigmoid(s.opacity[0]))[act]
    surf_scale = np.asarray(jnp.exp(s.scaling[:2].max(0)))[act]
    forensics = {
        "n_active": int(act.sum()),
        "render_opacity_hist": [round(float((opa < t).mean()), 4) for t in (0.1, 0.5, 0.9)],
        "depth_abs_err_mean": round(float(np.abs(dep - ref_dep)[ref_dep > 0].mean()), 4),
        "depth_zero_frac": round(float((dep <= 0.01).mean()), 4),
        "surfel_opacity_q": [round(float(np.quantile(surf_opa, q)), 4) for q in (0.1, 0.5, 0.9)],
        "surfel_scale_q_px": [
            round(float(np.quantile(surf_scale, q)) * float(kf.intr[0]) / 2.0, 3)
            for q in (0.1, 0.5, 0.9)
        ],
        "keyframes": km.ids(),
    }
    row = {
        "arm": name, "width": width, "height": height, "n_frames": n_frames,
        "ate_cm": round(float(ate), 3),
        **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in render.items()},
        "forensics": forensics,
    }
    os.makedirs("results", exist_ok=True)
    path = "results/probe_scale_quality.json"
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows = [r for r in rows if r.get("arm") != name] + [row]
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
