"""Probe 60-frame synthetic stability: per-frame pose error + NaN watch.

Usage: python tools/diverge_probe.py [n_frames] [width] [height]
Env: PROBE_BACKEND=xla|pallas (default: auto)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 120

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.system import EGGFusion

    overrides = {}
    if os.environ.get("PROBE_BACKEND"):
        overrides["render_backend"] = os.environ["PROBE_BACKEND"]
    map_over = {}
    if os.environ.get("PROBE_NO_OPT"):
        map_over["sw_optimize_freq"] = 100000
    track_over = {}
    if os.environ.get("PROBE_NO_MOTION"):
        track_over["use_motion_model"] = False
    cfg = cfglib.default_config(
        Mapping=map_over,
        Tracking=track_over,
        Dataset={
            "type": "synthetic", "n_frames": n, "preload": False,
            "Calibration": {
                "fx": 0.9 * w, "fy": 0.9 * w, "cx": w / 2 - 0.5, "cy": h / 2 - 0.5,
                "width": w, "height": h, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 60000},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": "results/probe", "final_global_opt": False, **overrides},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    for fid in range(n):
        frame = build_frame(dataset, fid, False)
        ef.reconstruct(frame)
        est = np.asarray(frame.c2w_matrix())
        ref = np.asarray(frame.c2w_matrix(gt=True))
        err = float(np.linalg.norm(est[:3, 3] - ref[:3, 3]))
        conv = getattr(frame, "tracking_converged", None)
        conv = bool(np.asarray(conv)) if conv is not None else None
        nan_xyz = bool(np.isnan(np.asarray(ef.mapper.surfels.xyz)).any())
        ns = int(ef.mapper.surfels.num_active())
        print(f"f{fid:03d} err {err:.4f} conv {conv} surfels {ns} nan {nan_xyz}", flush=True)
        if err > 1.0:
            print("DIVERGED — stopping")
            break


if __name__ == "__main__":
    main()
