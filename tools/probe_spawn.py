"""Diagnose the spawn dynamics of the bench workload.

Prints, per frame: surfel count, spawn delta, and the fractions of pixels
failing each spawn gate (rendered opacity < add_opacity_thres, depth error >
add_depth_thres). If opacity-holes dominate and grow with map size, the
rasterizer's per-tile cap is truncating coverage and feeding a spawn loop.

    RASTER_CAP=512 python tools/probe_spawn.py [n_frames]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    width, height = 1280, 704
    cap = int(os.environ.get("RASTER_CAP", 512))
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_frames, "unique_frames": 10,
            "device_frames": True, "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 600_000},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": "results/probe", "final_global_opt": False,
                "capacity_bucketing": False, "raster_cap": cap},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    mp = ef.mapper

    prev = 0
    for fid in range(n_frames):
        frame = build_frame(dataset, fid, False)
        ef.reconstruct(frame)
        n = int(mp.surfels.num_active())
        out = mp._render_model(mp.surfels, frame.w2c_matrix(), frame.intr,
                               frame.width, frame.height)
        depth = ef.frame_map["depth_map"]
        valid = np.asarray(depth[..., 0] > 0)
        opa_hole = np.asarray(out["opacity"][..., 0] < mp.mcfg.add_opacity_thres) & valid
        derr = np.asarray((out["depth"] - depth)[..., 0] > mp.mcfg.add_depth_thres) & valid
        print(f"frame {fid:2d} cap {cap}: surfels {n:7d} (+{n - prev:6d})  "
              f"opacity-hole {opa_hole.mean():.3f}  depth-err {derr.mean():.3f}")
        prev = n


if __name__ == "__main__":
    main()
