"""Per-op DEVICE-time breakdown of the three hot programs (opt_step,
map_update, dense_track) via trace parsing (tools/devtime.py).

    python tools/profile_ops.py [opt|map|track|bin] ...
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

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion
    from eggfusion_tpu.core.mapper import KeyFrame, _geo_snapshot, _adam_init, OPT_FIELDS
    from tools.devtime import device_time_ms

    which = set(sys.argv[1:]) or {"opt", "map", "track"}
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 704))
    n_frames = 14
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_frames, "unique_frames": 10,
            "device_frames": True, "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": int(os.environ.get("BENCH_SURFELS", 600_000))},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": "results/profile", "final_global_opt": False,
                "capacity_bucketing": False},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    frame = None
    for fid in range(n_frames):
        frame = build_frame(dataset, fid, False)
        ef.reconstruct(frame)
    mp = ef.mapper
    s = mp.surfels
    fm = ef.frame_map
    w2c = frame.w2c_matrix()
    intr = frame.intr
    W, H = frame.width, frame.height
    print(f"surfels active: {int(s.num_active())} / cap {s.capacity}", flush=True)

    def report(label, fn, n=5, top=24):
        total, rows = device_time_ms(fn, n=n, by_op=True, top=top)
        print(f"\n=== {label}: {total:.1f} ms device ===")
        for ms, cnt, name in rows:
            if ms < 0.05:
                continue
            print(f"  {ms:7.2f} ms  x{cnt//n:<4d} {name[:110]}")

    if "track" in which:
        from eggfusion_tpu.core.tracker import dense_track_pose

        pyr_model = ef.model_map["pyramid"]
        eye = jnp.eye(4)
        report("dense_track", lambda: dense_track_pose(
            pyr_model, frame.pyramid, eye, eye, ef.tracker.config))

    if "map" in which:
        def f():
            s2, _, _ = mp._map_update(
                jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype") else x, s),
                fm, w2c, intr, jnp.int32(mp.time), mp._rng, W, H, False, True)
            return s2.count
        report("map_update(+copy, full_post)", f)

    if "bin" in which:
        report("bin_cache", lambda: mp._bin_cache(s, w2c, intr, W, H).counts)

    if "opt" in which:
        kf = KeyFrame(frame, fm, mp.time, -1, "device")
        kfm = kf.device_maps()
        geo = _geo_snapshot(s)
        lrs = {k: jnp.float32(v) for k, v in mp.sw_lrs.items()}
        cache = mp._bin_cache(s, w2c, intr, W, H)

        def opt():
            s2 = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype") else x, s)
            params = {k: getattr(s2, k) for k in OPT_FIELDS}
            mom = _adam_init(params)
            s3, mom, st, loss = mp._opt_step(
                s2, mom, jnp.int32(0), kfm, w2c, intr, geo, lrs, W, H, cache)
            return loss
        report("opt_step(+copy+adam_init, cached bin)", opt)


if __name__ == "__main__":
    main()
