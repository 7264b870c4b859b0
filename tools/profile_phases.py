"""Per-phase timing of the frame pipeline on the attached device.

Times each jitted program (blocked) on real bench-shaped inputs to find the
hot phase. Usage: python tools/profile_phases.py [--frames N]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:34s} {dt:9.2f} ms", flush=True)
    return out, dt


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 704))
    max_surfels = int(os.environ.get("BENCH_SURFELS", 600_000))

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion

    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": 20, "unique_frames": 6,
            "device_frames": True, "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": max_surfels},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": "results/profile", "final_global_opt": False},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    print("warmup done", flush=True)

    # run frames 0..12 to populate the map and trigger all compiles
    for fid in range(13):
        ef.reconstruct(build_frame(dataset, fid, False))
    jax.block_until_ready(ef.mapper.surfels.xyz)
    print(f"populated, surfels={int(ef.mapper.surfels.num_active())}", flush=True)

    frame = build_frame(dataset, 13, False)
    jax.block_until_ready(frame.color)

    from eggfusion_tpu.core.tracker import dense_track_pose
    from eggfusion_tpu.core import surfels as sf

    m = ef.mapper
    s = m.surfels
    w2c = frame.w2c_matrix()
    intr = frame.intr

    # --- phases ---
    pyr_model = ef.model_map["pyramid"]
    timeit("track (dense_track_pose)", dense_track_pose, pyr_model, frame.pyramid,
           jnp.eye(4), ef.model_map["transform"], ef.tracker.config)

    from eggfusion_tpu.system import preprocess_frame_map
    p0 = frame.pyramid[0]
    fm, _ = timeit("preprocess_frame_map", preprocess_frame_map, frame.color, frame.depth,
                   p0.vertex, p0.normal, frame.mask, intr, frame.c2w_matrix(),
                   ef.reco_normal_thres)

    # map_update without donation hazards: pass a copy
    def mu():
        s2 = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, s)
        return m._map_update(s2, fm, w2c, intr, jnp.int32(13), m._rng,
                             frame.width, frame.height, False)
    timeit("map_update (render+fuse+spawn)", mu)

    timeit("render_model", m._render_model, s, w2c, intr, frame.width, frame.height)

    cache, _ = timeit("bin_cache", m._bin_cache, s, w2c, intr, frame.width, frame.height)

    from eggfusion_tpu.core.mapper import _geo_snapshot, _adam_init, OPT_FIELDS
    geo = _geo_snapshot(s)
    kfm = {
        "color": fm["color_map"], "depth": fm["depth_map"], "normal": fm["normal_map_c"],
        "rgb_mask": fm["rgb_mask"], "geo_mask": fm["geo_mask"],
    }
    lrs_dev = {k: jnp.float32(v) for k, v in m.sw_lrs.items()}

    def one_opt(cache_):
        s2 = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, s)
        params = {k: getattr(s2, k) for k in OPT_FIELDS}
        moments = _adam_init(params)
        return m._opt_step(s2, moments, jnp.int32(0), kfm, w2c, intr, geo, lrs_dev,
                           frame.width, frame.height, cache_)
    timeit("opt_step (cached binning)", one_opt, cache, n=3)
    timeit("opt_step (no cache)", one_opt, None, n=3)

    def rpp():
        return ef._render_postprocess(s, fm, w2c, intr, frame.width, frame.height)
    timeit("render_postprocess", rpp)

    # dispatch-latency floor: a trivial program round-trip
    f_triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    timeit("trivial dispatch round-trip", f_triv, x, n=20)

    # frame build cost
    t0 = time.perf_counter()
    for fid in range(14, 19):
        fr = build_frame(dataset, fid, False)
        jax.block_until_ready(fr.color)
    print(f"{'build_frame':34s} {(time.perf_counter()-t0)/5*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
