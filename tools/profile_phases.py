"""Per-phase wall-clock profile of the bench workload.

Runs the bench configuration for a few frames, then times each jitted
program in isolation (steady state, block_until_ready) to show where the
per-frame budget goes. Usage:

    python tools/profile_phases.py [n_frames]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def t(fn, n=5):
    import os

    import jax

    if os.environ.get("PROF_DEVTIME"):
        from tools.devtime import device_time_ms

        return device_time_ms(fn, n=n)
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import os

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion
    from eggfusion_tpu.core.mapper import KeyFrame, _geo_snapshot, _adam_init, OPT_FIELDS

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 704))
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
        jax.block_until_ready(ef.mapper.surfels.count)
    for m in ef.metrics[-6:]:
        print({k: round(v, 1) if isinstance(v, float) else v for k, v in m.items()
               if k != "surfels"})

    only = set(os.environ.get("PROF_ONLY", "").split(",")) - {""}

    def want(name):
        return not only or name in only

    mp = ef.mapper
    s = mp.surfels
    fm = ef.frame_map
    w2c = frame.w2c_matrix()
    intr = frame.intr
    W, H = frame.width, frame.height

    print(f"surfels active: {int(s.num_active())} / cap {s.capacity}")

    # --- phase: tracking ---------------------------------------------------
    if want("track"):
        from eggfusion_tpu.core.tracker import dense_track_pose

        pyr_model = ef.model_map["pyramid"]
        eye = jnp.eye(4)
        print(f"dense_track:        {t(lambda: dense_track_pose(pyr_model, frame.pyramid, eye, eye, ef.tracker.config)):7.1f} ms")

    # --- frame build (pyramid) --------------------------------------------
    if want("frame"):
        print(f"frame build:        {t(lambda: build_frame(dataset, 3, False).pyramid[0].intensity):7.1f} ms")

    # --- preprocess --------------------------------------------------------
    if want("pre"):
        print(f"preprocess:         {t(lambda: ef.preprocess(frame) or ef.frame_map['color_map']):7.1f} ms")

    # --- map update (fusion + spawn; no donation here so time w/ copy) ----
    if want("map"):
        def map_upd(full_post):
            def f():
                s2, _, _ = mp._map_update(
                    jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, 'dtype') else x, s),
                    fm, w2c, intr, jnp.int32(mp.time), mp._rng, W, H, False, full_post)
                return s2.count
            return f

        print(f"map_update(+copy):  {t(map_upd(False)):7.1f} ms")
        print(f"map+post (+copy):   {t(map_upd(True)):7.1f} ms")

    # --- render + postprocess ---------------------------------------------
    if want("post"):
        print(f"render+postprocess: {t(lambda: ef._render_postprocess(s, fm, w2c, intr, W, H)['rendered_color']):7.1f} ms")

    # --- opt_step ----------------------------------------------------------
    if not want("opt"):
        return
    kf = KeyFrame(frame, fm, mp.time, -1, "device")
    kfm = kf.device_maps()
    geo = _geo_snapshot(s)
    lrs = {k: jnp.float32(v) for k, v in mp.sw_lrs.items()}
    cache = mp._bin_cache(s, w2c, intr, W, H)
    print(f"bin_cache:          {t(lambda: mp._bin_cache(s, w2c, intr, W, H).counts):7.1f} ms")

    def opt(c):
        def f():
            # full copy: _opt_step donates its SoA; aliasing any field of `s`
            # would delete the buffers the next timing iteration reads
            s0 = jax.tree_util.tree_map(lambda x: x + 0, s)
            m0 = _adam_init({k: getattr(s, k) for k in OPT_FIELDS})
            s2, m2, st, loss = mp._opt_step(s0, m0, jnp.int32(0), kfm, w2c, intr, geo, lrs, W, H, c, mp._tile_rng)
            return loss
        return f

    print(f"opt_step (cached):  {t(opt(cache)):7.1f} ms")
    print(f"opt_step (no bin):  {t(opt(None)):7.1f} ms")


if __name__ == "__main__":
    main()
