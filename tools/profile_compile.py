"""Measure COMPILE time of each production-shape program (VERDICT r2 #3).

Frame-0 compile was ~1750 s in BENCH_r02; this isolates which program owns
it. Compiles (lower+compile, no execute) each jitted program at bench
shapes, printing wall seconds per program.

    python tools/profile_compile.py [fwd|bwd|geom|mapupd|opt|all]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

WIDTH, HEIGHT = 1280, 704
CAP = 512
N = 600_000


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"[compile] {label}: {dt:.1f}s", flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import raster_pallas as rp

    scfg = sf.SurfelConfig(capacity=N, max_sh_degree=0, active_sh_degree=0)
    s = sf.SurfelMap.empty(scfg)
    params = sf.render_params(s)
    w2c = jnp.eye(4)
    intr = jnp.asarray([600.0, 600.0, WIDTH / 2 - 0.5, HEIGHT / 2 - 0.5], jnp.float32)

    def lower_compile(fn, *args, **kw):
        return jax.jit(fn, static_argnames=tuple(k for k in kw if isinstance(kw[k], (int, bool, str)))).lower(*args, **kw).compile()

    if which in ("fwd", "all"):
        def fwd_only():
            def f(p):
                return rp.render_pallas(p, w2c, intr, WIDTH, HEIGHT, sh_degree=0,
                                        cap=CAP, need_grad=False)["depth"].sum()
            return jax.jit(f).lower(params).compile()
        t("render fwd (full, no grad)", fwd_only)

    if which in ("geom", "all"):
        def geom():
            def f(p):
                return rp.render_pallas(p, w2c, intr, WIDTH, HEIGHT, sh_degree=0,
                                        cap=CAP, geom_only=True, need_grad=False)["depth"].sum()
            return jax.jit(f).lower(params).compile()
        t("render geom-only fwd", geom)

    if which in ("bwd", "all"):
        OPT = ("xyz", "scales", "rotations", "opacity", "shs", "normal")

        def bwd():
            def f(p_opt):
                p = dict(params)
                p.update(p_opt)
                out = rp.render_pallas(p, w2c, intr, WIDTH, HEIGHT, sh_degree=0, cap=CAP)
                return (out["color"].sum() + out["depth"].sum() + out["normal"].sum()
                        + out["opacity"].sum())
            p_opt = {k: params[k] for k in OPT if k in params}
            return jax.jit(jax.grad(f)).lower(p_opt).compile()
        t("render fwd+bwd (grad)", bwd)

    if which in ("prod", "all"):
        # the REAL production programs at bench shapes (mirrors bench.py cfg)
        from eggfusion_tpu import config as cfglib
        from eggfusion_tpu.core import mapper as mp
        from eggfusion_tpu.system import EGGFusion

        cfg = cfglib.default_config(
            Dataset={
                "type": "synthetic", "n_frames": 4, "device_frames": True,
                "preload": False,
                "Calibration": {
                    "fx": 600.0, "fy": 600.0, "cx": WIDTH / 2 - 0.5,
                    "cy": HEIGHT / 2 - 0.5, "width": WIDTH, "height": HEIGHT,
                    "depth_scale": 1.0,
                },
            },
            Viewer={"max_surfels_num": N},
            Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
            System={"save_dir": "results/profile_compile",
                    "capacity_bucketing": False},
        )
        ef = EGGFusion(cfg)
        m = ef.mapper
        s = m.surfels
        H, W = HEIGHT, WIDTH
        fm = {
            "color_map": jnp.zeros((H, W, 3)),
            "depth_map": jnp.ones((H, W, 1)),
            "vertex_map_c": jnp.zeros((H, W, 3)),
            "normal_map_c": jnp.zeros((H, W, 3)),
            "confidence_map": jnp.ones((H, W)),
            "rgb_mask": jnp.ones((H, W, 1), bool),
            "geo_mask": jnp.ones((H, W, 1), bool),
            "vertex_map_w": jnp.zeros((H, W, 3)),
            "normal_map_w": jnp.zeros((H, W, 3)),
        }
        kfm = {"color": fm["color_map"], "depth": fm["depth_map"],
               "normal": fm["normal_map_c"], "rgb_mask": fm["rgb_mask"],
               "geo_mask": fm["geo_mask"]}
        root_key = jax.random.PRNGKey(0)

        t("bin_cache", lambda: m._bin_cache.lower(s, w2c, intr, W, H).compile())
        cache = m._bin_cache(s, w2c, intr, W, H)
        t("map_update(first=False, full_post=True)",
          lambda: m._map_update.lower(s, fm, w2c, intr, jnp.int32(1), root_key,
                                      W, H, False, True).compile())
        t("render_postprocess",
          lambda: ef._render_postprocess.lower(s, fm, w2c, intr, W, H).compile())
        params = {k: getattr(s, k) for k in mp.OPT_FIELDS}
        moments = mp._adam_init(params)
        geo = mp._geo_snapshot(s)
        lrs = {k: jnp.float32(v) for k, v in m.sw_lrs.items()}
        t("opt_step (cache)",
          lambda: m._opt_step.lower(s, moments, jnp.int32(0), kfm, w2c, intr,
                                    geo, lrs, W, H, cache).compile())
        t("opt_step (no cache)",
          lambda: m._opt_step.lower(s, moments, jnp.int32(0), kfm, w2c, intr,
                                    geo, lrs, W, H, None).compile())


if __name__ == "__main__":
    main()
