"""Bisect WHICH program structure owns the frame-0 compile blowup
(VERDICT r2 #3: ~1750 s frame-0 compile in BENCH_r02).

Times `.lower()` (local tracing+StableHLO) separately from `.compile()`
(remote backend compile through the axon tunnel) for a ladder of programs:
tiny sanity matmul, binning-only, Pallas composite-only (pre-binned
entries), geom render at small and full shapes, XLA-oracle render. Prints
each stage as it finishes (run with `python -u`).

    python -u tools/compile_bisect.py [stage ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

WIDTH, HEIGHT = 1280, 704
CAP = 512
N = 600_000


def timed(label, make_lowered):
    t0 = time.perf_counter()
    lowered = make_lowered()
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"[compile] {label}: lower {t_lower:.1f}s, compile {t_comp:.1f}s", flush=True)


def main():
    stages = sys.argv[1:] or ["sanity", "bin", "composite", "geom_small", "geom_full"]
    import jax
    import jax.numpy as jnp

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import raster_pallas as rp

    scfg = sf.SurfelConfig(capacity=N, max_sh_degree=0, active_sh_degree=0)
    s = sf.SurfelMap.empty(scfg)
    params = sf.render_params(s)
    w2c = jnp.eye(4)
    intr = jnp.asarray([600.0, 600.0, WIDTH / 2 - 0.5, HEIGHT / 2 - 0.5], jnp.float32)

    if "sanity" in stages:
        timed("sanity 1k matmul", lambda: jax.jit(lambda a: a @ a).lower(jnp.zeros((1024, 1024))))

    if "bin" in stages:
        def mk():
            def f(p):
                b = rp.compute_binning(p, w2c, intr, WIDTH, HEIGHT, cap=CAP)
                return b.counts.sum() + b.entry_sid.sum() + b.back_map.sum()
            return jax.jit(f).lower(params)
        timed(f"binning only ({N} surfels, {WIDTH}x{HEIGHT})", mk)

    if "composite" in stages:
        # Pallas geom kernel alone, pre-made entries (no projection/binning)
        n_tiles = rp.n_tiles_static(WIDTH, HEIGHT)
        hp = -(-HEIGHT // rp.TILE_H) * rp.TILE_H
        wp = -(-WIDTH // rp.TILE_W) * rp.TILE_W
        entries = jnp.zeros((n_tiles, CAP, rp.N_ATTR), jnp.float32)
        counts = jnp.zeros((n_tiles, rp.N_SUB), jnp.int32)
        intr2 = jnp.zeros((1, 4), jnp.float32)

        def mk():
            comp = rp._make_geom_composite(hp, wp, CAP, n_tiles, False)
            def f(e, c, i):
                dep, opa, T = comp(c, i, e)
                return dep.sum() + opa.sum() + T.sum()
            return jax.jit(f).lower(entries, counts, intr2)
        timed(f"pallas geom composite only ({n_tiles} tiles, cap {CAP})", mk)

    if "composite_full" in stages:
        n_tiles = rp.n_tiles_static(WIDTH, HEIGHT)
        hp = -(-HEIGHT // rp.TILE_H) * rp.TILE_H
        wp = -(-WIDTH // rp.TILE_W) * rp.TILE_W
        entries = jnp.zeros((n_tiles, CAP, rp.N_ATTR), jnp.float32)
        counts = jnp.zeros((n_tiles, rp.N_SUB), jnp.int32)
        intr2 = jnp.zeros((4,), jnp.float32)

        def mk():
            comp = rp._make_composite(hp, wp, CAP, n_tiles, False)
            def f(e, c, i):
                rgb, nrm, dep, opa, T = comp(e, c, i)
                return rgb.sum() + nrm.sum() + dep.sum() + opa.sum() + T.sum()
            return jax.jit(f).lower(entries, counts, intr2)
        timed(f"pallas FULL fwd composite only ({n_tiles} tiles, cap {CAP})", mk)

    if "composite_bwd" in stages:
        n_tiles = rp.n_tiles_static(WIDTH, HEIGHT)
        hp = -(-HEIGHT // rp.TILE_H) * rp.TILE_H
        wp = -(-WIDTH // rp.TILE_W) * rp.TILE_W
        entries = jnp.zeros((n_tiles, CAP, rp.N_ATTR), jnp.float32)
        counts = jnp.zeros((n_tiles, rp.N_SUB), jnp.int32)
        intr2 = jnp.zeros((4,), jnp.float32)

        def mk():
            comp = rp._make_composite(hp, wp, CAP, n_tiles, False)
            def f(e, c, i):
                rgb, nrm, dep, opa, T = comp(e, c, i)
                return rgb.sum() + nrm.sum() + dep.sum() + opa.sum() + T.sum()
            return jax.jit(jax.grad(f)).lower(entries, counts, intr2)
        timed(f"pallas fwd+BWD composite only ({n_tiles} tiles, cap {CAP})", mk)

    if "geom_small" in stages:
        small = sf.SurfelMap.empty(scfg._replace(capacity=16_384))
        p_small = sf.render_params(small)
        i_small = jnp.asarray([60.0, 60.0, 127.5, 63.5], jnp.float32)

        def mk():
            def f(p):
                return rp.render_pallas(p, w2c, i_small, 256, 128, sh_degree=0,
                                        cap=256, geom_only=True, need_grad=False)["depth"].sum()
            return jax.jit(f).lower(p_small)
        timed("geom render SMALL (16k surfels, 256x128, cap 256)", mk)

    if "geom_full" in stages:
        def mk():
            def f(p):
                return rp.render_pallas(p, w2c, intr, WIDTH, HEIGHT, sh_degree=0,
                                        cap=CAP, geom_only=True, need_grad=False)["depth"].sum()
            return jax.jit(f).lower(params)
        timed(f"geom render FULL ({N} surfels, {WIDTH}x{HEIGHT}, cap {CAP})", mk)


if __name__ == "__main__":
    main()
