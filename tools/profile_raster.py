"""Micro-profile of the Pallas rasterizer: forward, forward+backward, and
piece-wise (binning, expand, composite, back_map gather) timings at several
per-tile capacities, on a bench-like surfel cloud.

    python tools/profile_raster.py [n_surfels]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def t(fn, n=5):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggfusion_tpu.ops import raster_pallas as rp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 370_000
    CAPACITY = 600_000
    W, H = 1280, 704

    rng = np.random.default_rng(0)
    depth = rng.uniform(1.2, 3.0, N).astype(np.float32)
    # uniform pixel coverage: sample pixels, unproject
    px = rng.uniform(0, W, N).astype(np.float32)
    py = rng.uniform(0, H, N).astype(np.float32)
    fx = fy = 600.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    xyz = np.stack([(px - cx) / fx * depth, (py - cy) / fy * depth, depth], -1)
    nrm = np.tile(np.array([0, 0, -1.0], np.float32), (N, 1))
    pad = CAPACITY - N
    params = {
        "xyz": jnp.asarray(np.concatenate([xyz, np.zeros((pad, 3))]).T, jnp.float32),
        "opacity": jnp.full((1, CAPACITY), 0.95),
        "scales": jnp.full((3, CAPACITY), 0.006).at[2, :].set(1e-13),
        "rotations": jnp.tile(jnp.asarray([[1.0], [0], [0], [0]]), (1, CAPACITY)),
        "normal": jnp.asarray(np.concatenate([nrm, np.tile([[0, 0, 1.0]], (pad, 1))]).T, jnp.float32),
        "shs": jnp.asarray(rng.uniform(size=(3, 1, CAPACITY)), jnp.float32),
        "radius": jnp.full((CAPACITY,), 4.0),
        "active": jnp.arange(CAPACITY) < N,
    }
    w2c = jnp.eye(4)
    intr = jnp.asarray([fx, fy, cx, cy], jnp.float32)

    for cap in (512, 256, 128):
        binning = rp.compute_binning(params, w2c, intr, W, H, cap=cap)
        cnt = np.asarray(binning.counts)[:, 0]
        print(f"cap {cap}: tile counts min/med/max = {cnt.min()}/{int(np.median(cnt))}/{cnt.max()}")

        fwd = lambda: rp.render_pallas(params, w2c, intr, W, H, sh_degree=0, cap=cap, binning=binning)["color"]
        print(f"  fwd (cached bin):   {t(fwd):7.1f} ms")

        def loss_fn(xyz):
            out = rp.render_pallas({**params, "xyz": xyz}, w2c, intr, W, H, sh_degree=0, cap=cap, binning=binning)
            return out["color"].sum() + out["depth"].sum() + out["normal"].sum() + out["opacity"].sum()

        g = jax.jit(jax.grad(loss_fn))
        print(f"  fwd+bwd (cached):   {t(lambda: g(params['xyz'])):7.1f} ms")

        nobin = lambda: rp.render_pallas(params, w2c, intr, W, H, sh_degree=0, cap=cap)["color"]
        print(f"  fwd (fresh bin):    {t(nobin):7.1f} ms")

    # piecewise: back_map gather alone at cap 512
    binning = rp.compute_binning(params, w2c, intr, W, H, cap=512)
    n_tiles = binning.entry_sid.shape[0]
    flat = jnp.asarray(rng.normal(size=(n_tiles * 512, 16)), jnp.float32)

    @jax.jit
    def backmap_gather(flat, back_map):
        idx = jnp.clip(back_map, 0, flat.shape[0] - 1)
        picked = flat[idx]
        return jnp.sum(jnp.where((back_map >= 0)[..., None], picked, 0.0), axis=1)

    print(f"back_map gather (N*K={CAPACITY*4/1e6:.1f}M idx): {t(lambda: backmap_gather(flat, binning.back_map)):7.1f} ms")

    @jax.jit
    def expand_fwd(attrs, sid):
        return attrs[sid]

    attrs = jnp.asarray(rng.normal(size=(CAPACITY, 16)), jnp.float32)
    print(f"expand fwd gather (T*CAP={n_tiles*512/1e6:.2f}M idx): {t(lambda: expand_fwd(attrs, binning.entry_sid)):7.1f} ms")


if __name__ == "__main__":
    main()
