"""Is the slab expand gather (attrs[entry_sid], the ~8 ms/render item)
locality-sensitive on v5e? If gathering depth/spatially-CLUSTERED indices is
much faster than the live map's spawn-order indices, then re-ordering the
surfel SoA spatially at maintenance time (compact already permutes slots)
turns every per-tile gather into near-contiguous rows.

    python tools/probe_gather_locality.py [checkpoint]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def timeit(label, fn, n=20):
    import jax

    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:52s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)
    return out


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.io import checkpoint as ckpt
    from eggfusion_tpu.ops import raster_common as rc
    from eggfusion_tpu.ops import raster_pallas as rp

    path = sys.argv[1] if len(sys.argv) > 1 else "results/ab_fast/checkpoint.npz"
    s, _ = ckpt.load_checkpoint(path)
    s = sf.compact_surfels(s)
    n = int(np.asarray(s.count))
    cap_new = 155648  # the bench's steady rung
    s = jax.tree_util.tree_map(
        lambda x: x[..., :cap_new] if getattr(x, "ndim", 0) else x, s
    )
    print(f"map: {n} surfels at capacity {s.capacity}")

    width, height = 1280, 704
    intr = jnp.asarray([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    w2c = jnp.eye(4)
    params = sf.render_params(s)
    tx = rp._cdiv(width, rp.TILE_W)
    ty = rp._cdiv(height, rp.TILE_H)
    n_tiles = tx * ty

    proj = jax.jit(lambda p: rc.project_surfels(p, w2c, intr, width, height, 0))(params)
    for cap in (2048, 1024):
        entry_sid, counts, _, _ = jax.jit(lambda pr: rp._bin_entries(
            pr.depth, pr.mean2d, pr.radius, pr.valid, n_tiles, tx, ty, cap,
            need_back=False))(proj)
        attrs = jnp.concatenate([
            proj.mean2d, proj.conic, proj.opacity[None], proj.color,
            proj.normal_cam, proj.p_cam,
            jnp.ones((1, proj.mean2d.shape[-1]), jnp.float32),
        ], axis=0).T

        gather = jax.jit(lambda a, sid: a[sid])
        print(f"--- cap {cap}: slab {n_tiles * cap / 1e6:.2f}M rows")
        timeit("gather, live map (spawn-order indices)", lambda: gather(attrs, entry_sid))

        # spatially re-ordered map: new slot = rank of the surfel under a
        # depth-major key (proxy for a Morton/spatial sort). Remap entry_sid
        # through the permutation; the gathered VALUES differ but the index
        # STREAM has the same per-tile structure with clustered targets.
        order = jnp.argsort(jnp.where(s.active, proj.depth, jnp.inf))
        rank = jnp.argsort(order).astype(jnp.int32)
        sid2 = jax.jit(lambda sid, r: r[sid])(entry_sid, rank)
        timeit("gather, depth-sorted map (clustered indices)", lambda: gather(attrs, sid2))

        # upper bound: fully sequential indices
        seq = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32)[None, :], entry_sid.shape)
        timeit("gather, sequential indices (upper bound)", lambda: gather(attrs, seq))

        # Morton-order proxy: sort by quantized (u, v) tile id then depth —
        # surfels in the same screen tile become contiguous
        u16 = jnp.clip(proj.mean2d[0] / rp.SUB_W, 0, 1023).astype(jnp.int32)
        v16 = jnp.clip(proj.mean2d[1] / rp.TILE_H, 0, 1023).astype(jnp.int32)
        key = jnp.where(s.active, (v16 * 1024 + u16).astype(jnp.float32), jnp.inf)
        order2 = jnp.argsort(key)
        rank2 = jnp.argsort(order2).astype(jnp.int32)
        sid3 = jax.jit(lambda sid, r: r[sid])(entry_sid, rank2)
        timeit("gather, screen-tile-sorted map", lambda: gather(attrs, sid3))


if __name__ == "__main__":
    main()
