"""Decompose the render cost at PRODUCTION state: the real 1280x704 map
(results/probe_scale_gt_cap2048/checkpoint.npz, ~135k live surfels) at the
shipped cap (2048), split into projection / binning / slab expand /
composite fwd (geom and full) / fwd+bwd — the data the opt_step budget
(41 ms at 262k capacity, the per-frame wall) is made of.

    python tools/profile_render2048.py [checkpoint]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def timeit(label, fn, n=8):
    import jax

    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label:46s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
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

    path = sys.argv[1] if len(sys.argv) > 1 else "results/probe_scale_gt_cap2048/checkpoint.npz"
    s, extra = ckpt.load_checkpoint(path)
    s = sf.compact_surfels(s)
    # right-size to the production bucket (262144) like the live system does
    n = int(np.asarray(s.count))
    cap_new = 1 << max(15, int(n + 40_000 - 1).bit_length())
    s = jax.tree_util.tree_map(
        lambda x: x[..., :cap_new] if getattr(x, "ndim", 0) else x, s
    )
    print(f"map: {n} surfels at capacity {s.capacity}", flush=True)

    width, height = 1280, 704
    intr = jnp.asarray([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    w2c = jnp.eye(4)
    params = sf.render_params(s)

    tx = rp._cdiv(width, rp.TILE_W)
    ty = rp._cdiv(height, rp.TILE_H)
    n_tiles = tx * ty

    caps = tuple(int(c) for c in os.environ.get("PROF_CAPS", "2048,1024").split(","))
    for cap in caps:
        print(f"--- cap {cap}", flush=True)
        proj_f = jax.jit(lambda p: rc.project_surfels(p, w2c, intr, width, height, 0))
        proj = timeit("project (N)", lambda: proj_f(params))

        bin_f = jax.jit(lambda pr: rp._bin_entries(
            pr.depth, pr.mean2d, pr.radius, pr.valid, n_tiles, tx, ty, cap))
        entry_sid, counts, back_map, _ = timeit("bin: 2 sorts + slots (N*K)", lambda: bin_f(proj))
        cnp = np.asarray(counts)
        print(f"    sub-col counts: mean {cnp.mean():.0f} p50 {np.percentile(cnp, 50):.0f} "
              f"p90 {np.percentile(cnp, 90):.0f} max {cnp.max()} capsub {cap // 4}", flush=True)

        attrs = jnp.concatenate([
            proj.mean2d, proj.conic, proj.opacity[None], proj.color,
            proj.normal_cam, proj.p_cam,
            jnp.ones((1, proj.mean2d.shape[-1]), jnp.float32),
        ], axis=0).T
        gather_f = jax.jit(lambda a, sid: a[sid])
        timeit(f"expand gather (T*CAP={n_tiles * cap / 1e6:.2f}M rows)",
               lambda: gather_f(attrs, entry_sid))

        geom_f = jax.jit(lambda p: rp.render_pallas(
            p, w2c, intr, width, height, sh_degree=0, cap=cap,
            geom_only=True, need_grad=False)["depth"])
        timeit("render geom fwd (map_update's render)", lambda: geom_f(params))

        full_f = jax.jit(lambda p: rp.render_pallas(
            p, w2c, intr, width, height, sh_degree=0, cap=cap,
            need_grad=False)["color"])
        timeit("render full fwd (postprocess render)", lambda: full_f(params))

        binning = rp.compute_binning(params, w2c, intr, width, height, cap=cap)
        fparams = {k: v for k, v in params.items() if v.dtype == jnp.float32}
        rest = {k: v for k, v in params.items() if v.dtype != jnp.float32}

        def loss_cached(fp, rest_, bin_, keep=None):
            out = rp.render_pallas({**fp, **rest_}, w2c, intr, width, height,
                                   sh_degree=0, cap=cap, binning=bin_,
                                   tile_keep=keep)
            return (out["color"].sum() + out["depth"].sum() + out["normal"].sum()
                    + out["opacity"].sum())

        g_f = jax.jit(jax.grad(loss_cached))
        timeit("fwd+bwd (cached bin, all tiles)",
               lambda: g_f(fparams, rest, binning)["xyz"])

        keep = jnp.arange(n_tiles) % 2 == 0
        gh_f = jax.jit(jax.grad(lambda fp, r, b, k: loss_cached(fp, r, b, k)))
        timeit("fwd+bwd (cached bin, tile_keep 0.5)",
               lambda: gh_f(fparams, rest, binning, keep)["xyz"])


if __name__ == "__main__":
    main()
