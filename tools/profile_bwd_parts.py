"""Decompose the render fwd+bwd cost: composite kernels vs expand gathers vs
projection chain."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)


def main():
    width, height = 1280, 704
    n_surfels, cap_total, cap = 400_000, 600_000, 512
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import raster_pallas as rp
    from eggfusion_tpu.ops import raster_common as rc

    scfg = sf.SurfelConfig(capacity=cap_total, max_sh_degree=0, active_sh_degree=0)
    xyz = np.concatenate(
        [rng.uniform(-2.5, 2.5, (n_surfels, 2)), rng.uniform(1.0, 5.0, (n_surfels, 1))], -1
    ).astype(np.float32)
    nrm = rng.normal(size=(n_surfels, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    lam = np.full((n_surfels, 2), 4.0, np.float32)
    batch = sf.SpawnBatch(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        color=jnp.asarray(rng.uniform(size=(n_surfels, 3)).astype(np.float32)),
        dist=jnp.full((n_surfels, 3), 0.01),
        eta=jnp.asarray(np.concatenate([xyz * lam[:, :1], nrm * lam[:, 1:]], -1)),
        sigma2=jnp.asarray(1.0 / lam), valid=jnp.ones(n_surfels, bool),
    )
    s = sf.append_surfels(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)
    jax.block_until_ready(s.xyz)
    intr = jnp.asarray([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    w2c = jnp.eye(4)
    params = sf.render_params(s)

    hp = rp._cdiv(height, rp.TILE_H) * rp.TILE_H
    wp = rp._cdiv(width, rp.TILE_W) * rp.TILE_W
    tx, ty = wp // rp.TILE_W, hp // rp.TILE_H
    n_tiles = tx * ty

    binning = rp.compute_binning(params, w2c, intr, width=width, height=height, cap=cap)
    jax.block_until_ready(binning.counts)
    counts = binning.counts
    print("mean per-tile count:", float(jnp.mean(counts)), "saturated:",
          int(jnp.sum(counts >= cap)), "/", n_tiles)

    proj = jax.jit(lambda p: rc.project_surfels(p, w2c, intr, width, height, 0))(params)
    jax.block_until_ready(proj.mean2d)
    attrs16 = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[None], proj.color, proj.normal_cam,
         proj.p_cam, jnp.ones((1, proj.mean2d.shape[-1]), jnp.float32)], axis=0)
    attrs = jax.jit(lambda a: a.T)(attrs16)
    jax.block_until_ready(attrs)

    entries0 = jax.jit(lambda a: rp._expand_entries(a, binning.entry_sid, binning.back_map))(attrs)
    entry_valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts
    entries0 = entries0.at[..., rp.A_VAL].set(entry_valid.astype(jnp.float32))
    jax.block_until_ready(entries0)
    intr4 = intr.astype(jnp.float32)

    composite = rp._make_composite(hp, wp, cap, n_tiles, False)

    # 1. composite forward only
    f_fwd = jax.jit(lambda e: composite(e, counts, intr4)[0])
    timeit("composite fwd (kernel only)", f_fwd, entries0)

    # 2. composite fwd+bwd (kernels only)
    def loss_k(e):
        rgb, nrmo, dep, opa, T = composite(e, counts, intr4)
        return jnp.sum(rgb) + jnp.sum(nrmo) + jnp.sum(dep) + jnp.sum(opa)
    g_k = jax.jit(jax.grad(loss_k))
    timeit("composite fwd+bwd (kernels only)", g_k, entries0)

    # 3. expand fwd
    f_e = jax.jit(lambda a: jnp.sum(rp._expand_entries(a, binning.entry_sid, binning.back_map)))
    timeit("expand fwd (gather only)", f_e, attrs)
    # 4. expand fwd+bwd
    g_e = jax.jit(jax.grad(lambda a: jnp.sum(rp._expand_entries(a, binning.entry_sid, binning.back_map) ** 2)))
    timeit("expand fwd+bwd (gathers)", g_e, attrs)

    # 5. projection+attrs fwd+bwd
    fparams = {k: v for k, v in params.items()
               if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)}
    aux = {k: v for k, v in params.items() if k not in fparams}

    def loss_p(fp):
        pr = rc.project_surfels({**aux, **fp}, w2c, intr, width, height, 0)
        a16 = jnp.concatenate(
            [pr.mean2d, pr.conic, pr.opacity[None], pr.color, pr.normal_cam,
             pr.p_cam, jnp.ones((1, pr.mean2d.shape[-1]), jnp.float32)], axis=0)
        return jnp.sum(a16.T ** 2)
    g_p = jax.jit(jax.grad(loss_p))
    timeit("projection+attrs fwd+bwd", g_p, fparams)

    # 6. full grad chain for reference
    def loss_full(fp):
        out = rp._render_pallas_jit({**aux, **fp}, w2c, intr, width, height, 0, cap, False, binning)
        return sum(jnp.sum(v) for v in out.values())
    g_f = jax.jit(jax.grad(loss_full))
    timeit("FULL render fwd+bwd (cached binning)", g_f, fparams)


if __name__ == "__main__":
    main()
