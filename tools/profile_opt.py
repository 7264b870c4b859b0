"""Profile opt_step internals + binning variants on the device."""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return out


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
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

    proj_j = jax.jit(lambda p, w: rc.project_surfels(p, w, intr, width, height, 0))
    timeit("project_surfels", proj_j, params, w2c)

    timeit("compute_binning (full)", rp.compute_binning, params, w2c, intr,
           width=width, height=height, cap=512)

    binning = rp.compute_binning(params, w2c, intr, width=width, height=height, cap=512)
    jax.block_until_ready(binning.counts)

    render_nb = jax.jit(lambda p, w: rp._render_pallas_jit(
        p, w, intr, width, height, 0, 512, False, None))
    timeit("render fwd (incl binning)", render_nb, params, w2c)

    render_b = jax.jit(lambda p, w, b: rp._render_pallas_jit(
        p, w, intr, width, height, 0, 512, False, b))
    timeit("render fwd (cached binning)", render_b, params, w2c, binning)

    # gradient step cost: loss = sum of all outputs; grad only float leaves
    fparams = {k: v for k, v in params.items()
               if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)}
    aux = {k: v for k, v in params.items() if k not in fparams}

    def loss_fn(fp, w, b):
        out = rp._render_pallas_jit({**aux, **fp}, w, intr, width, height, 0, 512, False, b)
        return sum(jnp.sum(v) for v in out.values())
    g_b = jax.jit(lambda fp, w: jax.grad(loss_fn)(fp, w, binning))
    timeit("render fwd+bwd (cached binning)", g_b, fparams, w2c, n=3)

    g_nb = jax.jit(lambda fp, w: jax.grad(loss_fn)(fp, w, None))
    timeit("render fwd+bwd (no cache)", g_nb, fparams, w2c, n=3)


if __name__ == "__main__":
    main()
