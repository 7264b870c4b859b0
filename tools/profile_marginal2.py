"""Marginal-cost timing of the big per-frame phases: render fwd, fwd+bwd,
frame build, dense track. Slope of wall(N calls) vs N = true per-call cost."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def marginal(label, mkcall, ns=(1, 4, 16)):
    jax.block_until_ready(mkcall(0)())
    times = []
    for n in ns:
        t0 = time.perf_counter()
        outs = [mkcall(i)() for i in range(n)]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    slope = (times[-1] - times[0]) / (ns[-1] - ns[0]) * 1e3
    print(f"{label:40s} slope {slope:8.3f} ms/call   walls "
          + " ".join(f"{t*1e3:.1f}" for t in times), flush=True)


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops.raster_pallas import render_pallas, compute_binning

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
    s = jax.jit(sf.append_surfels)(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)
    s = jax.block_until_ready(s)

    w2c = jnp.eye(4)
    intr = jnp.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)

    n_var = 16
    params0 = sf.render_params(s)
    params_list = []
    for i in range(n_var):
        p = dict(params0)
        p["xyz"] = p["xyz"] + np.float32(1e-6 * (i + 1))
        params_list.append(jax.block_until_ready(p))

    marginal("render fwd (fresh bin, cap512)", lambda i: lambda: render_pallas(
        params_list[i % n_var], w2c, intr, width, height, sh_degree=0, cap=512))

    binning = jax.block_until_ready(
        compute_binning(params0, w2c, intr, width, height, cap=512))
    marginal("render fwd (cached bin)", lambda i: lambda: render_pallas(
        params_list[i % n_var], w2c, intr, width, height, sh_degree=0, cap=512,
        binning=binning))

    @jax.jit
    def fwd_bwd(p):
        def loss(p):
            out = render_pallas(p, w2c, intr, width, height, sh_degree=0, cap=512,
                                binning=binning)
            return jnp.sum(out["color"]) + jnp.sum(out["depth"]) + jnp.sum(out["normal"])
        return jax.grad(lambda q: loss({**p, **q}))(
            {k: p[k] for k in ("xyz", "opacity", "scales")})

    marginal("render fwd+bwd (cached bin)", lambda i: lambda: fwd_bwd(params_list[i % n_var]),
             ns=(1, 4, 8))

    marginal("compute_binning", lambda i: lambda: compute_binning(
        params_list[i % n_var], w2c, intr, width, height, cap=512))

    # frame build
    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.core.frame import Frame

    cfg = cfglib.default_config(
        Dataset={"type": "synthetic", "Calibration": {
            "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
            "width": width, "height": height, "depth_scale": 1.0}},
    )
    colors = [jax.block_until_ready(jnp.asarray(
        rng.uniform(size=(height, width, 3)).astype(np.float32))) for _ in range(4)]
    depths = [jax.block_until_ready(jnp.asarray(
        rng.uniform(1, 5, (height, width)).astype(np.float32))) for _ in range(4)]
    intr4 = np.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], np.float32)

    def build(i):
        def call():
            f = Frame(i, float(i), colors[i % 4], depths[i % 4], None,
                      np.eye(4, dtype=np.float32), cfg)
            return f.pyramid.levels[0].intensity
        return call

    try:
        marginal("frame build (pyramid)", build)
    except Exception as e:
        print("frame build failed:", e)


if __name__ == "__main__":
    main()
