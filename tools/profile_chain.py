"""Trustworthy timing on the axon tunnel: chain N calls through a data
dependency and force a host readback of a scalar reduced from the final
output. wall(N) slope = true per-call cost; the readback cannot be elided.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain(label, step, x0, reduce_out, ns=(1, 4, 12)):
    """step(x) -> x_next (same structure); reduce_out(x) -> device scalar."""
    x = step(x0)
    float(np.asarray(reduce_out(x)))  # warm + real sync
    times = []
    for n in ns:
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(np.asarray(reduce_out(x)))
        times.append(time.perf_counter() - t0)
    slope = (times[-1] - times[0]) / (ns[-1] - ns[0]) * 1e3
    print(f"{label:44s} slope {slope:8.3f} ms/call   walls "
          + " ".join(f"{t*1e3:.1f}" for t in times), flush=True)


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import fusion
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

    w2c = jnp.eye(4)
    intr = jnp.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    params0 = sf.render_params(s)

    # --- render fwd chained: next xyz depends on the rendered color ---------
    @jax.jit
    def render_step(p):
        out = render_pallas(p, w2c, intr, width, height, sh_degree=0, cap=512)
        eps = jnp.sum(out["color"]) * np.float32(1e-12)
        return {**p, "xyz": p["xyz"] + eps}

    chain("render fwd (fresh bin, cap512)", render_step, params0,
          lambda p: jnp.sum(p["xyz"]))

    binning = compute_binning(params0, w2c, intr, width, height, cap=512)

    @jax.jit
    def render_step_cached(p):
        out = render_pallas(p, w2c, intr, width, height, sh_degree=0, cap=512,
                            binning=binning)
        eps = jnp.sum(out["color"]) * np.float32(1e-12)
        return {**p, "xyz": p["xyz"] + eps}

    chain("render fwd (cached bin)", render_step_cached, params0,
          lambda p: jnp.sum(p["xyz"]))

    @jax.jit
    def fwd_bwd_step(p):
        def loss(q):
            out = render_pallas({**p, **q}, w2c, intr, width, height, sh_degree=0,
                                cap=512, binning=binning)
            return jnp.sum(out["color"]) + jnp.sum(out["depth"])
        g = jax.grad(loss)({k: p[k] for k in ("xyz", "opacity")})
        return {**p, "xyz": p["xyz"] + jnp.sum(g["xyz"]) * np.float32(1e-15)}

    chain("render fwd+bwd (cached bin)", fwd_bwd_step, params0,
          lambda p: jnp.sum(p["xyz"]), ns=(1, 4, 8))

    @jax.jit
    def bin_step(p):
        b = compute_binning(p, w2c, intr, width, height, cap=512)
        return {**p, "xyz": p["xyz"] + jnp.sum(b.counts).astype(jnp.float32) * np.float32(1e-15)}

    chain("compute_binning", bin_step, params0, lambda p: jnp.sum(p["xyz"]))

    # --- fusion chained -----------------------------------------------------
    vertex_w = jnp.asarray(rng.uniform(-2, 5, (height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)
    imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)

    @jax.jit
    def fuse_step(s):
        s2, stats = fusion.fuse_surfels(
            s, imap, w2c, intr, vertex_w, normal_w, color, depth, geo_mask,
            depth, 0.05, scfg, jnp.int32(1))
        return s2

    chain("fuse_surfels", fuse_step, s, lambda s: jnp.sum(s.xyz))

    @jax.jit
    def imap_step(s):
        im, db = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)
        return s.replace(xyz=s.xyz + jnp.sum(db) * np.float32(1e-15))

    chain("project_surfels_to_frame", imap_step, s, lambda s: jnp.sum(s.xyz))


if __name__ == "__main__":
    main()
