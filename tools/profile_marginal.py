"""Marginal-cost timing: wall(N calls) vs N separates tunnel latency from
true device execution time. Slope = real per-call device cost."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def marginal(label, mkcall, ns=(1, 4, 16)):
    """mkcall(i) -> a callable issuing call #i (inputs pre-staged)."""
    # warm
    jax.block_until_ready(mkcall(0)())
    times = []
    for n in ns:
        t0 = time.perf_counter()
        outs = [mkcall(i)() for i in range(n)]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    n0, n1 = ns[0], ns[-1]
    slope = (times[-1] - times[0]) / (n1 - n0) * 1e3
    print(f"{label:40s} slope {slope:8.3f} ms/call   walls "
          + " ".join(f"{t*1e3:.1f}" for t in times), flush=True)


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import fusion

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
    vertex_w = jnp.asarray(rng.uniform(-2, 5, (height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)

    n_var = 16
    depths = [jax.block_until_ready(
        jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32)))
        for _ in range(n_var)]

    imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)
    imap = jax.block_until_ready(imap)

    marginal("fuse_surfels", lambda i: lambda: fusion.fuse_surfels(
        s, imap, w2c, intr, vertex_w, normal_w, color, depths[i % n_var],
        geo_mask, depths[(i + 1) % n_var], 0.05, scfg, jnp.int32(1)))

    xyzs = [jax.block_until_ready(s.xyz + np.float32(1e-6 * (i + 1))) for i in range(n_var)]
    marginal("project_surfels_to_frame", lambda i: lambda: fusion.project_surfels_to_frame(
        xyzs[i % n_var], s.active, w2c, intr, width, height))

    HW = width * height
    pix = jnp.minimum(jax.block_until_ready(
        fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)[0]), HW - 1)
    big = jax.block_until_ready(jnp.concatenate(
        [vertex_w, normal_w, color, depths[0], geo_mask.astype(jnp.float32)], axis=-1
    ).reshape(-1, 11))
    bigs = [jax.block_until_ready(big + np.float32(1e-6 * (i + 1))) for i in range(n_var)]

    gat = jax.jit(lambda b, p: b[p])
    marginal("meas gather (N x 11 f32)", lambda i: lambda: gat(bigs[i % n_var], pix))

    imap_g = jax.jit(lambda m, p: m.reshape(-1)[p] == jnp.arange(cap_total, dtype=jnp.int32))
    marginal("imap winner gather (N i32)", lambda i: lambda: imap_g(imap, pix))


if __name__ == "__main__":
    main()
