"""Bisect fuse_surfels cost: gathers vs elementwise vs scatter pieces."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=10, vary=None, **kw):
    """vary: index of an f32-array arg to perturb per call (defeats any
    result caching in the device tunnel)."""
    args = list(args)
    out = jax.block_until_ready(fn(*args, **kw))
    # pre-build varied inputs OUTSIDE the timed loop (device-resident)
    varied = None
    if vary is not None:
        varied = [jax.block_until_ready(args[vary] + np.float32(1e-7 * (i + 1)))
                  for i in range(n)]
    t0 = time.perf_counter()
    outs = []
    for i in range(n):
        if varied is not None:
            args[vary] = varied[i]
        outs.append(fn(*args, **kw))
    jax.block_until_ready(outs)
    print(f"{label:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return out


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
    depth = jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)

    imap, dbuf = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)
    imap = jax.block_until_ready(imap)

    timeit("project_surfels_to_frame", fusion.project_surfels_to_frame,
           s.xyz, s.active, w2c, intr, width, height, vary=0)

    timeit("fuse_surfels (full)", lambda d, *a: fusion.fuse_surfels(s, imap, w2c, intr,
           vertex_w, normal_w, color, d, geo_mask, d, 0.05, scfg, jnp.int32(1)), depth, vary=0)

    # pieces
    N = s.capacity
    HW = width * height

    @jax.jit
    def centers(s):
        return fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)

    pix, ok, _ = timeit("  _center_pixels", lambda d, s: centers(s.replace(xyz=s.xyz + d[0,0,0]*0)), depth, s, vary=0)
    pixc = jnp.minimum(pix, HW - 1)
    pixc = jax.block_until_ready(pixc)

    @jax.jit
    def imap_gather(imap, pixc):
        return imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32)

    timeit("  imap winner gather (N i32)", lambda d, imap, pixc: imap_gather(imap, jnp.minimum(pixc + (d[0,0,0]>2).astype(jnp.int32)*0, HW-1)), depth, imap, pixc, vary=0)

    @jax.jit
    def meas_gather(vertex_w, normal_w, color, depth, geo_mask, pixc):
        meas = jnp.concatenate(
            [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
        ).reshape(-1, 11)[pixc]
        return meas

    meas = timeit("  meas packed gather (N x 11 f32)", meas_gather,
                  vertex_w, normal_w, color, depth, geo_mask, pixc, vary=3)

    @jax.jit
    def meas_gather_pre(big, pixc):
        return big[pixc]

    big = jnp.concatenate(
        [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
    ).reshape(-1, 11)
    big = jax.block_until_ready(big)
    timeit("  meas gather alone (pre-packed)", lambda d, big, pixc: meas_gather_pre(big + d[0,0,0]*0, pixc), depth, big, pixc, vary=0)

    from eggfusion_tpu.geometry import transforms as tf

    @jax.jit
    def rot_piece(normal_new):
        z_axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (N, 3))
        return tf.compute_rot(z_axis, normal_new)

    timeit("  compute_rot (N)", lambda d, m: rot_piece(m + d[0,0,0]*0), depth, meas[:, 3:6], vary=0)


if __name__ == "__main__":
    main()
