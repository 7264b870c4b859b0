"""Chained-dependency timing of the transposed fuse path (cache-proof)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain(label, step, x0, reduce_out, ns=(1, 4, 12)):
    x = step(x0)
    float(np.asarray(reduce_out(x)))
    times = []
    for n in ns:
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(np.asarray(reduce_out(x)))
        times.append(time.perf_counter() - t0)
    slope = (times[-1] - times[0]) / (ns[-1] - ns[0]) * 1e3
    print(f"{label:48s} slope {slope:8.3f} ms/call", flush=True)


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
    s0 = jax.block_until_ready(
        jax.jit(sf.append_surfels, static_argnums=(3,))(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99))

    w2c = jnp.eye(4)
    intr = jnp.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    vertex_w = jnp.asarray(rng.uniform(-2, 5, (height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)
    imap, _ = fusion.project_surfels_to_frame(s0.xyz, s0.active, w2c, intr, width, height)
    imap = jax.block_until_ready(imap)

    def fuse_step(s):
        s2, _ = fusion.fuse_surfels(s, imap, w2c, intr, vertex_w, normal_w, color,
                                    depth, geo_mask, depth, 0.05, scfg, jnp.int32(1))
        return s2
    chain("fuse_surfels full (chained)", fuse_step, s0, lambda s: jnp.sum(s.xyz[2]))

    def fuse_frame_step(s):
        s2, _ = fusion.fuse_frame(s, w2c, intr, vertex_w, normal_w, color,
                                  depth, geo_mask, 0.05, scfg)
        return s2
    chain("fuse_frame sort-winner (chained)", fuse_frame_step, s0, lambda s: jnp.sum(s.xyz[2]))

    def proj_step(s):
        im, db = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)
        return s.replace(xyz=s.xyz + jnp.sum(db) * 1e-20)
    chain("project_surfels_to_frame (chained)", proj_step, s0, lambda s: jnp.sum(s.xyz[2]))

    big = jax.block_until_ready(jnp.concatenate(
        [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1))
    u, v, ok, _z = fusion._center_pixels(s0.xyz, s0.active, w2c, intr, width, height)
    uc0 = jax.block_until_ready(jnp.clip(u, 0, width - 1))
    vc0 = jax.block_until_ready(jnp.clip(v, 0, height - 1))

    @jax.jit
    def gstep(carry):
        uc, vc, acc = carry
        m = big[vc, uc]  # (N, 11)
        acc = acc + jnp.sum(m[:, 0])
        uc = jnp.clip(uc + (acc * 0).astype(jnp.int32) + 1, 0, width - 1)
        return uc, vc, acc
    chain("meas 2d gather (chained)", gstep, (uc0, vc0, jnp.float32(0)), lambda c: c[2])

    @jax.jit
    def wstep(carry):
        uc, vc, acc = carry
        w = imap[vc, uc] == jnp.arange(cap_total, dtype=jnp.int32)
        acc = acc + jnp.sum(w.astype(jnp.float32))
        uc = jnp.clip(uc + (acc * 0).astype(jnp.int32) + 1, 0, width - 1)
        return uc, vc, acc
    chain("imap winner gather (chained)", wstep, (uc0, vc0, jnp.float32(0)), lambda c: c[2])

    def stab_step(s):
        return sf.update_stability(s, 10.0)
    chain("update_stability (chained)", jax.jit(stab_step), s0, lambda s: jnp.sum(s.stable))

    app_j = jax.jit(sf.append_surfels, static_argnums=(3,))
    small = jax.tree.map(lambda x: x[:32768] if hasattr(x, "shape") and x.shape[:1] == (n_surfels,) else x, batch)
    def app_step(s):
        return app_j(s, small, jnp.int32(1), 0.99)
    chain("append_surfels 32k (chained)", app_step, s0, lambda s: jnp.sum(s.xyz[2]))


if __name__ == "__main__":
    main()
