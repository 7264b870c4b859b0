"""Profile map_update internals: index-map scatter, fusion gather, spawn."""
import sys
import time

sys.path.insert(0, ".")

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
    s = sf.append_surfels(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)
    jax.block_until_ready(s.xyz)
    intr = jnp.asarray([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    w2c = jnp.eye(4)

    imap, dbuf = timeit("project_surfels_to_frame (scatter-min)",
                        fusion.project_surfels_to_frame, s.xyz, s.active, w2c, intr,
                        width=width, height=height)

    vertex_w = jnp.asarray(rng.standard_normal((height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    depth = jnp.asarray((1.5 + rng.uniform(size=(height, width, 1))).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)

    fuse_j = jax.jit(lambda s_, im: fusion.fuse_surfels(
        s_, im, w2c, intr, vertex_w, normal_w, color, depth, geo_mask,
        depth, 0.03, scfg, jnp.int32(5)))
    timeit("fuse_surfels (gather-form)", fuse_j, s, imap)

    # spawn sampling + append
    from eggfusion_tpu.core.mapper import Mapping  # just for _sample_spawn? it's local
    # time append_surfels alone
    app_j = jax.jit(lambda s_, b: sf.append_surfels(s_, b, jnp.int32(1), 0.99))
    small = jax.tree.map(lambda x: x[:32768] if hasattr(x, "shape") and x.shape[:1] == (n_surfels,) else x, batch)
    timeit("append_surfels (32k batch)", app_j, s, small)

    timeit("update_stability", jax.jit(lambda s_: sf.update_stability(s_, 10.0)), s)


if __name__ == "__main__":
    main()
