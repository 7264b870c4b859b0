"""Bisect build_normal_equations to find the 900ms op."""
import math
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eggfusion_tpu.ops import image as imops
from eggfusion_tpu.ops import reduce as gn
from eggfusion_tpu.ops.pyramid import build_pyramid


def timeit(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return out


def main():
    H, W = 704, 1280
    rng = np.random.default_rng(0)
    intr = jnp.asarray([600.0, 600.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
    color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    depth = jnp.asarray((1.5 + rng.uniform(size=(H, W, 1))).astype(np.float32))
    mask = jnp.ones((H, W, 1), jnp.float32)
    pyr = jax.jit(lambda c, d, m: build_pyramid(c, d, m, intr, nlevel=3))(color, depth, mask)
    jax.block_until_ready(pyr[0].intensity)
    model = frame = pyr[0]
    T = jnp.eye(4)
    stride = 2

    def prep(transform):
        sl = lambda x: x[::stride, ::stride]
        m_disp = sl(model.disp)
        coords, Jc = gn.projective_warp(transform, m_disp, model.intr, stride)
        return coords, Jc

    timeit("warp only", jax.jit(prep), T)

    def icp_no_rgb(transform):
        return gn.build_normal_equations(model, frame, transform, 20.0, 0.1, False, 1e-4, stride=stride)
    timeit("ICP only (use_rgb=False)", jax.jit(icp_no_rgb), T)

    def near_only(transform):
        coords, _ = prep(transform)
        near_pack = jnp.concatenate(
            [frame.vertex, frame.normal, frame.mask.astype(coords.dtype)[..., None]], axis=-1)
        return imops.nearest_sample(near_pack, coords, padding="border")
    timeit("warp + nearest_sample", jax.jit(near_only), T)

    def rowpair_only(transform):
        coords, _ = prep(transform)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        return gn._bilinear_rowpair(bil_pack, coords)
    timeit("warp + bilinear_rowpair", jax.jit(rowpair_only), T)

    def rgb_term(transform):
        sl = lambda x: x[::stride, ::stride]
        coords, Jc = prep(transform)
        c = coords.reshape(-1, 2)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        bs = gn._bilinear_rowpair(bil_pack, coords)
        sample_I = bs[..., 0]
        Ji = bs[..., 1:3]
        inb = (c[:, 0] > -0.9) & (c[:, 0] < 0.9) & (c[:, 1] > -0.9) & (c[:, 1] < 0.9)
        w = inb.astype(jnp.float32)
        J_rgb = jnp.nan_to_num(jnp.einsum("hwk,hwkj->hwj", Ji, Jc).reshape(-1, 6))
        r_rgb = jnp.nan_to_num((sl(model.intensity)[..., 0] - sample_I).reshape(-1))
        return gn._weighted_normal_eq(J_rgb, r_rgb, w)
    timeit("full RGB term", jax.jit(rgb_term), T)

    def einsum_only(transform):
        coords, Jc = prep(transform)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        bs = gn._bilinear_rowpair(bil_pack, coords)
        Ji = bs[..., 1:3]
        return jnp.einsum("hwk,hwkj->hwj", Ji, Jc)
    timeit("warp + rowpair + einsum", jax.jit(einsum_only), T)

    N = 352 * 640
    J = jnp.asarray(rng.standard_normal((N, 6)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    w = jnp.ones(N)
    timeit("weighted_normal_eq alone", jax.jit(gn._weighted_normal_eq), J, r, w)

    def full(transform):
        return gn.build_normal_equations(model, frame, transform, 20.0, 0.1, True, 1e-4, stride=stride)
    timeit("FULL build_normal_eq", jax.jit(full), T)

    # suspicion: the fori_loop iteration in dense_track (9 iters) — time one
    from eggfusion_tpu.core.tracker import TrackerConfig, dense_track
    cfg = TrackerConfig(solver_stride=2)
    timeit("dense_track 9 iters", jax.jit(lambda t: dense_track(pyr, pyr, t, cfg)), T, n=2)
    cfg1 = TrackerConfig(pyramid_iters=(1, 1, 1), solver_stride=2)
    timeit("dense_track 3 iters", jax.jit(lambda t: dense_track(pyr, pyr, t, cfg1)), T, n=2)


if __name__ == "__main__":
    main()
