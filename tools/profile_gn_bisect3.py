"""Finish bisecting the 884ms RGB term."""
import time
import jax
import jax.numpy as jnp
import numpy as np

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
    sl = lambda x: x[::stride, ::stride]

    def warp(transform):
        return gn.projective_warp(transform, sl(model.disp), model.intr, stride)

    def wp_rowpair(transform):
        coords, _ = warp(transform)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        return gn._bilinear_rowpair(bil_pack, coords)
    timeit("warp + rowpair", jax.jit(wp_rowpair), T)

    bil_pack_pre = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)

    def wp_rowpair_pre(transform, pack):
        coords, _ = warp(transform)
        return gn._bilinear_rowpair(pack, coords)
    timeit("warp + rowpair (pack as input)", jax.jit(wp_rowpair_pre), T, bil_pack_pre)

    def rgb_no_neq(transform):
        coords, Jc_ = warp(transform)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        bs = gn._bilinear_rowpair(bil_pack, coords)
        Ji_ = bs[..., 1:3]
        J_rgb = (Ji_[..., 0:1] * Jc_[..., 0, :] + Ji_[..., 1:2] * Jc_[..., 1, :]).reshape(-1, 6)
        r_rgb = (sl(model.intensity)[..., 0] - bs[..., 0]).reshape(-1)
        return jnp.sum(J_rgb, axis=0), jnp.sum(r_rgb)
    timeit("rgb term minus normal-eq (sum out)", jax.jit(rgb_no_neq), T)

    N = (H // stride) * (W // stride)
    J = jnp.asarray(rng.standard_normal((N, 6)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    w = jnp.ones(N)
    timeit("weighted_normal_eq alone", jax.jit(gn._weighted_normal_eq), J, r, w)

    def rgb_neq_from_inputs(Jm, rm, wm):
        return gn._weighted_normal_eq(jnp.nan_to_num(Jm), jnp.nan_to_num(rm), wm)
    timeit("nan_to_num + normal_eq", jax.jit(rgb_neq_from_inputs), J, r, w)

    def rgb_full(transform):
        coords, Jc_ = warp(transform)
        c = coords.reshape(-1, 2)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        bs = gn._bilinear_rowpair(bil_pack, coords)
        Ji_ = bs[..., 1:3]
        inb = (c[:, 0] > -0.9) & (c[:, 0] < 0.9) & (c[:, 1] > -0.9) & (c[:, 1] < 0.9)
        w_ = inb.astype(jnp.float32)
        J_rgb = jnp.nan_to_num((Ji_[..., 0:1] * Jc_[..., 0, :] + Ji_[..., 1:2] * Jc_[..., 1, :]).reshape(-1, 6))
        r_rgb = jnp.nan_to_num((sl(model.intensity)[..., 0] - bs[..., 0]).reshape(-1))
        return gn._weighted_normal_eq(J_rgb, r_rgb, w_)
    timeit("rgb full (reference)", jax.jit(rgb_full), T)


if __name__ == "__main__":
    main()
