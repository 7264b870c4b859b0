"""Bisect the RGB term: einsum vs broadcast-sum."""
import time
import jax
import jax.numpy as jnp
import numpy as np

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

    Hs, Ws = H // stride, W // stride
    Ji = jnp.asarray(rng.standard_normal((Hs, Ws, 2)).astype(np.float32))
    Jc = jnp.asarray(rng.standard_normal((Hs, Ws, 2, 6)).astype(np.float32))

    timeit("einsum hwk,hwkj->hwj", jax.jit(lambda a, b: jnp.einsum("hwk,hwkj->hwj", a, b)), Ji, Jc)
    timeit("broadcast-sum", jax.jit(
        lambda a, b: a[..., 0:1] * b[..., 0, :] + a[..., 1:2] * b[..., 1, :]), Ji, Jc)

    def rgb_term(transform, use_einsum):
        sl = lambda x: x[::stride, ::stride]
        m_disp = sl(model.disp)
        coords, Jc_ = gn.projective_warp(transform, m_disp, model.intr, stride)
        c = coords.reshape(-1, 2)
        bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)
        bs = gn._bilinear_rowpair(bil_pack, coords)
        sample_I = bs[..., 0]
        Ji_ = bs[..., 1:3]
        inb = (c[:, 0] > -0.9) & (c[:, 0] < 0.9) & (c[:, 1] > -0.9) & (c[:, 1] < 0.9)
        w = inb.astype(jnp.float32)
        if use_einsum:
            J_rgb = jnp.einsum("hwk,hwkj->hwj", Ji_, Jc_).reshape(-1, 6)
        else:
            J_rgb = (Ji_[..., 0:1] * Jc_[..., 0, :] + Ji_[..., 1:2] * Jc_[..., 1, :]).reshape(-1, 6)
        J_rgb = jnp.nan_to_num(J_rgb)
        r_rgb = jnp.nan_to_num((sl(model.intensity)[..., 0] - sample_I).reshape(-1))
        return gn._weighted_normal_eq(J_rgb, r_rgb, w)

    timeit("rgb term (broadcast)", jax.jit(lambda t: rgb_term(t, False)), T)
    timeit("rgb term (einsum)", jax.jit(lambda t: rgb_term(t, True)), T)


if __name__ == "__main__":
    main()
