"""Micro-bench gather strategies for tracker resampling on the device."""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:40s} {dt:9.3f} ms", flush=True)
    return out


def main():
    H, W = 704, 1280
    Hs, Ws = H // 2, W // 2  # stride-2 constraint grid
    C = 7
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.97, 0.97, (Hs, Ws, 2)).astype(np.float32))

    from eggfusion_tpu.ops import image as imops
    from eggfusion_tpu.ops import reduce as gn

    near = jax.jit(lambda im, c: imops.nearest_sample(im, c, padding="border"))
    timeit("nearest_sample img[jc,ic] (7ch)", near, img, coords)

    @jax.jit
    def near_flat(im, c):
        x = (c[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (c[..., 1] + 1.0) * 0.5 * (H - 1)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        flat = im.reshape(H * W, C)
        return jnp.take(flat, jc * W + ic, axis=0)
    timeit("nearest flat row-take (7ch)", near_flat, img, coords)

    @jax.jit
    def near_flat_1d(im, c):
        x = (c[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (c[..., 1] + 1.0) * 0.5 * (H - 1)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        idx = (jc * W + ic).reshape(-1)
        cols = [jnp.take(im[..., k].reshape(-1), idx) for k in range(C)]
        return jnp.stack(cols, -1)
    timeit("nearest per-channel 1d take (7ch)", near_flat_1d, img, coords)

    img3 = img[..., :3]
    bil = jax.jit(lambda im, c: gn._bilinear_rowpair(im, c))
    timeit("bilinear_rowpair (3ch)", bil, img3, coords)

    bil4 = jax.jit(lambda im, c: imops.bilinear_sample(im, c, padding="zeros"))
    timeit("bilinear 4-corner img[jc,ic] (3ch)", bil4, img3, coords)

    @jax.jit
    def bil_flat(im, c):
        x = (c[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (c[..., 1] + 1.0) * 0.5 * (H - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        dx = (x - x0)[..., None]; dy = (y - y0)[..., None]
        flat = im.reshape(H * W, 3)
        def g(ix, iy):
            ic = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
            jc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
            return jnp.take(flat, jc * W + ic, axis=0)
        v00 = g(x0, y0); v10 = g(x0 + 1, y0); v01 = g(x0, y0 + 1); v11 = g(x0 + 1, y0 + 1)
        return (v00 * (1 - dx) * (1 - dy) + v10 * dx * (1 - dy)
                + v01 * (1 - dx) * dy + v11 * dx * dy)
    timeit("bilinear 4x flat row-take (3ch)", bil_flat, img3, coords)

    # full GN build at each level
    from eggfusion_tpu.ops.pyramid import build_pyramid
    intr = jnp.asarray([600.0, 600.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
    color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    depth = jnp.asarray((1.5 + rng.uniform(size=(H, W, 1))).astype(np.float32))
    mask = jnp.ones((H, W, 1), jnp.float32)
    pyr = jax.jit(lambda c, d, m: build_pyramid(c, d, m, intr, nlevel=3))(color, depth, mask)
    jax.block_until_ready(pyr[0].intensity)

    T = jnp.eye(4)
    for lvl in range(3):
        f = jax.jit(lambda m, fr, t, l=lvl: gn.build_normal_equations(
            m, fr, t, 20.0, 0.1, True, 1e-4, stride=2 if l == 0 else 1))
        timeit(f"build_normal_eq level {lvl}", f, pyr[lvl], pyr[lvl], T, n=5)

    timeit("build_pyramid", jax.jit(lambda c, d, m: build_pyramid(c, d, m, intr, nlevel=3)), color, depth, mask, n=5)


if __name__ == "__main__":
    main()
