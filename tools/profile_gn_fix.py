"""Test fixes for the fused-index gather slowdown."""
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
    sl = lambda x: x[::stride, ::stride]

    def warp(transform):
        return gn.projective_warp(transform, sl(model.disp), model.intr, stride)

    bil_pack = jnp.concatenate([frame.intensity, frame.grad[..., :2]], axis=-1)

    def fix_barrier(transform):
        coords, _ = warp(transform)
        coords = lax.optimization_barrier(coords)
        return gn._bilinear_rowpair(bil_pack, coords)
    timeit("rowpair + opt barrier on coords", jax.jit(fix_barrier), T)

    def fix_bilinear4(transform):
        coords, _ = warp(transform)
        return imops.bilinear_sample(bil_pack, coords, padding="zeros")
    timeit("4-corner img[jc,ic] fused coords", jax.jit(fix_bilinear4), T)

    def fix_bilinear4_barrier(transform):
        coords, _ = warp(transform)
        coords = lax.optimization_barrier(coords)
        return imops.bilinear_sample(bil_pack, coords, padding="zeros")
    timeit("4-corner + barrier", jax.jit(fix_bilinear4_barrier), T)

    def nearest_fused(transform):
        coords, _ = warp(transform)
        near_pack = jnp.concatenate(
            [frame.vertex, frame.normal, frame.mask.astype(jnp.float32)], axis=-1)
        return imops.nearest_sample(near_pack, coords, padding="border")
    timeit("nearest 7ch fused coords", jax.jit(nearest_fused), T)


if __name__ == "__main__":
    main()
