"""Microbenchmark frame-build pieces on the current device."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def t(fn, n=10):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggfusion_tpu.ops import image as imops
    from eggfusion_tpu.ops.pyramid import build_pyramid

    H, W = 704, 1280
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, (H, W, 1)).astype(np.float32))
    color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    mask = jnp.ones((H, W, 1), jnp.float32)
    intr = jnp.asarray([600.0, 600.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)

    bil = jax.jit(lambda d: imops.bilateral_filter(d, 13, 0.03, 4.5))
    bil_sep = jax.jit(lambda d: imops.bilateral_filter_separable(d, 13, 0.03, 4.5))
    pyr = jax.jit(lambda c, d, m: build_pyramid(c, d, m, intr, nlevel=3))
    grad = jax.jit(lambda g: imops.scharr_gradient(g))
    vn = jax.jit(lambda d: imops.compute_vertex_and_normal(d, intr))
    down = jax.jit(lambda c: imops.gaussian_downsample(c))

    d2 = jnp.asarray(np.asarray(depth)[..., 0])  # (H, W) contiguous
    import jax as _jax
    d2 = _jax.block_until_ready(d2)
    print(f"bilateral 13x13 L0:   {t(lambda: bil(depth)):8.2f} ms")
    print(f"bilateral sep L0:     {t(lambda: bil_sep(depth)):8.2f} ms")
    print(f"build_pyramid(3):     {t(lambda: pyr(color, depth, mask)):8.2f} ms")
    print(f"scharr L0:            {t(lambda: grad(d2)):8.2f} ms")
    print(f"vertex+normal L0:     {t(lambda: vn(depth)):8.2f} ms")
    print(f"gauss_down L0 3ch:    {t(lambda: down(color)):8.2f} ms")
    down1 = jax.jit(lambda c: imops.gaussian_downsample(c))
    print(f"gauss_down L0 1ch:    {t(lambda: down1(d2)):8.2f} ms")


if __name__ == "__main__":
    main()
