"""Does TPU gather cost scale with bytes (bf16 wins) or elements (no win)?"""
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
    print(f"{label:44s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return out


def main():
    H, W, C = 704, 1280, 8
    Hs, Ws = H // 2, W // 2
    rng = np.random.default_rng(0)
    img32 = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    img16 = img32.astype(jnp.bfloat16)
    # pack pairs of bf16 channels into f32 lanes via bitcast: C/2 f32 channels
    img16p = jax.lax.bitcast_convert_type(
        img16.reshape(H, W, C // 2, 2), jnp.float32)  # (H, W, C//2)
    disp = jnp.asarray((0.5 + rng.uniform(size=(Hs, Ws))).astype(np.float32))

    def coords_from(transform_like, d):
        # index computation in-program (mirrors the tracker)
        ys, xs = jnp.meshgrid(jnp.arange(Hs, dtype=jnp.float32) * 2,
                              jnp.arange(Ws, dtype=jnp.float32) * 2, indexing="ij")
        x = xs + transform_like * d * 10.0
        y = ys + transform_like * d * 5.0
        return x, y

    def g32(t):
        x, y = coords_from(t, disp)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        return jnp.sum(img32[jc, ic])
    timeit("gather f32 8ch fused coords", jax.jit(g32), jnp.float32(0.3))

    def g16(t):
        x, y = coords_from(t, disp)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        return jnp.sum(img16[jc, ic].astype(jnp.float32))
    timeit("gather bf16 8ch fused coords", jax.jit(g16), jnp.float32(0.3))

    def g16p(t):
        x, y = coords_from(t, disp)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        packed = img16p[jc, ic]  # (..., C//2) f32
        un = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)  # (..., C//2, 2)
        return jnp.sum(un.astype(jnp.float32))
    timeit("gather f32-packed-bf16 (4ch) fused", jax.jit(g16p), jnp.float32(0.3))

    # scaling check: 2ch f32
    img2 = img32[..., :2]
    def g2(t):
        x, y = coords_from(t, disp)
        ic = jnp.clip(jnp.rint(x), 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(jnp.rint(y), 0, H - 1).astype(jnp.int32)
        return jnp.sum(img2[jc, ic])
    timeit("gather f32 2ch fused coords", jax.jit(g2), jnp.float32(0.3))


if __name__ == "__main__":
    main()
