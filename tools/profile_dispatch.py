"""Measure per-call HOST dispatch overhead on this backend (tunnel-attached
TPU): how much wall time does the host spend merely enqueueing a jitted
program, independent of device compute? Drives the how-many-programs-per-
frame budget (VERDICT r2 #2).

    python tools/profile_dispatch.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def tiny(x):
        return x + 1.0

    @jax.jit
    def small_args(x, d):
        return x + d["a"] * d["b"].sum()

    x = jnp.zeros(())
    d = {"a": jnp.ones((4, 4)), "b": jnp.ones((64, 64))}
    big = jnp.zeros((1024, 1024))

    @jax.jit
    def matmul(a):
        return a @ a

    # compile
    tiny(x).block_until_ready()
    small_args(x, d).block_until_ready()
    matmul(big).block_until_ready()

    def bench(label, fn, n=50):
        fn()  # warm
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        t_dispatch = (time.perf_counter() - t0) / n * 1e3
        jax.block_until_ready(outs)
        t_total = (time.perf_counter() - t0) / n * 1e3
        print(f"[dispatch] {label}: enqueue {t_dispatch:.2f} ms/call, "
              f"total {t_total:.2f} ms/call", flush=True)

    bench("tiny scalar", lambda: tiny(x))
    bench("small args (pytree)", lambda: small_args(x, d))
    bench("1k matmul", lambda: matmul(big))

    # chained dependent calls (what a frame actually does)
    def chain():
        y = tiny(x)
        for _ in range(7):
            y = tiny(y)
        return y

    bench("8-chain tiny", chain, n=20)

    # host->device upload of a small array (pose-sized and image-sized)
    pose = np.eye(4, dtype=np.float32)
    img = np.zeros((704, 1280, 3), np.float32)
    bench("device_put 4x4", lambda: jax.device_put(pose), n=30)
    bench("device_put 704x1280x3", lambda: jax.device_put(img), n=10)

    # device->host sync of one scalar
    s = tiny(x)
    bench("np.asarray(scalar) sync", lambda: np.asarray(tiny(x)), n=20)


if __name__ == "__main__":
    main()
