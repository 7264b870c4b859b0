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

    # does this backend support copy_to_host_async, and does it make a
    # LAGGED read free? (the tracker's converged-flag pattern)
    try:
        y = tiny(x)
        y.copy_to_host_async()
        print("[dispatch] copy_to_host_async: supported", flush=True)
    except Exception as e:
        print(f"[dispatch] copy_to_host_async: UNSUPPORTED ({e})", flush=True)

    import collections

    def lagged_read():
        q = collections.deque()
        t0 = time.perf_counter()
        for i in range(20):
            y = tiny(x)
            try:
                y.copy_to_host_async()
            except Exception:
                pass
            q.append(y)
            if len(q) >= 3:
                np.asarray(q.popleft())
        return (time.perf_counter() - t0) / 20 * 1e3

    print(f"[dispatch] lag-3 async read loop: {lagged_read():.2f} ms/iter", flush=True)

    # a frame-shaped burst: ~6 enqueues + 1 lagged read, measured end to end
    def frame_shape():
        q = collections.deque()
        t0 = time.perf_counter()
        for i in range(20):
            a = small_args(x, d)
            b = matmul(big)
            c1 = tiny(x)
            c2 = tiny(c1)
            c3 = small_args(c1, d)
            f = tiny(c2)
            try:
                f.copy_to_host_async()
            except Exception:
                pass
            q.append(f)
            if len(q) >= 3:
                np.asarray(q.popleft())
        jax.block_until_ready([a, b, c3])
        return (time.perf_counter() - t0) / 20 * 1e3

    print(f"[dispatch] frame-shaped 6-dispatch + lag-3 read: {frame_shape():.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
