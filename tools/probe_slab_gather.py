"""Do the rasterizer's two big gathers scale with BYTES or ROWS?

  expand: attrs[entry_sid]        (T*CAP=0.45M rows from a 262k-row table)
  pick:   flat[back_map]          (N*K=1.05M rows from a 0.45M-row table)

If byte-bound, a packed-f16 slab (16 lanes -> 8 f32-packed lanes) halves
both — the two biggest single line items of the render budget. Chained
timing (data dependency + scalar readback fence): the only method that is
trustworthy through the axon tunnel (see tools/profile_chain.py).

    python tools/probe_slab_gather.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain(label, step, x0, reduce_out, ns=(1, 9)):
    x = step(x0)
    float(np.asarray(reduce_out(x)))
    times = []
    for n in ns:
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(np.asarray(reduce_out(x)))
        times.append(time.perf_counter() - t0)
    slope = (times[-1] - times[0]) / (ns[-1] - ns[0]) * 1e3
    print(f"{label:52s} slope {slope:8.3f} ms/call", flush=True)


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    N = 262_144
    T, CAP = 220, 2048
    K = 4

    attrs32 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    sid = jnp.asarray(rng.integers(0, N, (T, CAP)).astype(np.int32))

    # chain by feeding the gather output's sum back into the index (cheap
    # scalar perturbation defeats CSE; gather dominates)
    def mk_expand(table):
        @jax.jit
        def step(x):
            idx = (sid + x.astype(jnp.int32)) % N
            g = table[idx]
            return jnp.sum(g[..., :1].astype(jnp.float32)) * 1e-20
        return step

    attrs16 = attrs32.astype(jnp.float16)
    attrs16p = jax.lax.bitcast_convert_type(attrs16.reshape(N, 8, 2), jnp.float32)
    attrs8 = attrs32[:, :8]

    z = jnp.zeros(())
    ident = lambda x: x
    chain("expand f32 16-lane (64B rows)", mk_expand(attrs32), z, ident)
    chain("expand f32 8-lane (32B rows)", mk_expand(attrs8), z, ident)
    chain("expand f16 16-lane (32B rows)", mk_expand(attrs16), z, ident)
    chain("expand f32-packed-f16 8-lane (32B)", mk_expand(attrs16p), z, ident)

    flat32 = jnp.asarray(rng.standard_normal((T * CAP, 16)).astype(np.float32))
    flat16p = jax.lax.bitcast_convert_type(
        flat32.astype(jnp.float16).reshape(T * CAP, 8, 2), jnp.float32)
    bm = jnp.asarray(rng.integers(0, T * CAP, (N, K)).astype(np.int32))

    def mk_pick(f):
        @jax.jit
        def step(x):
            idx = (bm + x.astype(jnp.int32)) % (T * CAP)
            p = f[idx]  # (N, K, lanes)
            return jnp.sum(p[..., :1].astype(jnp.float32)) * 1e-20
        return step

    chain("pick f32 16-lane (N*K rows, 64B)", mk_pick(flat32), z, ident)
    chain("pick f32-packed-f16 8-lane (32B)", mk_pick(flat16p), z, ident)

    # binning-sort unit: 1.05M / 0.52M u32 keys + payload
    keys = jnp.asarray(rng.integers(0, 2**31, N * K, dtype=np.int64).astype(np.uint32))
    pay = jnp.arange(N * K, dtype=jnp.int32)

    def mk_sort(k, p):
        @jax.jit
        def step(x):
            kk = k ^ x.astype(jnp.uint32)
            sk, sp = jax.lax.sort((kk, p), num_keys=1)
            return (jnp.sum(sp[:8].astype(jnp.float32)) * 1e-20).astype(jnp.float32)
        return step

    chain("lax.sort 1.05M u32+i32 payload", mk_sort(keys, pay), z, ident)
    chain("lax.sort 0.52M u32+i32 payload", mk_sort(keys[: N * K // 2], pay[: N * K // 2]), z, ident)
    chain("lax.sort 0.26M u32+i32 payload", mk_sort(keys[: N], pay[: N]), z, ident)


if __name__ == "__main__":
    main()
