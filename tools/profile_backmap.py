"""Microbench: strategies for the _expand_entries backward reduction.

The op: dent (T*CAP, 16) slab gradients -> d_attrs (N, 16), where each
surfel sums the <= K slab rows its candidates landed in (back_map (N, K),
-1 = culled/overflowed). The production path is a (N*K)-row gather; this
tool compares it against sorted-cumsum segment reduction and segment_sum.

    python tools/profile_backmap.py [N] [T]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def t(fn, n=10):
    import jax

    jax.block_until_ready(fn())
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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 220
    CAP = 512
    K = 4
    R = T * CAP  # slab rows (~112k)

    rng = np.random.default_rng(0)
    dent = jnp.asarray(rng.normal(size=(R, 16)).astype(np.float32))
    # realistic back_map: ~45% of candidates land in a slab row
    bm = rng.integers(0, R, (N, K)).astype(np.int32)
    bm[rng.uniform(size=(N, K)) > 0.45] = -1
    back_map = jnp.asarray(bm)
    # slab -> sid map (what binning's entry_sid provides)
    sid = jnp.asarray(rng.integers(0, N, (R,)).astype(np.int32))

    @jax.jit
    def v_gather(dent, back_map):
        idx = jnp.clip(back_map, 0, R - 1)
        picked = dent[idx]  # (N, K, 16)
        return jnp.sum(jnp.where((back_map >= 0)[..., None], picked, 0.0), axis=1)

    @jax.jit
    def v_gather_flat(dent, back_map):
        # one flat (N*K)-row gather instead of a (N, K) 2-D gather
        idx = jnp.clip(back_map.reshape(-1), 0, R - 1)
        picked = dent[idx].reshape(N, K, 16)
        return jnp.sum(jnp.where((back_map >= 0)[..., None], picked, 0.0), axis=1)

    @jax.jit
    def v_segment_sum(dent, sid):
        return jax.ops.segment_sum(dent, sid, num_segments=N)

    @jax.jit
    def v_sorted_cumsum(dent, sid):
        # sort slab rows by surfel id (112k keys), cumsum, per-surfel
        # boundary diff via searchsorted: two N-row gathers of the psum
        order = jnp.argsort(sid)
        sorted_sid = sid[order]
        sorted_rows = dent[order]  # (R, 16) gather of 112k rows
        psum = jnp.cumsum(sorted_rows, axis=0)
        psum = jnp.concatenate([jnp.zeros((1, 16), psum.dtype), psum], axis=0)
        lo = jnp.searchsorted(sorted_sid, jnp.arange(N, dtype=sid.dtype), side="left")
        hi = jnp.searchsorted(sorted_sid, jnp.arange(N, dtype=sid.dtype), side="right")
        return psum[hi] - psum[lo]

    print(f"N={N} slab rows={R} K={K}")
    print(f"gather (N,K):        {t(lambda: v_gather(dent, back_map)):8.2f} ms")
    print(f"gather flat (N*K,):  {t(lambda: v_gather_flat(dent, back_map)):8.2f} ms")
    print(f"segment_sum:         {t(lambda: v_segment_sum(dent, sid)):8.2f} ms")
    print(f"sorted cumsum diff:  {t(lambda: v_sorted_cumsum(dent, sid)):8.2f} ms")


if __name__ == "__main__":
    main()
