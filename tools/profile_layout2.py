"""Interface costs for a transposed-SoA design: wide transposes and
separate-component gathers vs packed row gathers."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain(label, step, x0, reduce_out, ns=(1, 4, 12)):
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
    N = 600_000
    HW = 1280 * 704
    rng = np.random.default_rng(0)

    a16 = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32))

    @jax.jit
    def t16(x):
        y = x.T  # (N, 16)
        return x + jnp.sum(y[0]) * np.float32(1e-16)

    chain("transpose (16,N)->(N,16)", t16, a16, lambda x: jnp.sum(x))

    tbl = jnp.asarray(rng.normal(size=(HW, 11)).astype(np.float32))
    tblT = jnp.asarray(np.ascontiguousarray(np.asarray(tbl).T))
    pix = jnp.asarray(rng.integers(0, HW, N).astype(np.int32))

    @jax.jit
    def packed_gather(tbl):
        m = tbl[pix]  # (N, 11)
        return tbl + jnp.sum(m) * np.float32(1e-16)

    chain("packed row gather (N,11) from (HW,11)", packed_gather,
          tbl, lambda x: jnp.sum(x), ns=(1, 4, 8))

    @jax.jit
    def comp_gathers(tblT):
        acc = jnp.float32(0)
        for i in range(11):
            acc = acc + jnp.sum(tblT[i][pix])
        return tblT + acc * np.float32(1e-16)

    chain("11 separate (N,) gathers from (11,HW)", comp_gathers,
          tblT, lambda x: jnp.sum(x), ns=(1, 4, 8))

    @jax.jit
    def gather_then_transpose(tbl):
        m = tbl[pix]  # (N, 11)
        mT = m.T  # (11, N)
        return tbl + jnp.sum(mT[0]) * np.float32(1e-16)

    chain("row gather + transpose -> (11,N)", gather_then_transpose,
          tbl, lambda x: jnp.sum(x), ns=(1, 4, 8))

    # single flat gather for reference
    flat = jnp.asarray(rng.normal(size=(HW,)).astype(np.float32))

    @jax.jit
    def one_gather(flat):
        return flat + jnp.sum(flat[pix]) * np.float32(1e-16)

    chain("one (N,) gather from (HW,)", one_gather, flat, lambda x: jnp.sum(x))

    # image-layout gather: keep table as (H, W, 11) and gather via (vy, vx)?
    img = jnp.asarray(rng.normal(size=(704, 1280, 11)).astype(np.float32))
    vy = jnp.asarray(rng.integers(0, 704, N).astype(np.int32))
    vx = jnp.asarray(rng.integers(0, 1280, N).astype(np.int32))

    @jax.jit
    def img_gather(img):
        m = img[vy, vx]
        return img + jnp.sum(m) * np.float32(1e-16)

    chain("2d row gather (N,11) from (H,W,11)", img_gather, img,
          lambda x: jnp.sum(x), ns=(1, 4, 8))


if __name__ == "__main__":
    main()
