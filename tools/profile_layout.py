"""Validate the lane-utilization hypothesis: (N,3) vector math vs
component-form (N,) math for compute_rot and the fusion info-filter chain."""
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
    rng = np.random.default_rng(0)
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm_d = jnp.asarray(nrm)

    from eggfusion_tpu.geometry import transforms as tf

    @jax.jit
    def rot_rowvec(n):
        z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), n.shape)
        q = tf.compute_rot(z, n)
        return n + jnp.sum(q) * np.float32(1e-16)

    chain("compute_rot (N,3) row-vector form", rot_rowvec, nrm_d,
          lambda n: jnp.sum(n))

    @jax.jit
    def rot_compwise(n):
        nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
        # cross(z, n) = (-ny, nx, 0)
        ax, ay = -ny, nx
        al = jnp.sqrt(ax * ax + ay * ay) + 1e-8
        ax, ay = ax / al, ay / al
        dot = jnp.clip(nz, -1.0 + 1e-7, 1.0 - 1e-7)
        angle = jnp.arccos(dot)
        half = angle * 0.5
        sw = jnp.cos(half)
        s = jnp.sin(half)
        qx, qy = ax * s, ay * s
        return n + (jnp.sum(sw) + jnp.sum(qx) + jnp.sum(qy)) * np.float32(1e-16)

    chain("compute_rot component (N,) form", rot_compwise, nrm_d,
          lambda n: jnp.sum(n))

    # transposed storage: (3, N)
    nrmT = jnp.asarray(nrm.T.copy())

    @jax.jit
    def rot_transposed(nT):
        nx, ny, nz = nT[0], nT[1], nT[2]
        ax, ay = -ny, nx
        al = jnp.sqrt(ax * ax + ay * ay) + 1e-8
        ax, ay = ax / al, ay / al
        dot = jnp.clip(nz, -1.0 + 1e-7, 1.0 - 1e-7)
        half = jnp.arccos(dot) * 0.5
        sw = jnp.cos(half)
        s = jnp.sin(half)
        return nT + (jnp.sum(sw) + jnp.sum(ax * s) + jnp.sum(ay * s)) * np.float32(1e-16)

    chain("compute_rot transposed (3,N) form", rot_transposed, nrmT,
          lambda n: jnp.sum(n))

    # how expensive is the layout change itself?
    @jax.jit
    def transpose_roundtrip(n):
        t = n.T  # (3, N)
        return (t + np.float32(1e-16) * jnp.sum(t)).T

    chain("(N,3) -> (3,N) -> (N,3) transpose roundtrip", transpose_roundtrip,
          nrm_d, lambda n: jnp.sum(n))

    # norm over axis -1, both layouts
    @jax.jit
    def norm_rowvec(n):
        d = jnp.linalg.norm(n, axis=-1, keepdims=True)
        return n + jnp.sum(d) * np.float32(1e-16)

    chain("norm (N,3) axis=-1", norm_rowvec, nrm_d, lambda n: jnp.sum(n))

    @jax.jit
    def norm_transposed(nT):
        d = jnp.sqrt(nT[0] ** 2 + nT[1] ** 2 + nT[2] ** 2)
        return nT + jnp.sum(d) * np.float32(1e-16)

    chain("norm (3,N) component", norm_transposed, nrmT, lambda n: jnp.sum(n))


if __name__ == "__main__":
    main()
