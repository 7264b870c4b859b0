"""Chained bisect of fuse_surfels internals (trustworthy on the tunnel)."""
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
    print(f"{label:48s} slope {slope:8.3f} ms/call", flush=True)


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import fusion
    from eggfusion_tpu.geometry import transforms as tf

    scfg = sf.SurfelConfig(capacity=cap_total, max_sh_degree=0, active_sh_degree=0)
    xyz = np.concatenate(
        [rng.uniform(-2.5, 2.5, (n_surfels, 2)), rng.uniform(1.0, 5.0, (n_surfels, 1))], -1
    ).astype(np.float32)
    nrm = rng.normal(size=(n_surfels, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    lam = np.full((n_surfels, 2), 4.0, np.float32)
    batch = sf.SpawnBatch(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        color=jnp.asarray(rng.uniform(size=(n_surfels, 3)).astype(np.float32)),
        dist=jnp.full((n_surfels, 3), 0.01),
        eta=jnp.asarray(np.concatenate([xyz * lam[:, :1], nrm * lam[:, 1:]], -1)),
        sigma2=jnp.asarray(1.0 / lam), valid=jnp.ones(n_surfels, bool),
    )
    s0 = jax.jit(sf.append_surfels)(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)

    w2c = jnp.eye(4)
    intr = jnp.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    vertex_w = jnp.asarray(rng.uniform(-2, 5, (height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)
    imap, _ = fusion.project_surfels_to_frame(s0.xyz, s0.active, w2c, intr, width, height)
    HW = width * height
    N = cap_total

    def mk(body):
        @jax.jit
        def step(s):
            return body(s)
        return step

    # v0: center pixels only
    def v0(s):
        pix, ok, z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
        return s.replace(xyz=s.xyz + jnp.sum(pix).astype(jnp.float32) * np.float32(1e-16))
    chain("v0 center_pixels", mk(v0), s0, lambda s: jnp.sum(s.xyz))

    # v1: + imap winner gather
    def v1(s):
        pix, ok, z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
        pixc = jnp.minimum(pix, HW - 1)
        winner = ok & (imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32))
        return s.replace(xyz=s.xyz + jnp.sum(winner).astype(jnp.float32) * np.float32(1e-16))
    chain("v1 + imap winner gather", mk(v1), s0, lambda s: jnp.sum(s.xyz))

    # v2: + meas gather
    def v2(s):
        pix, ok, z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
        pixc = jnp.minimum(pix, HW - 1)
        winner = ok & (imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32))
        meas = jnp.concatenate(
            [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
        ).reshape(-1, 11)[pixc]
        return s.replace(xyz=s.xyz + (jnp.sum(meas) + jnp.sum(winner)) * np.float32(1e-16))
    chain("v2 + meas gather", mk(v2), s0, lambda s: jnp.sum(s.xyz))

    # v3: + info-filter elementwise (no compute_rot, no SoA writes)
    def v3(s):
        pix, ok, z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
        pixc = jnp.minimum(pix, HW - 1)
        winner = ok & (imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32))
        meas = jnp.concatenate(
            [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
        ).reshape(-1, 11)[pixc]
        v_m, n_m, c_m, d_m = meas[:, 0:3], meas[:, 3:6], meas[:, 6:9], meas[:, 9]
        valid_meas = (meas[:, 10] > 0.5) & (d_m > 0)
        dist = jnp.linalg.norm(v_m - s.xyz, axis=-1)
        ndot = jnp.sum(n_m * s.get_normal(), axis=-1)
        associate = winner & valid_meas & (dist < 0.05) & (jnp.abs(ndot) > 0.5)
        n_m = n_m * jnp.where(ndot < 0, -1.0, 1.0)[:, None]
        lam_p = jnp.where(associate, 1.0 / jnp.maximum((d_m * scfg.alpha_p) ** 2, 1e-12), 0.0)
        lam_n = jnp.where(associate, 1.0 / jnp.maximum((d_m * scfg.alpha_n) ** 2, 1e-12), 0.0)
        lam_p_new = 1.0 / s.sigma2[:, 0] + lam_p
        lam_n_new = 1.0 / s.sigma2[:, 1] + lam_n
        eta_new = s.eta + jnp.concatenate([v_m * lam_p[:, None], n_m * lam_n[:, None]], axis=-1)
        xyz_new = eta_new[:, :3] / lam_p_new[:, None]
        normal_new = eta_new[:, 3:] / lam_n_new[:, None]
        normal_new = normal_new / (jnp.linalg.norm(normal_new, axis=-1, keepdims=True) + 1e-8)
        return s.replace(xyz=s.xyz + (jnp.sum(xyz_new) + jnp.sum(normal_new)) * np.float32(1e-16))
    chain("v3 + info-filter elementwise", mk(v3), s0, lambda s: jnp.sum(s.xyz))

    # v4: + compute_rot
    def v4(s):
        pix, ok, z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
        pixc = jnp.minimum(pix, HW - 1)
        winner = ok & (imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32))
        meas = jnp.concatenate(
            [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
        ).reshape(-1, 11)[pixc]
        v_m, n_m, d_m = meas[:, 0:3], meas[:, 3:6], meas[:, 9]
        lam_p = 1.0 / jnp.maximum((d_m * scfg.alpha_p) ** 2, 1e-12)
        eta_new = s.eta + jnp.concatenate([v_m * lam_p[:, None], n_m], axis=-1)
        normal_new = eta_new[:, 3:] / (jnp.linalg.norm(eta_new[:, 3:], axis=-1, keepdims=True) + 1e-8)
        z_axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (N, 3))
        rot_new = tf.compute_rot(z_axis, normal_new)
        return s.replace(xyz=s.xyz + (jnp.sum(rot_new) + jnp.sum(winner)) * np.float32(1e-16))
    chain("v4 + compute_rot", mk(v4), s0, lambda s: jnp.sum(s.xyz))

    # v5: full fuse
    def v5(s):
        s2, _ = fusion.fuse_surfels(
            s, imap, w2c, intr, vertex_w, normal_w, color, depth, geo_mask,
            depth, 0.05, scfg, jnp.int32(1))
        return s2
    chain("v5 full fuse_surfels", mk(v5), s0, lambda s: jnp.sum(s.xyz))


if __name__ == "__main__":
    main()
