"""Bisect the TRANSPOSED fuse_surfels: gathers vs componentwise vs blends."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=10, vary=None, **kw):
    args = list(args)
    out = jax.block_until_ready(fn(*args, **kw))
    varied = None
    if vary is not None:
        varied = [jax.block_until_ready(args[vary] + np.float32(1e-7 * (i + 1)))
                  for i in range(n)]
    t0 = time.perf_counter()
    outs = []
    for i in range(n):
        if varied is not None:
            args[vary] = varied[i]
        outs.append(fn(*args, **kw))
    jax.block_until_ready(outs)
    print(f"{label:48s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return out


def main():
    width, height = 1280, 704
    n_surfels, cap_total = 400_000, 600_000
    rng = np.random.default_rng(0)

    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops import fusion

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
    s = jax.jit(sf.append_surfels, static_argnums=(3,))(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)
    s = jax.block_until_ready(s)

    w2c = jnp.eye(4)
    intr = jnp.array([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5], jnp.float32)
    vertex_w = jnp.asarray(rng.uniform(-2, 5, (height, width, 3)).astype(np.float32))
    normal_w = vertex_w / jnp.linalg.norm(vertex_w, axis=-1, keepdims=True)
    color = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (height, width, 1)).astype(np.float32))
    geo_mask = jnp.ones((height, width, 1), bool)
    imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, w2c, intr, width, height)
    imap = jax.block_until_ready(imap)
    N, HW = cap_total, width * height

    timeit("fuse_surfels (full)", lambda d: fusion.fuse_surfels(
        s, imap, w2c, intr, vertex_w, normal_w, color, d, geo_mask, d,
        0.05, scfg, jnp.int32(1)), depth, vary=0)

    # pieces ---------------------------------------------------------------
    u, v, ok, _z = fusion._center_pixels(s.xyz, s.active, w2c, intr, width, height)
    uc = jax.block_until_ready(jnp.clip(u, 0, width - 1))
    vc = jax.block_until_ready(jnp.clip(v, 0, height - 1))

    @jax.jit
    def centers(xyz):
        return fusion._center_pixels(xyz, s.active, w2c, intr, width, height)
    timeit("  _center_pixels", lambda d: centers(s.xyz + d[0, 0, 0] * 0), depth, vary=0)

    @jax.jit
    def winner_gather(imap, vc, uc):
        return imap[vc, uc] == jnp.arange(N, dtype=jnp.int32)
    timeit("  imap 2d winner gather", lambda d: winner_gather(
        imap + (d[0, 0, 0] * 0).astype(jnp.int32), vc, uc), depth, vary=0)

    @jax.jit
    def meas_gather(vertex_w, vc, uc):
        meas = jnp.concatenate(
            [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
        )[vc, uc]
        return meas.T
    timeit("  meas pack+2d gather+T", meas_gather, vertex_w, vc, uc, vary=0)

    big = jax.block_until_ready(jnp.concatenate(
        [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1))

    @jax.jit
    def meas_gather_pre(big, vc, uc):
        return big[vc, uc].T
    timeit("  meas 2d gather alone (pre-packed)", meas_gather_pre, big, vc, uc, vary=0)

    mT = jax.block_until_ready(meas_gather_pre(big, vc, uc))
    winner = jax.block_until_ready(winner_gather(imap, vc, uc))

    @jax.jit
    def tail(s, mT, winner):
        """Everything after the gathers: componentwise filter + blends."""
        v_m, n_m, c_m = mT[0:3], mT[3:6], mT[6:9]
        d_m = mT[9]
        valid_meas = (mT[10] > 0.5) & (d_m > 0)
        dvec = v_m - s.xyz
        dist2 = dvec[0] ** 2 + dvec[1] ** 2 + dvec[2] ** 2
        n_s = s.get_normal()
        ndot = n_m[0] * n_s[0] + n_m[1] * n_s[1] + n_m[2] * n_s[2]
        associate = winner & valid_meas & (dist2 < 0.0025) & (jnp.abs(ndot) > 0.5)
        errors = winner & valid_meas & ~associate
        n_m2 = n_m * jnp.where(ndot < 0, -1.0, 1.0)
        lam_p = jnp.where(associate, 1.0 / jnp.maximum((d_m * 1.0) ** 2, 1e-12), 0.0)
        lam_n = jnp.where(associate, 1.0 / jnp.maximum((d_m * 0.5) ** 2, 1e-12), 0.0)
        lam_p_old = 1.0 / s.sigma2[0]
        lam_n_old = 1.0 / s.sigma2[1]
        lam_p_new = lam_p_old + lam_p
        lam_n_new = lam_n_old + lam_n
        eta_new = s.eta + jnp.concatenate([v_m * lam_p, n_m2 * lam_n], axis=0)
        xyz_new = eta_new[0:3] / lam_p_new
        normal_new = eta_new[3:6] / lam_n_new
        normal_new = normal_new / (jnp.sqrt(normal_new[0] ** 2 + normal_new[1] ** 2 + normal_new[2] ** 2) + 1e-8)
        from eggfusion_tpu.geometry import transforms as tf
        from eggfusion_tpu.geometry import sh as shlib
        fuse_geo = associate & ~s.stable & s.active
        rot_new = tf.rot_z_to_t(normal_new)
        old_color = s.get_color()
        col_new = (old_color * lam_p_old + c_m * lam_p) / lam_p_new
        dc_new = shlib.rgb_to_sh(col_new)[:, None, :]
        fg = fuse_geo[None]
        tc = associate[None]
        return s.replace(
            xyz=jnp.where(fg, xyz_new, s.xyz),
            rotation=jnp.where(fg, rot_new, s.rotation),
            features_dc=jnp.where(fuse_geo[None, None], dc_new, s.features_dc),
            eta=jnp.where(tc, eta_new, s.eta),
            sigma2=jnp.where(tc, jnp.stack([1.0 / lam_p_new, 1.0 / lam_n_new], axis=0), s.sigma2),
            observe_count=s.observe_count + associate.astype(jnp.int32),
            error_count=s.error_count + errors.astype(jnp.int32),
            inview=associate | s.inview,
            surface=jnp.where(associate, True, s.surface),
        )

    timeit("  tail (componentwise + blends)", lambda d: tail(
        s.replace(xyz=s.xyz + d[0, 0, 0] * 0), mT, winner), depth, vary=0)


if __name__ == "__main__":
    main()
