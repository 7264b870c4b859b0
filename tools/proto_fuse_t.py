"""Prototype: transposed-layout fuse_surfels. Confirms the lane-utilization
win before refactoring the SoA."""
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
    N = 600_000
    H, W = height, width
    rng = np.random.default_rng(0)
    alpha_p, alpha_n = 1.0, 0.5

    # transposed state
    xyz = rng.uniform(-2.5, 2.5, (3, N)).astype(np.float32)
    xyz[2] = rng.uniform(1.0, 5.0, N)
    nrm = rng.normal(size=(3, N)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
    state = {
        "xyz": jnp.asarray(xyz),
        "normal": jnp.asarray(nrm),
        "eta": jnp.asarray(np.concatenate([xyz * 4.0, nrm * 4.0], 0)),  # (6, N)
        "sigma2": jnp.full((2, N), 0.25, jnp.float32),
        "dc": jnp.asarray(rng.uniform(size=(3, N)).astype(np.float32)),
        "rotation": jnp.zeros((4, N), jnp.float32).at[0].set(1.0),
        "observe": jnp.zeros((N,), jnp.int32),
        "error": jnp.zeros((N,), jnp.int32),
        "inview": jnp.zeros((N,), bool),
        "surface": jnp.zeros((N,), bool),
        "stable": jnp.zeros((N,), bool),
        "active": jnp.ones((N,), bool),
    }

    # frame measurement pack, channel-LAST for the 2d row gather
    meas_img = jnp.asarray(rng.uniform(size=(H, W, 11)).astype(np.float32))
    imap = jnp.asarray(rng.integers(-1, N, (H, W)).astype(np.int32))
    w2c = jnp.eye(4)
    fx, fy, cx, cy = 600.0, 600.0, W / 2 - 0.5, H / 2 - 0.5

    @jax.jit
    def fuse_t(st):
        X = st["xyz"]  # (3, N)
        R = w2c[:3, :3]
        t = w2c[:3, 3]
        # p_cam = R @ X + t : (3,3)@(3,N) — MXU-friendly, N on lanes
        pc = R @ X + t[:, None]
        z = pc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = jnp.round(fx * pc[0] / z_safe + cx).astype(jnp.int32)
        v = jnp.round(fy * pc[1] / z_safe + cy).astype(jnp.int32)
        ok = st["active"] & (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)

        winner = ok & (imap[vc, uc] == jnp.arange(N, dtype=jnp.int32))
        meas = meas_img[vc, uc]  # (N, 11) 2d row gather
        mT = meas.T  # (11, N) cheap transpose
        vm = mT[0:3]
        nm = mT[3:6]
        cm = mT[6:9]
        dm = mT[9]
        valid = (mT[10] > 0.5) & (dm > 0)

        dvec = vm - X
        dist2 = dvec[0] ** 2 + dvec[1] ** 2 + dvec[2] ** 2
        nrm_s = st["normal"]
        ndot = nm[0] * nrm_s[0] + nm[1] * nrm_s[1] + nm[2] * nrm_s[2]
        associate = winner & valid & (dist2 < 0.05 ** 2) & (jnp.abs(ndot) > 0.5)
        errors = winner & valid & ~associate
        flip = jnp.where(ndot < 0, -1.0, 1.0)
        nm = nm * flip

        lam_p = jnp.where(associate, 1.0 / jnp.maximum((dm * alpha_p) ** 2, 1e-12), 0.0)
        lam_n = jnp.where(associate, 1.0 / jnp.maximum((dm * alpha_n) ** 2, 1e-12), 0.0)
        lam_p_old = 1.0 / st["sigma2"][0]
        lam_n_old = 1.0 / st["sigma2"][1]
        lam_p_new = lam_p_old + lam_p
        lam_n_new = lam_n_old + lam_n

        eta_new = st["eta"] + jnp.concatenate([vm * lam_p[None], nm * lam_n[None]], axis=0)
        xyz_new = eta_new[0:3] / lam_p_new[None]
        n_new = eta_new[3:6] / lam_n_new[None]
        n_new = n_new / (jnp.sqrt(n_new[0] ** 2 + n_new[1] ** 2 + n_new[2] ** 2)[None] + 1e-8)

        touched = associate
        fuse_geo = touched & ~st["stable"] & st["active"]

        # compute_rot(z_axis -> n_new), componentwise
        ax, ay = -n_new[1], n_new[0]
        al = jnp.sqrt(ax * ax + ay * ay) + 1e-8
        ax, ay = ax / al, ay / al
        dot = jnp.clip(n_new[2], -1.0 + 1e-7, 1.0 - 1e-7)
        half = jnp.arccos(dot) * 0.5
        qw = jnp.cos(half)
        qs = jnp.sin(half)
        rot_new = jnp.stack([qw, ax * qs, ay * qs, jnp.zeros_like(qw)], axis=0)

        col_new = (st["dc"] * lam_p_old[None] + cm * lam_p[None]) / lam_p_new[None]

        fg = fuse_geo[None]
        tc = touched[None]
        st2 = dict(st)
        st2["xyz"] = jnp.where(fg, xyz_new, X)
        st2["normal"] = jnp.where(fg, n_new, nrm_s)
        st2["rotation"] = jnp.where(fg, rot_new, st["rotation"])
        st2["dc"] = jnp.where(fg, col_new, st["dc"])
        st2["eta"] = jnp.where(tc, eta_new, st["eta"])
        st2["sigma2"] = jnp.where(tc, jnp.stack([1.0 / lam_p_new, 1.0 / lam_n_new]), st["sigma2"])
        st2["observe"] = st["observe"] + touched.astype(jnp.int32)
        st2["error"] = st["error"] + errors.astype(jnp.int32)
        st2["inview"] = touched | st["inview"]
        st2["surface"] = touched | st["surface"]
        return st2

    chain("fuse transposed (incl. projection)", fuse_t, state,
          lambda st: jnp.sum(st["xyz"]))

    # also: transposed projection alone (replaces _center_pixels + project)
    @jax.jit
    def proj_t(st):
        X = st["xyz"]
        pc = w2c[:3, :3] @ X + w2c[:3, 3][:, None]
        z = pc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = jnp.round(fx * pc[0] / z_safe + cx).astype(jnp.int32)
        v = jnp.round(fy * pc[1] / z_safe + cy).astype(jnp.int32)
        ok = st["active"] & (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        pix = jnp.where(ok, v * W + u, H * W)
        HWp = H * W
        zbuf = jnp.full((HWp + 1,), jnp.inf, jnp.float32).at[pix].min(jnp.where(ok, z, jnp.inf))
        iswin = ok & (z <= zbuf[jnp.minimum(pix, HWp)])
        idx = jnp.arange(N, dtype=jnp.int32)
        im = jnp.full((HWp + 1,), -1, jnp.int32).at[pix].max(jnp.where(iswin, idx, -1))
        return dict(st, xyz=st["xyz"] + jnp.sum(im[:4]).astype(jnp.float32) * np.float32(1e-16))

    chain("project_to_frame transposed", proj_t, state, lambda st: jnp.sum(st["xyz"]))


if __name__ == "__main__":
    main()
