"""Probabilistic surfel fusion — TPU-native equivalent of the reference's
`project_surfels_to_frame` + `preprocess_surfels` CUDA kernels
(submodule `diff-gaussian-surfels`; Python call sites fully specify the
interface at `/root/reference/src/core/mapper.py:266-308`).

Semantics (information-form filter, matching the reference's state layout):
each surfel carries an information vector eta = [x * lam_p, n * lam_n] and
variances sigma2 = [1/lam_p, 1/lam_n] (init at `mapper.py:480-490`:
eta = x0 / sigma2, sigma2 = (alpha * depth)^2). A frame measurement at pixel
p with depth d contributes precision lam_meas = 1/(alpha*d)^2:

    lam  <- lam + lam_meas
    eta  <- eta + x_meas * lam_meas
    x    <- eta / lam          (fused position / normal)

The association is 1:1 by construction: a surfel lands on exactly one pixel
(its projected center) and a pixel keeps one surfel (nearest wins in the
z-buffered index map). So the fusion update is a pure per-surfel GATHER —
each surfel reads the measurement at its own pixel and checks it won the
index map — instead of the scatter-add/segment-sum the CUDA kernel uses
(atomics are cheap on GPU; on TPU a scatter-add serializes).

`project_surfels_to_frame` builds the per-pixel nearest-surfel index map via
scatter-min z-buffering (XLA `.at[].min`), the one (cheap, int) scatter left.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eggfusion_tpu.core.surfels import SurfelConfig, SurfelMap
from eggfusion_tpu.geometry import sh as shlib
from eggfusion_tpu.geometry import transforms as tf


def _center_pixels(xyz, active, w2c, intr, width: int, height: int):
    """Each surfel's rounded center pixel (flat index), validity, and z."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    p_cam = xyz @ R.T + t
    z = p_cam[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = jnp.round(fx * p_cam[:, 0] / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * p_cam[:, 1] / z_safe + cy).astype(jnp.int32)
    ok = active & (z > 0.05) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    pix = jnp.where(ok, v * width + u, width * height)  # dump slot
    return pix, ok, z


@functools.partial(jax.jit, static_argnames=("width", "height"))
def project_surfels_to_frame(xyz: jnp.ndarray, active: jnp.ndarray, w2c: jnp.ndarray,
                             intr: jnp.ndarray, width: int, height: int):
    """Per-pixel nearest-surfel index map + depth buffer.

    Interface mirror of `project_surfels_to_frame` (`mapper.py:266-276`).
    Returns (imap (H, W) int32, -1 where empty; depth_buff (H, W) f32, 0 where
    empty). Each surfel lands on its center pixel; the nearest (min z) wins.
    """
    pix, ok, z = _center_pixels(xyz, active, w2c, intr, width, height)
    HW = width * height
    zbuf = jnp.full((HW + 1,), jnp.inf, jnp.float32).at[pix].min(jnp.where(ok, z, jnp.inf))
    # winner: among surfels whose z equals the buffer min at their pixel,
    # take the max index (deterministic tie-break)
    iswin = ok & (z <= zbuf[pix])
    n = xyz.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    imap = jnp.full((HW + 1,), -1, jnp.int32).at[pix].max(jnp.where(iswin, idx, -1))
    depth = jnp.where(jnp.isfinite(zbuf[:HW]), zbuf[:HW], 0.0)
    return imap[:HW].reshape(height, width), depth.reshape(height, width)


class FusionStats(NamedTuple):
    fused_pixels: jnp.ndarray  # () i32 number of pixels fused into surfels
    error_pixels: jnp.ndarray  # () i32 association failures counted as errors


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_surfels(
    s: SurfelMap,
    imap: jnp.ndarray,  # (H, W) i32 from project_surfels_to_frame
    w2c: jnp.ndarray,  # (4, 4) same camera the imap was built with
    intr: jnp.ndarray,  # (4,)
    vertex_w: jnp.ndarray,  # (H, W, 3) measured vertices, world frame
    normal_w: jnp.ndarray,  # (H, W, 3) measured normals, world frame
    color: jnp.ndarray,  # (H, W, 3)
    depth: jnp.ndarray,  # (H, W, 1) metric depth
    geo_mask: jnp.ndarray,  # (H, W, 1) bool valid-geometry mask
    model_depth: jnp.ndarray,  # (H, W, 1) rendered model depth (surface test)
    fusion_dist_thres: float,
    cfg: SurfelConfig,
    time: jnp.ndarray,
):
    """In-place probabilistic fusion (reference `preprocess_surfels` call,
    `mapper.py:278-308`): information-filter update of position/normal,
    observe/error counting, inview/surface mask refresh.

    Association gates: the surfel won its pixel in the index map, valid
    measurement (geo_mask & depth > 0), |measured vertex - surfel position| <
    fusion_dist_thres, and normal agreement (dot > cos 60 deg). Disagreeing
    but visible surfels increment error_count.
    """
    H, W = imap.shape
    HW = H * W
    N = s.capacity

    pix, ok, _z = _center_pixels(s.xyz, s.active, w2c, intr, W, H)
    pixc = jnp.minimum(pix, HW - 1)
    winner = ok & (imap.reshape(-1)[pixc] == jnp.arange(N, dtype=jnp.int32))

    # ONE packed gather for all per-pixel measurements: gather cost on TPU is
    # dominated by the random index stream, not the row width, so 5 separate
    # N-row gathers (~4-5 ms each at 600k on v5e) collapse into one.
    meas = jnp.concatenate(
        [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
    ).reshape(-1, 11)[pixc]
    v_m = meas[:, 0:3]
    n_m = meas[:, 3:6]
    c_m = meas[:, 6:9]
    d_m = meas[:, 9]
    valid_meas = (meas[:, 10] > 0.5) & (d_m > 0)

    dist = jnp.linalg.norm(v_m - s.xyz, axis=-1)
    ndot = jnp.sum(n_m * s.get_normal(), axis=-1)
    associate = winner & valid_meas & (dist < fusion_dist_thres) & (jnp.abs(ndot) > 0.5)
    errors = winner & valid_meas & ~associate

    # flip measured normal to the surfel's hemisphere before fusing
    n_m = n_m * jnp.where(ndot < 0, -1.0, 1.0)[:, None]

    lam_p = jnp.where(associate, 1.0 / jnp.maximum((d_m * cfg.alpha_p) ** 2, 1e-12), 0.0)
    lam_n = jnp.where(associate, 1.0 / jnp.maximum((d_m * cfg.alpha_n) ** 2, 1e-12), 0.0)

    lam_p_old = 1.0 / s.sigma2[:, 0]
    lam_n_old = 1.0 / s.sigma2[:, 1]
    lam_p_new = lam_p_old + lam_p
    lam_n_new = lam_n_old + lam_n

    eta_new = s.eta + jnp.concatenate([v_m * lam_p[:, None], n_m * lam_n[:, None]], axis=-1)
    xyz_new = eta_new[:, :3] / lam_p_new[:, None]
    normal_new = eta_new[:, 3:] / lam_n_new[:, None]
    normal_new = normal_new / (jnp.linalg.norm(normal_new, axis=-1, keepdims=True) + 1e-8)

    touched = associate
    # only fuse geometry of touched, UNSTABLE surfels: stable surfels are
    # geometry-locked (matches the reference's stable/unstable split intent,
    # `mapper.py:326-334`) so the optimizer-refined map is not overwritten.
    fuse_geo = touched & ~s.stable & s.active

    z_axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (N, 3))
    rot_new = tf.compute_rot(z_axis, normal_new)

    old_color = s.get_color()
    col_new = (old_color * lam_p_old[:, None] + c_m * lam_p[:, None]) / lam_p_new[:, None]
    dc_new = shlib.rgb_to_sh(col_new)[:, None, :]

    s = s.replace(
        xyz=jnp.where(fuse_geo[:, None], xyz_new, s.xyz),
        rotation=jnp.where(fuse_geo[:, None], rot_new, s.rotation),
        features_dc=jnp.where(fuse_geo[:, None, None], dc_new, s.features_dc),
        eta=jnp.where(touched[:, None], eta_new, s.eta),
        sigma2=jnp.where(
            touched[:, None],
            jnp.stack([1.0 / lam_p_new, 1.0 / lam_n_new], axis=-1),
            s.sigma2,
        ),
        observe_count=s.observe_count + touched.astype(jnp.int32),
        error_count=s.error_count + errors.astype(jnp.int32),
        inview=touched | s.inview,
        surface=jnp.where(touched, True, s.surface),
    )
    stats = FusionStats(
        fused_pixels=jnp.sum(associate.astype(jnp.int32)),
        error_pixels=jnp.sum(errors.astype(jnp.int32)),
    )
    return s, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def prune_unstable(s: SurfelMap, cfg: SurfelConfig, time: jnp.ndarray, max_age: int = 30):
    """Free-space violation culling: surfels observed mostly in error and old
    unstable surfels that never gained confidence are removed.

    The reference defines `cull_dist_thres` and error counting but never wires
    a visible cull call (`merge_surfels` dead code, `mapper.py:508-563`); this
    is the working equivalent keeping map size bounded.
    """
    from eggfusion_tpu.core.surfels import prune_surfels

    age = time - s.tic
    bad_errors = (s.error_count > 5) & (s.error_count > 3 * s.observe_count)
    stale = (age > max_age) & (~s.stable) & (s.observe_count < 2)
    return prune_surfels(s, s.active & (bad_errors | stale))
