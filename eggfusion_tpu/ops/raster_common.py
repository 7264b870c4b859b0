"""Shared surfel-projection math for the renderers.

The reference renders through the `diff-gaussian-surfels` CUDA rasterizer
(submodule, interface at `/root/reference/src/core/render.py:53-104`): for a
camera it returns (color, normal, depth, opacity) images with gradients.
This module computes the per-surfel screen-space quantities (projected mean,
2D covariance via EWA splatting of the surfel's tangent disk, view-dependent
SH color, camera-frame normal) consumed by both the XLA golden renderer
(`raster_xla`) and the Pallas tile renderer (`raster_pallas`).

Per-pixel depth is the ray/surfel-plane intersection — the geometry-aware
depth that distinguishes surfel splatting from point splatting.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from eggfusion_tpu.geometry import sh as shlib
from eggfusion_tpu.geometry import transforms as tf

# low-pass dilation of the projected footprint, as in 3DGS (pixels^2)
LOWPASS = 0.3
NEAR_Z = 0.05
ALPHA_EPS = 1.0 / 255.0
MAX_ALPHA = 0.99


class ProjectedSurfels(NamedTuple):
    """TRANSPOSED (k, N) per-surfel screen-space quantities.

    Keeping the surfel axis on TPU lanes end-to-end matters: an earlier
    revision emitted ROW (N, k) fields, and the ~6 (k, N)->(N, k) relayouts
    made the projection alone cost 8.2 ms at 600k capacity on v5e — the
    rasterizers now do ONE transpose of the final packed attribute block."""

    mean2d: jnp.ndarray  # (2, N) pixel coords (u; v)
    depth: jnp.ndarray  # (N,) view-space z of the center
    conic: jnp.ndarray  # (3, N) inverse 2D covariance (a, b, c): [[a, b], [b, c]]
    radius: jnp.ndarray  # (N,) screen-space 3-sigma radius in pixels
    color: jnp.ndarray  # (3, N) view-dependent RGB
    normal_cam: jnp.ndarray  # (3, N) camera-frame unit normal
    p_cam: jnp.ndarray  # (3, N) camera-frame center
    opacity: jnp.ndarray  # (N,) activated opacity (0 for culled/inactive)
    valid: jnp.ndarray  # (N,) bool


def project_surfels(params: dict, w2c: jnp.ndarray, intr: jnp.ndarray, width: int, height: int,
                    sh_degree: int = 3, need_color: bool = True) -> ProjectedSurfels:
    """Project surfels into a pinhole camera.

    params: TRANSPOSED (k, N) dict from `core.surfels.render_params`. All
    per-surfel math is componentwise on (N,) rows (full TPU lane width);
    rigid transforms are (3, 3) @ (3, N) MXU matmuls. Outputs stay
    TRANSPOSED (k, N) — see `ProjectedSurfels`.
    """
    xyz = params["xyz"]  # (3, N)
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    p_cam = R @ xyz + t[:, None]  # (3, N)
    px, py, z = p_cam[0], p_cam[1], p_cam[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * px / z_safe + cx
    v = fy * py / z_safe + cy
    mean2d = jnp.stack([u, v], axis=0)  # (2, N)

    # tangent disk axes in camera frame: columns 0/1 of R(q), scaled
    Rs = tf.build_rotation_t(params["rotations"])  # (3, 3, N)
    s = params["scales"]  # (3, N)
    tu = R @ (Rs[:, 0] * s[0])  # (3, N)
    tv = R @ (Rs[:, 1] * s[1])

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # EWA: project each tangent axis with the local perspective Jacobian
    def proj_axis(a):
        jx = fx * (a[0] * inv_z - px * a[2] * inv_z2)
        jy = fy * (a[1] * inv_z - py * a[2] * inv_z2)
        return jx, jy

    ax, ay = proj_axis(tu)
    bx, by = proj_axis(tv)
    # 2D covariance = a2 a2^T + b2 b2^T + lowpass*I
    cxx = ax * ax + bx * bx + LOWPASS
    cxy = ax * ay + bx * by
    cyy = ay * ay + by * by + LOWPASS
    det = cxx * cyy - cxy * cxy
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack([cyy / det, -cxy / det, cxx / det], axis=0)  # (3, N)

    # 3-sigma screen radius from the largest eigenvalue
    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = 3.0 * jnp.sqrt(lam)

    if need_color:
        # view-dependent color
        cam_center = -(R.T @ t)
        dirs = xyz - cam_center[:, None]
        # safe normalization: sqrt(sum + eps) keeps the gradient finite for
        # degenerate (inactive, zero-positioned) surfels
        dirs = dirs / jnp.sqrt(dirs[0] ** 2 + dirs[1] ** 2 + dirs[2] ** 2 + 1e-12)
        color = shlib.eval_sh_t(sh_degree, params["shs"], dirs)  # (3, N)
        color = jnp.maximum(color + 0.5, 0.0)  # 3DGS convention: SH + 0.5, clipped
    else:  # geometry-only render: skip the SH evaluation entirely
        color = jnp.zeros_like(xyz)

    normal_cam = R @ params["normal"]  # (3, N)
    # orient normals toward the camera (surfels are two-sided disks)
    flip = jnp.sign(-jnp.sum(normal_cam * p_cam, axis=0))
    flip = jnp.where(flip == 0, 1.0, flip)
    normal_cam = normal_cam * flip

    inb = (
        (z > NEAR_Z)
        & (u + radius > 0)
        & (u - radius < width)
        & (v + radius > 0)
        & (v - radius < height)
    )
    valid = inb & params["active"]
    opacity = jnp.where(valid, params["opacity"][0], 0.0)

    return ProjectedSurfels(
        mean2d=mean2d,
        depth=z,
        conic=conic,
        radius=jnp.where(valid, radius, 0.0),
        color=color,
        normal_cam=normal_cam,
        p_cam=p_cam,
        opacity=opacity,
        valid=valid,
    )
