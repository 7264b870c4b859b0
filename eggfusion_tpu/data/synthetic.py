"""Analytic synthetic RGB-D scenes with ground-truth trajectories.

The reference has no automated tests and leans on downloaded benchmarks
(SURVEY.md §4). This module provides the test fixture the reference lacks:
a convex "room corner" of three textured planes whose depth and color can be
rendered analytically from ANY camera pose — so tracking, fusion, mapping and
the full pipeline can be validated end-to-end (known GT trajectory, exact
depth) without any dataset download.

Conventions match the framework: w2c 4x4 poses, pinhole intrinsics,
metric depth.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.geometry.camera import CameraIntrinsics

# Convex room: viewer inside the intersection of half-spaces n.p <= d.
# (normal, offset): plane is { p : n . p = d }.
#
# The visible geometry is a "cube corner" of three tilted planes whose normals
# span R^3 while all facing the camera at benign (< ~55 deg) incidence —
# grazing surfaces make nearest-neighbor point-to-plane association
# ill-conditioned (as on real sensors) and two-plane views leave a null
# translation direction; three independent facing planes constrain all 6 DoF.
def _plane(n, d):
    n = np.asarray(n, dtype=np.float32)
    n = n / np.linalg.norm(n)
    return [n[0], n[1], n[2], d]


_PLANES = np.array(
    [
        _plane([1.0, 1.0, 1.2], 2.4),  # corner face (+x, +y)
        _plane([-1.0, 1.0, 1.2], 2.4),  # corner face (-x, +y)
        _plane([0.0, -1.0, 0.9], 2.0),  # corner face (-y)
        [0.0, 0.0, 1.0, 4.5],  # back wall   z = 4.5 (fallback)
        [-1.0, 0.0, 0.0, 3.0],  # left wall  x = -3.0
        [1.0, 0.0, 0.0, 3.0],  # right wall  x = 3.0
        [0.0, 1.0, 0.0, 2.2],  # floor       y = 2.2
        [0.0, -1.0, 0.0, 2.2],  # ceiling    y = -2.2
    ],
    dtype=np.float32,
)


def _texture(p: jnp.ndarray, detail: float = 0.0) -> jnp.ndarray:
    """Smooth 3-channel procedural texture of world position (..., 3) -> (..., 3).

    `detail` > 0 adds a high-frequency speckle layer (product of incommensurate
    sinusoids, sharpened by tanh) that gives corner detectors something to bite
    on — the smooth base texture has no FAST corners at test resolutions. Off by
    default so established fixtures/benchmarks are unchanged.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = 0.5 + 0.35 * jnp.sin(2.1 * x + 0.7) * jnp.cos(1.7 * y)
    g = 0.5 + 0.35 * jnp.sin(1.3 * y + 2.9 * z)
    b = 0.5 + 0.35 * jnp.cos(2.3 * z + 1.1 * x + 0.4)
    tex = jnp.stack([r, g, b], axis=-1)
    if detail > 0.0:
        s = (
            jnp.tanh(4.0 * jnp.sin(37.0 * x) * jnp.sin(29.0 * y + 1.3) * jnp.sin(41.0 * z + 0.7))
            + 0.5 * jnp.tanh(4.0 * jnp.sin(61.0 * x + 2.1) * jnp.sin(53.0 * z))
        )
        tex = tex + detail * s[..., None]
    return jnp.clip(tex, 0.0, 1.0)


def render_corner_scene(
    intr: CameraIntrinsics, w2c, detail: float = 0.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytically ray-cast the corner scene from pose `w2c`.

    Returns (color (H, W, 3) in [0, 1], depth (H, W, 1) metric).
    For a convex region the first surface hit is the minimum positive
    plane-intersection depth. `detail` adds high-frequency texture (see
    `_texture`).
    """
    w2c = jnp.asarray(w2c, jnp.float32)
    H, W = intr.height, intr.width
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    rays = jnp.stack([(xs - intr.cx) / intr.fx, (ys - intr.cy) / intr.fy, jnp.ones_like(xs)], axis=-1)

    R = w2c[:3, :3]
    t = w2c[:3, 3]
    cam_center = -R.T @ t  # camera origin in world
    rays_w = rays @ R  # R^T applied to each ray

    n = jnp.asarray(_PLANES[:, :3])  # (P, 3)
    d = jnp.asarray(_PLANES[:, 3])  # (P,)
    denom = jnp.einsum("hwc,pc->hwp", rays_w, n)
    numer = d[None, None, :] - jnp.einsum("c,pc->p", cam_center, n)[None, None, :]
    z = numer / jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    z = jnp.where(z > 0.05, z, jnp.inf)
    depth = jnp.min(z, axis=-1)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)

    p_w = cam_center[None, None, :] + depth[..., None] * rays_w
    color = _texture(p_w, detail)
    color = jnp.where(depth[..., None] > 0, color, 0.0)
    return color, depth[..., None]


class SyntheticSequence(NamedTuple):
    """A ground-truth trajectory through the corner scene."""

    intr: CameraIntrinsics
    poses_w2c: np.ndarray  # (N, 4, 4)
    timestamps: np.ndarray  # (N,)


def make_trajectory(n_frames: int = 30, translation_scale: float = 0.015, rotation_scale: float = 0.004) -> np.ndarray:
    """Smooth sway trajectory: (N, 4, 4) w2c poses, frame 0 = identity.

    Motion magnitudes mimic a 30 fps handheld camera (cm-scale / sub-degree
    per frame), matching the regime the reference's GN tracker expects, and
    are INDEPENDENT of sequence length: the sway phase advances at a fixed
    per-frame rate (120-frame period) and the amplitude envelope saturates
    (tanh) at ~20x the per-frame scale. The earlier parameterization (one
    sway cycle over the whole sequence, linearly growing amplitude) made the
    per-frame delta scale with sequence length — past ~4 cm / frame no
    frame-to-model dense tracker (reference included) survives without an
    external pose seed, so 60-frame runs diverged near the tail by
    construction rather than by regression.
    """
    poses = []
    i_sat = 20.0
    om = 2 * math.pi / 120.0  # sway angular rate per frame (120-frame period)
    for i in range(n_frames):
        ei = i_sat * math.tanh(i / i_sat)  # saturating sway envelope
        tx = translation_scale * ei * math.sin(0.5 + om * i)
        ty = 0.5 * translation_scale * ei * math.sin(2 * om * i)
        tz = -0.8 * translation_scale * ei
        wy = rotation_scale * ei * math.sin(om * i + 0.3)
        wx = 0.5 * rotation_scale * ei * math.cos(om * i)
        cy_, sy_ = math.cos(wy), math.sin(wy)
        cx_, sx_ = math.cos(wx), math.sin(wx)
        Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = (Ry @ Rx).astype(np.float32)
        T[:3, 3] = [tx, ty, tz]
        poses.append(T)
    return np.stack(poses)


def make_sequence(n_frames: int = 30, width: int = 160, height: int = 120) -> SyntheticSequence:
    intr = CameraIntrinsics(
        fx=0.9 * width, fy=0.9 * width, cx=width / 2 - 0.5, cy=height / 2 - 0.5, width=width, height=height
    )
    return SyntheticSequence(
        intr=intr,
        poses_w2c=make_trajectory(n_frames),
        timestamps=np.arange(n_frames) * 0.05,
    )


render_corner_scene_jit = jax.jit(render_corner_scene, static_argnames=("intr", "detail"))
