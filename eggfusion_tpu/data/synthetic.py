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

# Large room (the surfel-accumulation envelope scene, VERDICT r3 #6): an
# 8 x 4.4 x 8 m box with two beveled corners for full 6-DoF constraint at
# every viewing direction. An orbiting camera near the walls keeps seeing
# FRESH close-range wall area all the way around, so the map grows
# continuously instead of re-observing one corner (the `room` scene +
# `orbit` trajectory accumulate >=500k surfels at production resolution).
_PLANES_ROOM = np.array(
    [
        [-1.0, 0.0, 0.0, 4.0],  # x = -4
        [1.0, 0.0, 0.0, 4.0],  # x = +4
        [0.0, 1.0, 0.0, 2.2],  # floor  y = 2.2
        [0.0, -1.0, 0.0, 2.2],  # ceiling y = -2.2
        [0.0, 0.0, 1.0, 4.0],  # z = +4
        [0.0, 0.0, -1.0, 4.0],  # z = -4
        _plane([1.0, 0.0, 1.0], 5.2),  # bevel (+x, +z)
        _plane([-1.0, 0.0, -1.0], 5.2),  # bevel (-x, -z)
    ],
    dtype=np.float32,
)

SCENES = {"corner": _PLANES, "room": _PLANES_ROOM}


def _texture(p: jnp.ndarray, detail: float = 0.0, flat_x: float = 0.0) -> jnp.ndarray:
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
    if flat_x > 0.0:
        # textureless segment (VERDICT r3 #3c): everything left of
        # x = -flat_x renders a CONSTANT color — the photometric term gets
        # zero gradient there and tracking must hold on geometry (ICP) alone
        tex = jnp.where((p[..., 0] < -flat_x)[..., None], 0.55, tex)
    return jnp.clip(tex, 0.0, 1.0)


def render_corner_scene(
    intr: CameraIntrinsics, w2c, detail: float = 0.0, flat_x: float = 0.0,
    scene: str = "corner"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytically ray-cast a convex scene (see `SCENES`) from pose `w2c`.

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

    planes = SCENES[scene]
    n = jnp.asarray(planes[:, :3])  # (P, 3)
    d = jnp.asarray(planes[:, 3])  # (P,)
    denom = jnp.einsum("hwc,pc->hwp", rays_w, n)
    numer = d[None, None, :] - jnp.einsum("c,pc->p", cam_center, n)[None, None, :]
    z = numer / jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    z = jnp.where(z > 0.05, z, jnp.inf)
    depth = jnp.min(z, axis=-1)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)

    p_w = cam_center[None, None, :] + depth[..., None] * rays_w
    color = _texture(p_w, detail, flat_x)
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


def make_handheld_trajectory(n_frames: int = 60, seed: int = 0,
                             jitter_t: float = 0.004, jitter_r: float = 0.005,
                             fast_rot_start: int = 24, fast_rot_len: int = 10,
                             fast_rot_step: float = 0.035) -> np.ndarray:
    """Adversarial handheld trajectory (VERDICT r3 #3b): the smooth sway of
    `make_trajectory` plus per-frame white-noise pose jitter (~0.3 deg /
    ~4 mm — handheld shake breaks the constant-velocity seed every frame)
    and a fast-rotation burst (`fast_rot_step` rad/frame yaw ~ 2 deg/frame
    over `fast_rot_len` frames — the TUM fr1-class regime where dense
    tracking must either hang on or fall back to its seed)."""
    rng = np.random.default_rng(seed)
    base = make_trajectory(n_frames)
    poses = []
    yaw = 0.0
    for i in range(n_frames):
        T = base[i].copy()
        if fast_rot_start <= i < fast_rot_start + fast_rot_len:
            yaw += fast_rot_step
        wj = rng.normal(scale=jitter_r, size=3)
        cy_, sy_ = math.cos(yaw + wj[1]), math.sin(yaw + wj[1])
        cx_, sx_ = math.cos(wj[0]), math.sin(wj[0])
        cz_, sz_ = math.cos(wj[2]), math.sin(wj[2])
        Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]])
        Rz = np.array([[cz_, -sz_, 0], [sz_, cz_, 0], [0, 0, 1]])
        T[:3, :3] = (Ry @ Rx @ Rz @ T[:3, :3]).astype(np.float32)
        T[:3, 3] += rng.normal(scale=jitter_t, size=3).astype(np.float32)
        poses.append(T.astype(np.float32))
    return np.stack(poses)


def make_loop_trajectory(n_frames: int = 60, reach: float = 0.35,
                         yaw_reach: float = 0.30, seed: int = 0,
                         jitter_t: float = 0.002, jitter_r: float = 0.002) -> np.ndarray:
    """Out-and-back loop (VERDICT r3 #3d): the camera translates + yaws away
    over the first half and RETURNS to the start over the second — frame
    N-1 revisits frame 0's view, so end-vs-start map/trajectory consistency
    measures accumulated drift (the closest single-room analogue of a loop
    closure test)."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_frames):
        s = math.sin(math.pi * i / max(n_frames - 1, 1))  # 0 -> 1 -> 0
        yaw = yaw_reach * s
        tx = reach * s
        ty = 0.3 * reach * math.sin(2 * math.pi * i / max(n_frames - 1, 1))
        cy_, sy_ = math.cos(yaw), math.sin(yaw)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]], np.float32)
        T[:3, 3] = [tx + rng.normal(scale=jitter_t), ty + rng.normal(scale=jitter_t), 0.0]
        wj = rng.normal(scale=jitter_r)
        cx_, sx_ = math.cos(wj), math.sin(wj)
        Rx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]], np.float32)
        T[:3, :3] = Rx @ T[:3, :3]
        poses.append(T)
    return np.stack(poses)


TRAJECTORIES = {
    "sway": lambda n, seed: make_trajectory(n),
    "handheld": lambda n, seed: make_handheld_trajectory(n, seed=seed),
    "loop": lambda n, seed: make_loop_trajectory(n, seed=seed),
}


def apply_sensor_noise(color: np.ndarray, depth: np.ndarray, seed: int,
                       depth_sigma0: float = 0.001, depth_sigma2: float = 0.0015,
                       depth_quant: float = 0.0028, edge_dropout_px: int = 2,
                       dropout_frac: float = 0.005, color_sigma: float = 0.02):
    """Kinect-style sensor noise (VERDICT r3 #3a), applied host-side per frame.

    Depth: additive Gaussian with the structured-light variance law
    sigma(z) = sigma0 + sigma2 * z^2 (Khoshelham & Elberink 2012 regime:
    ~1 mm at 1 m, ~1 cm at 2.5 m), then QUANTIZED to steps of
    depth_quant * z^2 (disparity-step law), plus edge dropout: pixels within
    `edge_dropout_px` of a depth discontinuity lose their depth with high
    probability (structured-light shadowing), and a `dropout_frac` salt of
    random invalid pixels. Color: additive Gaussian, clipped.
    """
    rng = np.random.default_rng(seed)
    edge_dropout_px = int(edge_dropout_px)
    d = np.asarray(depth, np.float32).copy()
    squeeze = d.ndim == 3
    if squeeze:
        d = d[..., 0]
    valid = d > 0
    z = np.where(valid, d, 1.0)
    sigma = depth_sigma0 + depth_sigma2 * z * z
    d = d + rng.normal(size=d.shape).astype(np.float32) * sigma * valid
    step = np.maximum(depth_quant * z * z, 1e-6)
    d = np.round(d / step) * step
    # edge dropout: dilate the discontinuity mask and knock depth out there
    gy, gx = np.gradient(np.where(valid, d, 0.0))
    edge = (np.abs(gx) + np.abs(gy)) > 0.05
    if edge_dropout_px > 0:
        from scipy.ndimage import binary_dilation

        edge = binary_dilation(edge, iterations=edge_dropout_px)
        drop = edge & (rng.uniform(size=d.shape) < 0.7)
        d = np.where(drop, 0.0, d)
    if dropout_frac > 0:
        d = np.where(rng.uniform(size=d.shape) < dropout_frac, 0.0, d)
    d = np.maximum(d, 0.0).astype(np.float32)
    c = np.asarray(color, np.float32)
    if c.max() > 1.5:  # uint8 range
        c = c / 255.0
    c = np.clip(c + rng.normal(size=c.shape).astype(np.float32) * color_sigma, 0.0, 1.0)
    return c, (d[..., None] if squeeze else d)


def make_sequence(n_frames: int = 30, width: int = 160, height: int = 120) -> SyntheticSequence:
    intr = CameraIntrinsics(
        fx=0.9 * width, fy=0.9 * width, cx=width / 2 - 0.5, cy=height / 2 - 0.5, width=width, height=height
    )
    return SyntheticSequence(
        intr=intr,
        poses_w2c=make_trajectory(n_frames),
        timestamps=np.arange(n_frames) * 0.05,
    )


def make_orbit_trajectory(n_frames: int = 300, radius: float = 2.2,
                          turns: float = 1.0, bob: float = 0.08, seed: int = 0,
                          jitter_t: float = 0.0, jitter_r: float = 0.0) -> np.ndarray:
    """Orbit inside the `room` scene, camera facing outward — the map-growth
    envelope trajectory (VERDICT r3 #6): every frame sees fresh close-range
    wall, so surfels accumulate for the whole sweep instead of re-observing
    one corner. `turns` circuits of radius `radius` over n_frames with a
    vertical bob; returns (N, 4, 4) w2c."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_frames):
        th = 2 * math.pi * turns * i / max(n_frames - 1, 1)
        c = np.array([radius * math.sin(th), bob * math.sin(5 * th),
                      -radius * math.cos(th)], np.float64)
        # camera +z (forward) = radially outward (sin th, 0, -cos th):
        # the wall 1.8 m away fills the view, fresh area all the way around
        yaw = math.pi - th + (rng.normal(scale=jitter_r) if jitter_r else 0.0)
        cy_, sy_ = math.cos(yaw), math.sin(yaw)
        Rc2w = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]], np.float64)
        if jitter_t:
            c = c + rng.normal(scale=jitter_t, size=3)
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = Rc2w.T  # w2c
        T[:3, 3] = -Rc2w.T @ c
        poses.append(T.astype(np.float32))
    return np.stack(poses)


TRAJECTORIES["orbit"] = lambda n, seed: make_orbit_trajectory(n, seed=seed)

render_corner_scene_jit = jax.jit(render_corner_scene, static_argnames=("intr", "detail", "flat_x", "scene"))
