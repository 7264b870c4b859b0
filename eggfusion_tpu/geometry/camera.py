"""Camera models, projection matrices and pose builders.

Semantics match the reference `src/utils/camera_utils.py:70-130` (fov/focal
conversion, two OpenGL-style projection matrices, w2c/c2w builders) and the
3DGS matrix conventions used by `src/utils/frame.py:159-169`
(`world_view_transform` is the transposed w2c; `full_proj_transform` is
world_view_transform @ projmat with projmat pre-transposed at dataset init,
`src/utils/dataset.py:39-44`).

`CameraIntrinsics` is a hashable NamedTuple of Python floats so it can be a
static argument / closure constant under `jax.jit` (static shapes + constants
fold into the compiled program — the TPU-friendly design).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


class CameraIntrinsics(NamedTuple):
    """Pinhole intrinsics. Hashable -> usable as a jit static argument."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def fovx(self) -> float:
        return focal2fov(self.fx, self.width)

    @property
    def fovy(self) -> float:
        return focal2fov(self.fy, self.height)

    def scaled(self, factor: float) -> "CameraIntrinsics":
        """Intrinsics of a pyramid level downsampled by `factor` (e.g. 2**l)."""
        return CameraIntrinsics(
            fx=self.fx / factor,
            fy=self.fy / factor,
            cx=self.cx / factor,
            cy=self.cy / factor,
            width=int(self.width // factor),
            height=int(self.height // factor),
        )

    def as_array(self, dtype=jnp.float32) -> jnp.ndarray:
        """(fx, fy, cx, cy) as a device array (reference `frame.py:124`)."""
        return jnp.array([self.fx, self.fy, self.cx, self.cy], dtype=dtype)


def projection_matrix(znear: float, zfar: float, cx, cy, fx, fy, W, H) -> np.ndarray:
    """Principal-point-aware OpenGL projection (reference `camera_utils.py:76-98`)."""
    left = ((2 * cx - W) / W - 1.0) * W / 2.0
    right = ((2 * cx - W) / W + 1.0) * W / 2.0
    top = ((2 * cy - H) / H + 1.0) * H / 2.0
    bottom = ((2 * cy - H) / H - 1.0) * H / 2.0
    left = znear / fx * left
    right = znear / fx * right
    top = znear / fy * top
    bottom = znear / fy * bottom
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_fov(znear: float, zfar: float, fovX: float, fovY: float) -> np.ndarray:
    """FoV-only OpenGL projection (reference `camera_utils.py:100-120`)."""
    tanY = math.tan(fovY / 2)
    tanX = math.tan(fovX / 2)
    top, bottom = tanY * znear, -tanY * znear
    right, left = tanX * znear, -tanX * znear
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def world_to_camera(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """4x4 w2c from (R, t) where R, t already ARE world->camera
    (reference `getWorld2Camera`, `camera_utils.py:122-126`)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def camera_to_world(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `world_to_camera` (reference `camera_utils.py:128-130`)."""
    Rt = R.T
    return world_to_camera(Rt, -(Rt @ t))
