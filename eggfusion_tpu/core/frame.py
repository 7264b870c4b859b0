"""Per-frame state container + on-device preprocessing.

TPU-native equivalent of the reference `Frame` (`/root/reference/src/utils/
frame.py:111-209`): holds GT and estimated pose, intrinsics, the bilateral-
filtered metric depth, and the tracking pyramid. All device math happens in
one jitted `preprocess_frame` program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.geometry import camera as cam
from eggfusion_tpu.ops import image as imops
from eggfusion_tpu.ops.pyramid import build_pyramid


@functools.partial(jax.jit, static_argnames=("nlevel",))
def prepare_frame_inputs(color_u8, depth_raw, mask, depth_scale: jnp.ndarray, nlevel: int = 3):
    """Normalize color, scale + bilateral-filter depth, and build the pyramid.

    Matches `Frame.__init__` (`frame.py:126-146`): color/255, depth/scale then
    bilateral (13, 0.03, 4.5), 3-level pyramid.
    Returns (color f32 (H, W, 3), depth f32 (H, W, 1), mask f32, pyramid).
    """
    color = color_u8.astype(jnp.float32) / 255.0
    depth = depth_raw.astype(jnp.float32) / depth_scale
    if depth.ndim == 2:
        depth = depth[..., None]
    depth = imops.bilateral_filter(depth, 13, 0.03, 4.5)
    mask = mask.astype(jnp.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    return color, depth, mask


@jax.jit
def _bilateral_jit(depth):
    return imops.bilateral_filter(depth, 13, 0.03, 4.5)


class Frame:
    """Host-side frame wrapper. Device arrays live in .color/.depth/.pyramid."""

    def __init__(self, uid: int, ts: float, color_u8: np.ndarray, depth_raw: np.ndarray,
                 mask: np.ndarray, gt_pose_w2c: np.ndarray, intr: cam.CameraIntrinsics,
                 depth_scale: float, nlevel: int = 3, projmat: np.ndarray | None = None,
                 prefiltered: bool = False, filter_depth: bool = False):
        self.uid = uid
        self.ts = float(ts)
        self.intrinsics = intr
        self.intr = intr.as_array()
        self.width, self.height = intr.width, intr.height
        self.fx, self.fy, self.cx, self.cy = intr.fx, intr.fy, intr.cx, intr.cy
        self.fovx, self.fovy = intr.fovx, intr.fovy
        self.sparse_tracking = False

        gt = np.asarray(gt_pose_w2c, np.float32)
        self.cam_R_gt = jnp.asarray(gt[:3, :3])
        self.cam_t_gt = jnp.asarray(gt[:3, 3])
        self.cam_R = jnp.eye(3)
        self.cam_t = jnp.zeros(3)

        if projmat is None:
            projmat = cam.projection_matrix_fov(0.01, 100.0, intr.fovx, intr.fovy).T
        self.projmat = jnp.asarray(projmat, jnp.float32)  # pre-transposed (3DGS layout)

        if prefiltered:
            # inputs already float metric (synthetic / device-resident path)
            self.color = jnp.asarray(color_u8, jnp.float32)
            d = jnp.asarray(depth_raw, jnp.float32)
            d = d if d.ndim == 3 else d[..., None]
            if filter_depth:
                d = _bilateral_jit(d)
            self.depth = d
            m = jnp.asarray(mask, jnp.float32)
            self.mask = m if m.ndim == 3 else m[..., None]
        else:
            self.color, self.depth, self.mask = prepare_frame_inputs(
                jnp.asarray(color_u8), jnp.asarray(depth_raw), jnp.asarray(mask),
                jnp.asarray(depth_scale, jnp.float32), nlevel,
            )
        self.pyramid = build_pyramid(self.color, self.depth, self.mask, self.intr, nlevel=nlevel)

    # ---- poses --------------------------------------------------------------
    # matrices are cached per update: w2c/c2w are read several times per frame
    # (tracker, preprocess, mapping, keyframing, trajectory) and each eager
    # rebuild is a separate device dispatch.

    def update_transform(self, R, t) -> None:
        self.cam_R = jnp.asarray(R, jnp.float32)
        self.cam_t = jnp.asarray(t, jnp.float32)
        self._w2c = None
        self._c2w = None

    def update_transform_matrix(self, w2c) -> None:
        """Set the pose from a full (4, 4) w2c without re-deriving it."""
        w2c = jnp.asarray(w2c, jnp.float32)
        self.cam_R = w2c[:3, :3]
        self.cam_t = w2c[:3, 3]
        self._w2c = w2c
        self._c2w = None

    def w2c_matrix(self, gt: bool = False) -> jnp.ndarray:
        if gt:
            return cam.world_to_camera(self.cam_R_gt, self.cam_t_gt)
        if getattr(self, "_w2c", None) is None:
            self._w2c = cam.world_to_camera(self.cam_R, self.cam_t)
        return self._w2c

    def c2w_matrix(self, gt: bool = False) -> jnp.ndarray:
        if gt:
            return cam.camera_to_world(self.cam_R_gt, self.cam_t_gt)
        if getattr(self, "_c2w", None) is None:
            self._c2w = cam.camera_to_world(self.cam_R, self.cam_t)
        return self._c2w

    @property
    def world_view_transform(self) -> jnp.ndarray:
        """Transposed w2c, 3DGS row-vector convention (`frame.py:159-161`)."""
        return self.w2c_matrix().T

    @property
    def full_proj_transform(self) -> jnp.ndarray:
        return self.world_view_transform @ self.projmat

    @property
    def camera_center(self) -> jnp.ndarray:
        c2w = self.c2w_matrix()
        return c2w[:3, 3]
