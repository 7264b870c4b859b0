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


@functools.partial(jax.jit, static_argnames=("nlevel", "bilateral"))
def prepare_frame_inputs(color_u8, depth_raw, mask, depth_scale: jnp.ndarray, nlevel: int = 3,
                         bilateral: str = "exact"):
    """Normalize color, scale + bilateral-filter depth, and build the pyramid.

    Matches `Frame.__init__` (`frame.py:126-146`): color/255, depth/scale then
    bilateral (13, 0.03, 4.5), 3-level pyramid. `bilateral` selects the
    filter variant (System.bilateral_mode): "exact" = the reference's full
    13x13 window, "separable" = row+column approximation (26 taps vs 169 —
    the full-res depth filter is ~2.9 ms/frame of the TPU budget).
    Returns (color f32 (H, W, 3), depth f32 (H, W, 1), mask f32, pyramid).
    """
    color = color_u8.astype(jnp.float32) / 255.0
    depth = depth_raw.astype(jnp.float32) / depth_scale
    if depth.ndim == 2:
        depth = depth[..., None]
    bilat = (imops.bilateral_filter_separable if bilateral == "separable"
             else imops.bilateral_filter)
    depth = bilat(depth, 13, 0.03, 4.5)
    mask = mask.astype(jnp.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    return color, depth, mask


@functools.partial(jax.jit, static_argnames=("bilateral",))
def _bilateral_jit(depth, bilateral: str = "exact"):
    bilat = (imops.bilateral_filter_separable if bilateral == "separable"
             else imops.bilateral_filter)
    return bilat(depth, 13, 0.03, 4.5)


@functools.lru_cache(maxsize=8)
def _intr_array(intr: cam.CameraIntrinsics) -> jnp.ndarray:
    """Device (fx, fy, cx, cy) cached per intrinsics: a per-frame upload is a
    multi-ms host->device round trip on tunnel-attached TPUs."""
    return intr.as_array()


class Frame:
    """Host-side frame wrapper. Device arrays live in .color/.depth/.pyramid.

    Per-frame device traffic is kept minimal: the GT pose stays a HOST numpy
    matrix (nothing on the hot path consumes it on device — trajectory
    bookkeeping is host-side), intrinsics/projection matrices are cached
    uploads, and the estimated pose is stored as ONE (4, 4) device matrix
    with R/t derived lazily (each eager slice is a separate dispatch)."""

    def __init__(self, uid: int, ts: float, color_u8: np.ndarray, depth_raw: np.ndarray,
                 mask: np.ndarray, gt_pose_w2c: np.ndarray, intr: cam.CameraIntrinsics,
                 depth_scale: float, nlevel: int = 3, projmat: np.ndarray | None = None,
                 prefiltered: bool = False, filter_depth: bool = False,
                 bilateral: str = "exact"):
        self.uid = uid
        self.ts = float(ts)
        self.intrinsics = intr
        self.intr = _intr_array(intr)
        self.width, self.height = intr.width, intr.height
        self.fx, self.fy, self.cx, self.cy = intr.fx, intr.fy, intr.cx, intr.cy
        self.fovx, self.fovy = intr.fovx, intr.fovy
        self.sparse_tracking = False

        # host copy; uploaded only if a device consumer asks (gt-pose modes)
        self.gt_w2c = np.asarray(gt_pose_w2c, np.float32)
        self._w2c = None
        self._c2w = None
        self._gt_w2c_dev = None

        if projmat is None:
            projmat = cam.projection_matrix_fov(0.01, 100.0, intr.fovx, intr.fovy).T
        self.projmat = projmat  # pre-transposed (3DGS layout); host-side

        if prefiltered:
            # inputs already float metric (synthetic / device-resident path)
            self.color = jnp.asarray(color_u8, jnp.float32)
            d = jnp.asarray(depth_raw, jnp.float32)
            d = d if d.ndim == 3 else d[..., None]
            if filter_depth:
                d = _bilateral_jit(d, bilateral)
            self.depth = d
            m = jnp.asarray(mask, jnp.float32)
            self.mask = m if m.ndim == 3 else m[..., None]
        else:
            self.color, self.depth, self.mask = prepare_frame_inputs(
                jnp.asarray(color_u8), jnp.asarray(depth_raw), jnp.asarray(mask),
                jnp.asarray(depth_scale, jnp.float32), nlevel, bilateral,
            )
        self.pyramid = build_pyramid(self.color, self.depth, self.mask, self.intr, nlevel=nlevel,
                                     bilateral=bilateral)

    # ---- poses --------------------------------------------------------------
    # matrices are cached per update: w2c/c2w are read several times per frame
    # (tracker, preprocess, mapping, keyframing, trajectory) and each eager
    # rebuild is a separate device dispatch.

    def update_transform_gt(self) -> None:
        """Commit the GT pose as the estimate (frame 0 / only_mapping)."""
        if self._gt_w2c_dev is None:
            self._gt_w2c_dev = jnp.asarray(self.gt_w2c)
        self._w2c = self._gt_w2c_dev
        self._c2w = None

    def update_transform_matrix(self, w2c) -> None:
        """Set the pose from a full (4, 4) w2c without re-deriving it."""
        self._w2c = jnp.asarray(w2c, jnp.float32)
        self._c2w = None

    @property
    def cam_R(self) -> jnp.ndarray:
        return self.w2c_matrix()[:3, :3]

    @property
    def cam_t(self) -> jnp.ndarray:
        return self.w2c_matrix()[:3, 3]

    def w2c_matrix(self, gt: bool = False) -> jnp.ndarray:
        if gt:
            if self._gt_w2c_dev is None:
                self._gt_w2c_dev = jnp.asarray(self.gt_w2c)
            return self._gt_w2c_dev
        assert self._w2c is not None, "pose not set yet (tracker runs first)"
        return self._w2c

    def c2w_matrix(self, gt: bool = False) -> jnp.ndarray:
        if gt:
            return jnp.asarray(np.linalg.inv(self.gt_w2c))
        if self._c2w is None:
            self._c2w = jnp.linalg.inv(self.w2c_matrix())
        return self._c2w

    @property
    def world_view_transform(self) -> jnp.ndarray:
        """Transposed w2c, 3DGS row-vector convention (`frame.py:159-161`)."""
        return self.w2c_matrix().T

    @property
    def full_proj_transform(self) -> jnp.ndarray:
        return self.world_view_transform @ jnp.asarray(self.projmat, jnp.float32)

    @property
    def camera_center(self) -> jnp.ndarray:
        c2w = self.c2w_matrix()
        return c2w[:3, 3]
