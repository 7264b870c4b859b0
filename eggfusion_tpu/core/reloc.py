"""Descriptor-indexed relocalization (VERDICT r2 next-round #7).

The reference's ORB-SLAM2 frontend carries a keyframe database and can
relocalize after tracking loss (`/root/reference/src/core/tracker.py:85-122`
— the submodule's Tracking::Relocalization matches the lost frame's ORB
descriptors against candidate keyframes). The round-2 recovery path
re-anchored blindly to the *last* converged pose; this module adds the
appearance-based choice: match the lost frame's FAST+BRIEF descriptors
(first-party `native/sparse_frontend.cpp`) against every stored keyframe,
pick the keyframe with the most RANSAC inliers, and return the full
relocalized pose `delta @ kf.w2c` — not just the keyframe id.

Host-side and lazy by design: keyframe descriptors are computed on first
recovery (one D2H map pull per keyframe, cached by uid), never on the
per-frame hot path.
"""
from __future__ import annotations

import numpy as np

from eggfusion_tpu.ops.pyramid import RGB_COEFF


def _to_gray_u8(color_map: np.ndarray) -> np.ndarray:
    """(H, W, 3) float color in [0, 1] -> (H, W) uint8 gray, using the
    reference's reversed-coefficient quirk (`frame.py:19,40`)."""
    c = np.asarray(color_map, np.float32)
    gray = c[..., 0] * RGB_COEFF[2] + c[..., 1] * RGB_COEFF[1] + c[..., 2] * RGB_COEFF[0]
    return np.clip(gray * 255.0, 0, 255).astype(np.uint8)


class DescriptorRelocalizer:
    """Appearance-based keyframe retrieval + pose solve for recovery."""

    def __init__(self, cfg):
        from eggfusion_tpu.native import sparse as nsp

        self._nsp = nsp
        t = cfg.Tracking
        self.max_kp = int(t.get("orb_features", 1500))
        self.threshold = int(t.get("fast_threshold", 15))
        self.min_inliers = int(t.get("reloc_min_inliers", 20))
        self.max_candidates = int(t.get("reloc_max_candidates", 24))
        self.inlier_thresh = float(t.get("sparse_inlier_thresh", 0.05))
        cal = cfg.Dataset.Calibration
        self.fx, self.fy = float(cal.fx), float(cal.fy)
        self.cx, self.cy = float(cal.cx), float(cal.cy)
        self._db: dict[int, tuple] = {}  # kf.uid -> (kps, desc, depth_np, w2c_np)

    def _describe_keyframe(self, kf):
        cached = self._db.get(kf.uid)
        if cached is not None:
            return cached
        color = np.asarray(kf.maps["color"])
        depth = np.asarray(kf.maps["depth"])[..., 0].astype(np.float32)
        gray = _to_gray_u8(color)
        kps, desc = self._nsp.detect(gray, threshold=self.threshold, max_kp=self.max_kp)
        entry = (kps, desc, depth, np.asarray(kf.w2c, np.float64))
        self._db[kf.uid] = entry
        return entry

    def forget(self, uid: int) -> None:
        self._db.pop(uid, None)

    def relocalize(self, frame, keyframes: dict):
        """Returns (w2c 4x4 float32, kf_uid, n_inliers) or None.

        `keyframes` is KeyFrameManager.keyframes ({uid: KeyFrame}). Scans up
        to `reloc_max_candidates` keyframes, evenly covering the whole map
        (ORB-SLAM2 scans its full database; we subsample old keyframes to
        bound host work, always including the most recent ones).
        """
        uids = sorted(keyframes.keys())
        if not uids:
            return None
        if len(uids) > self.max_candidates:
            # half the budget on the most recent keyframes, half spread
            # evenly over the rest — losses near the current pose relocalize
            # fast; loop-scale losses still see the whole map
            recent = uids[-self.max_candidates // 2:]
            older = uids[: -self.max_candidates // 2]
            stride = max(1, len(older) // (self.max_candidates - len(recent)))
            uids = sorted(set(older[::stride] + recent))

        gray = (np.asarray(frame.pyramid[0].intensity)[..., 0] * 255).astype(np.uint8)
        depth = np.asarray(frame.depth)[..., 0].astype(np.float32)
        cur_kps, cur_desc = self._nsp.detect(
            gray, threshold=self.threshold, max_kp=self.max_kp
        )
        if len(cur_kps) < 3:
            return None

        best = None  # (n_inliers, w2c, uid)
        for uid in uids:
            kf_kps, kf_desc, kf_depth, kf_w2c = self._describe_keyframe(keyframes[uid])
            if len(kf_kps) < 3:
                continue
            delta, n = self._nsp.track(
                kf_kps, kf_desc, cur_kps, cur_desc, kf_depth, depth,
                self.fx, self.fy, self.cx, self.cy,
                min_inliers=self.min_inliers, inlier_thresh=self.inlier_thresh,
            )
            if delta is None:
                continue
            if best is None or n > best[0]:
                best = (n, (delta @ kf_w2c).astype(np.float32), uid)
        if best is None:
            return None
        return best[1], best[2], best[0]
