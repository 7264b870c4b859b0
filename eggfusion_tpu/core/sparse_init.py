"""Sparse feature-based pose initializer.

Replaces the reference's ORB-SLAM2 C++ frontend (`/root/reference/src/core/
tracker.py:85-122`, submodule N3): the dense tracker only needs a *delta
seed* (`tracker.py:147-151`), so a lightweight feature odometer is
sufficient — and keeps the whole stack free of the ORB-SLAM2 build. Runs on
host CPU (like ORB-SLAM2 did), overlapped with device work.

Two backends, selected by `Tracking.sparse_backend`:
  "native" (default) — the first-party C++ frontend
      (`native/sparse_frontend.cpp`): FAST + steered binary descriptors +
      3D-3D Horn RANSAC (RGB-D gives depth on both sides, so the 3D-3D
      closed form replaces ORB-SLAM2's PnP).
  "opencv" — ORB keypoints -> ratio-test matching -> 3D-2D PnP RANSAC.

Both return the estimated w2c (chained delta onto the previous estimate) or
None on failure (caller falls back to the motion model).
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class NativeSparseInitializer:
    """C++ frontend wrapper (FAST + binary descriptors + 3D-3D RANSAC)."""

    def __init__(self, cfg):
        from eggfusion_tpu.native import sparse as nsp

        self._nsp = nsp
        t = cfg.Tracking
        self.max_kp = int(t.get("orb_features", 1500))
        self.threshold = int(t.get("fast_threshold", 15))
        self.min_matches = int(t.get("orb_min_matches", 25))
        self.inlier_thresh = float(t.get("sparse_inlier_thresh", 0.05))
        calib = cfg.Dataset.Calibration
        self.fx, self.fy = float(calib.fx), float(calib.fy)
        self.cx, self.cy = float(calib.cx), float(calib.cy)
        self.prev = None  # (kps, desc, depth, w2c)

    def track(self, frame) -> np.ndarray | None:
        gray = (np.asarray(frame.pyramid[0].intensity)[..., 0] * 255).astype(np.uint8)
        depth = np.asarray(frame.depth)[..., 0].astype(np.float32)
        kps, desc = self._nsp.detect(gray, threshold=self.threshold, max_kp=self.max_kp)

        result = None
        if self.prev is not None and len(kps) >= 3 and len(self.prev[0]) >= 3:
            kp0, d0, depth0, w2c0 = self.prev
            delta, n_inl = self._nsp.track(
                kp0, d0, kps, desc, depth0, depth,
                self.fx, self.fy, self.cx, self.cy,
                min_inliers=self.min_matches, inlier_thresh=self.inlier_thresh,
            )
            if delta is not None:
                result = (delta @ np.asarray(w2c0, np.float64)).astype(np.float32)

        w2c_state = result
        if w2c_state is None:
            # no sparse solve: carry the best-known absolute pose forward —
            # the frame's committed pose when one exists (frame-0/GT path),
            # else the previous state (zero-motion dead reckoning)
            if getattr(frame, "_w2c", None) is not None:
                w2c_state = np.asarray(frame.w2c_matrix(), np.float64)
            elif self.prev is not None:
                w2c_state = self.prev[3]
            else:
                w2c_state = np.eye(4)
        self.prev = (kps, desc, depth, w2c_state)
        return result


class OpenCVSparseInitializer:
    def __init__(self, cfg):
        if cv2 is None:
            raise RuntimeError("OpenCVSparseInitializer requires OpenCV")
        n_features = int(cfg.Tracking.get("orb_features", 1500))
        self.orb = cv2.ORB_create(nfeatures=n_features)
        self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
        self.prev = None  # (kps, desc, depth, w2c)
        calib = cfg.Dataset.Calibration
        self.K = np.array(
            [[calib.fx, 0, calib.cx], [0, calib.fy, calib.cy], [0, 0, 1]], np.float64
        )
        self.min_matches = int(cfg.Tracking.get("orb_min_matches", 25))

    def track(self, frame) -> np.ndarray | None:
        """Returns the estimated w2c 4x4 for `frame`, or None on failure."""
        gray = (np.asarray(frame.pyramid[0].intensity)[..., 0] * 255).astype(np.uint8)
        depth = np.asarray(frame.depth)[..., 0]
        kps, desc = self.orb.detectAndCompute(gray, None)

        result = None
        if self.prev is not None and desc is not None and self.prev[1] is not None:
            kps0, desc0, depth0, w2c0 = self.prev
            matches = self.matcher.knnMatch(desc0, desc, k=2)
            good = [m for m, n in (p for p in matches if len(p) == 2) if m.distance < 0.75 * n.distance]
            if len(good) >= self.min_matches:
                pts3d, pts2d = [], []
                fx, fy = self.K[0, 0], self.K[1, 1]
                cx, cy = self.K[0, 2], self.K[1, 2]
                for m in good:
                    u0, v0 = kps0[m.queryIdx].pt
                    d = depth0[int(round(v0)), int(round(u0))]
                    if d <= 0.1 or d > 20.0:
                        continue
                    # back-project into the PREVIOUS camera frame
                    pts3d.append([(u0 - cx) * d / fx, (v0 - cy) * d / fy, d])
                    pts2d.append(kps[m.trainIdx].pt)
                if len(pts3d) >= self.min_matches:
                    ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                        np.asarray(pts3d, np.float64), np.asarray(pts2d, np.float64),
                        self.K, None, reprojectionError=3.0, iterationsCount=100,
                    )
                    if ok and inliers is not None and len(inliers) >= self.min_matches // 2:
                        R, _ = cv2.Rodrigues(rvec)
                        delta = np.eye(4)
                        delta[:3, :3] = R
                        delta[:3, 3] = tvec[:, 0]
                        # delta maps prev-camera coords -> curr-camera coords
                        result = (delta @ np.asarray(w2c0, np.float64)).astype(np.float32)

        w2c_for_state = result
        if w2c_for_state is None:
            if getattr(frame, "_w2c", None) is not None:
                w2c_for_state = np.asarray(frame.w2c_matrix(), np.float64)
            elif self.prev is not None:
                w2c_for_state = self.prev[3]
            else:
                w2c_for_state = np.eye(4)
        self.prev = (kps, desc, depth, w2c_for_state)
        return result


def SparseInitializer(cfg):
    """Factory honoring `Tracking.sparse_backend` (native | opencv), with a
    graceful fallback to OpenCV if the native build is unavailable."""
    backend = str(cfg.Tracking.get("sparse_backend", "native"))
    if backend == "native":
        try:
            return NativeSparseInitializer(cfg)
        except Exception as e:  # pragma: no cover - build-env dependent
            print(f"native sparse frontend unavailable ({e}); falling back to OpenCV")
            backend = "opencv"
    return OpenCVSparseInitializer(cfg)
