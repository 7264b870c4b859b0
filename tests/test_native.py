"""First-party C++ sparse frontend (native/sparse_frontend.cpp via ctypes).

The reference's equivalent is the ORB-SLAM2 submodule (SURVEY.md N3); these
tests validate the replacement end-to-end on synthetic imagery with exact
ground truth, without any dataset or GPU/TPU dependency.
"""
import numpy as np
import pytest

pytest.importorskip("scipy")
from scipy.ndimage import gaussian_filter, shift as ndshift

from eggfusion_tpu.native import sparse as nsp


def _texture(seed=1, H=240, W=320):
    rng = np.random.default_rng(seed)
    base = gaussian_filter(rng.uniform(0, 255, (H, W)), 1.5)
    return ((base - base.min()) / np.ptp(base) * 255).astype(np.uint8)


class TestDetect:
    def test_finds_features_on_texture(self):
        kp, desc = nsp.detect(_texture(), threshold=15)
        assert len(kp) > 200
        assert desc.shape == (len(kp), 4)
        # keypoints respect the border margin
        assert kp[:, 0].min() >= 16 and kp[:, 1].min() >= 16

    def test_no_features_on_flat_image(self):
        kp, _ = nsp.detect(np.full((240, 320), 128, np.uint8), threshold=15)
        assert len(kp) == 0

    def test_descriptors_rotation_consistent(self):
        """The same physical corner described twice gives identical bits."""
        img = _texture(seed=3)
        kp1, d1 = nsp.detect(img, threshold=15)
        kp2, d2 = nsp.detect(img, threshold=15)
        np.testing.assert_array_equal(d1, d2)


class TestTrack:
    def test_recovers_pure_translation(self):
        H, W = 240, 320
        fx = fy = 300.0
        cx, cy = 159.5, 119.5
        Z = 2.0
        base = _texture()
        dx_px, dy_px = 5.0, -3.0
        img1 = ndshift(base.astype(np.float32), (dy_px, dx_px), order=1, mode="nearest").astype(np.uint8)
        dep = np.full((H, W), Z, np.float32)

        kp0, d0 = nsp.detect(base, threshold=15)
        kp1, d1 = nsp.detect(img1, threshold=15)
        delta, n = nsp.track(kp0, d0, kp1, d1, dep, dep, fx, fy, cx, cy)
        assert delta is not None and n > 100
        # an image shift at constant depth = camera-frame translation
        np.testing.assert_allclose(
            delta[:3, 3], [dx_px * Z / fx, dy_px * Z / fy, 0.0], atol=2e-3
        )
        np.testing.assert_allclose(delta[:3, :3], np.eye(3), atol=2e-3)
        np.testing.assert_allclose(delta[3], [0, 0, 0, 1], atol=0)

    def test_fails_gracefully_without_overlap(self):
        kp0, d0 = nsp.detect(_texture(seed=1), threshold=15)
        kp1, d1 = nsp.detect(_texture(seed=99), threshold=15)
        dep = np.full((240, 320), 2.0, np.float32)
        delta, n = nsp.track(kp0, d0, kp1, d1, dep, dep, 300.0, 300.0, 159.5, 119.5)
        assert delta is None or n < 50  # unrelated scenes must not "converge" strongly

    def test_invalid_depth_rejected(self):
        base = _texture()
        kp0, d0 = nsp.detect(base, threshold=15)
        dep = np.zeros((240, 320), np.float32)  # all invalid
        delta, n = nsp.track(kp0, d0, kp0, d0, dep, dep, 300.0, 300.0, 159.5, 119.5)
        assert delta is None


class TestSparseInitializerFactory:
    def test_native_backend_selected(self):
        from eggfusion_tpu import config as cfglib
        from eggfusion_tpu.core.sparse_init import NativeSparseInitializer, SparseInitializer

        cfg = cfglib.default_config(Tracking={"use_sparse": True})
        init = SparseInitializer(cfg)
        assert isinstance(init, NativeSparseInitializer)


class TestFrameLoader:
    def test_remap_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        from eggfusion_tpu.data.datasets import build_undistort_map
        from eggfusion_tpu.native import loader as nloader

        H, W = 120, 160
        K = np.array([[150.0, 0, 79.5], [0, 150.0, 59.5], [0, 0, 1]])
        dist = np.array([-0.05, 0.01, 0.001, -0.002, 0.0])
        mx, my = build_undistort_map(K, dist, W, H)
        cx, cy = cv2.initUndistortRectifyMap(K, dist, np.eye(3), K, (W, H), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, cx, atol=1e-3)
        np.testing.assert_allclose(my, cy, atol=1e-3)

        rng = np.random.default_rng(0)
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        ours = nloader.remap(img, mx, my)
        ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
        inb = (mx > 1) & (my > 1) & (mx < W - 2) & (my < H - 2)
        diff = np.abs(ours.astype(int) - ref.astype(int))[inb]
        assert np.percentile(diff, 99) <= 1  # rounding-level agreement

    def test_depth_convert(self):
        from eggfusion_tpu.native import loader as nloader

        raw = np.array([[0, 5000, 65000], [1000, 2500, 7]], np.uint16)
        out = nloader.depth_to_metric(raw, depth_scale=5000.0, min_m=0.01, max_m=10.0)
        np.testing.assert_allclose(out[0], [0.0, 1.0, 0.0], atol=1e-6)  # 13 m -> invalid
        np.testing.assert_allclose(out[1], [0.2, 0.5, 0.0], atol=1e-4)  # 1.4 mm < min_m -> invalid
