import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from eggfusion_tpu.core.tracker import TrackerConfig, dense_track
from eggfusion_tpu.data.synthetic import render_corner_scene
from eggfusion_tpu.geometry.camera import CameraIntrinsics
from eggfusion_tpu.ops import reduce as gn
from eggfusion_tpu.ops.pyramid import build_pyramid

INTR = CameraIntrinsics(fx=72.0, fy=72.0, cx=39.5, cy=29.5, width=80, height=60)


def _make_pyramid(w2c, nlevel=3):
    color, depth = render_corner_scene(INTR, w2c)
    mask = jnp.ones_like(depth)
    return build_pyramid(color, depth, mask, INTR.as_array(), nlevel=nlevel)


def _perturbation(rotvec, trans):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    T[:3, 3] = trans
    return T


class TestWarp:
    def test_identity_warp_is_identity_grid(self):
        pyr = _make_pyramid(np.eye(4))
        lvl = pyr[0]
        coords, _ = gn.projective_warp(jnp.eye(4), lvl.disp, lvl.intr)
        H, W = lvl.disp.shape[:2]
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        exp_x = 2 * xs / (W - 1) - 1
        exp_y = 2 * ys / (H - 1) - 1
        np.testing.assert_allclose(np.asarray(coords[..., 0]), exp_x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(coords[..., 1]), exp_y, atol=1e-5)

    def test_jacobian_matches_finite_difference(self):
        """The analytic 2x6 Jacobian should match numeric diff of the warp
        under the update_transform parameterization (t-then-R, left rot)."""
        from eggfusion_tpu.geometry import lie

        pyr = _make_pyramid(np.eye(4))
        lvl = pyr[1]
        T0 = jnp.asarray(_perturbation([0.01, -0.02, 0.005], [0.01, 0.0, -0.02]))

        def warp_px(dx):
            T = lie.update_transform(T0, dx)
            coords, _ = gn.projective_warp(T, lvl.disp, lvl.intr)
            H, W = lvl.disp.shape[:2]
            # return unnormalized pixel coords at a probe pixel
            c = coords[12, 17]
            return jnp.stack([(c[0] + 1) / 2 * (W - 1), (c[1] + 1) / 2 * (H - 1)])

        _, Jc = gn.projective_warp(T0, lvl.disp, lvl.intr)
        J_analytic = np.asarray(Jc[12, 17])  # (2, 6)

        eps = 1e-4
        J_num = np.zeros((2, 6), np.float32)
        for k in range(6):
            dp = np.zeros(6, np.float32)
            dp[k] = eps
            f1 = np.asarray(warp_px(jnp.asarray(dp)))
            f0 = np.asarray(warp_px(jnp.asarray(-dp)))
            J_num[:, k] = (f1 - f0) / (2 * eps)
        # Sign convention: the reference Jacobian is for the residual direction
        # (model - warped); translation block is +dt*f/z against +x motion.
        np.testing.assert_allclose(np.abs(J_analytic), np.abs(J_num), rtol=0.08, atol=0.15)


class TestDenseTrack:
    def test_identity_stays_identity(self):
        pyr = _make_pyramid(np.eye(4))
        cfg = TrackerConfig(use_rgb=False)
        delta, converged, res, n = dense_track(pyr, pyr, jnp.eye(4), cfg)
        np.testing.assert_allclose(np.asarray(delta), np.eye(4), atol=5e-4)
        assert float(n) > 100

    def test_recovers_small_pose(self):
        w2c_prev = np.eye(4, dtype=np.float32)
        delta_true = _perturbation([0.002, -0.004, 0.003], [0.008, -0.005, 0.006])
        w2c_curr = delta_true @ w2c_prev

        pyr_model = _make_pyramid(w2c_prev)
        pyr_frame = _make_pyramid(w2c_curr)

        cfg = TrackerConfig(use_rgb=False, pyramid_iters=(4, 4, 4))
        delta, converged, res, n = dense_track(pyr_model, pyr_frame, jnp.eye(4), cfg)

        err = np.asarray(delta) @ np.linalg.inv(delta_true)
        rot_err = np.degrees(np.abs(Rotation.from_matrix(err[:3, :3]).magnitude()))
        t_err = np.linalg.norm(err[:3, 3])
        assert rot_err < 0.05, f"rotation error {rot_err} deg"
        assert t_err < 2e-3, f"translation error {t_err} m"

    def test_recovers_with_rgb_term(self):
        delta_true = _perturbation([0.0, 0.003, -0.002], [-0.006, 0.004, 0.0])
        pyr_model = _make_pyramid(np.eye(4))
        pyr_frame = _make_pyramid(delta_true)
        cfg = TrackerConfig(use_rgb=True, rgb_weight=1e-4, pyramid_iters=(4, 4, 4))
        delta, _, _, _ = dense_track(pyr_model, pyr_frame, jnp.eye(4), cfg)
        err = np.asarray(delta) @ np.linalg.inv(delta_true)
        assert np.linalg.norm(err[:3, 3]) < 2e-3

    def test_larger_motion_with_pyramid(self):
        """Coarse-to-fine should handle several-pixel motion."""
        delta_true = _perturbation([0.0, 0.01, 0.0], [0.03, 0.0, -0.02])
        pyr_model = _make_pyramid(np.eye(4))
        pyr_frame = _make_pyramid(delta_true)
        cfg = TrackerConfig(use_rgb=False, pyramid_iters=(5, 5, 5))
        delta, _, _, _ = dense_track(pyr_model, pyr_frame, jnp.eye(4), cfg)
        err = np.asarray(delta) @ np.linalg.inv(delta_true)
        rot_err = np.degrees(np.abs(Rotation.from_matrix(err[:3, :3]).magnitude()))
        assert rot_err < 0.1
        assert np.linalg.norm(err[:3, 3]) < 4e-3

    def test_solve_gn_damping(self):
        A = jnp.eye(6) * 2.0
        b = jnp.ones(6)
        dx = gn.solve_gn(A, b, lm=0.0)
        np.testing.assert_allclose(np.asarray(dx), 0.5, atol=1e-6)
