import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from eggfusion_tpu.geometry import camera, lie, sh, transforms


class TestLie:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            w = rng.normal(size=3).astype(np.float32) * 0.5
            R = lie.so3_to_SO3(jnp.asarray(w))
            R_ref = Rotation.from_rotvec(w).as_matrix()
            np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-4)
            w_back = lie.SO3_to_so3(R)
            np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-4)

    def test_exp_small_angle(self):
        R = lie.so3_to_SO3(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
        # gradient must not NaN at zero
        import jax

        g = jax.grad(lambda w: lie.so3_to_SO3(w).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_se3_roundtrip(self):
        tau = jnp.asarray([0.1, -0.2, 0.3, 0.05, 0.1, -0.07], jnp.float32)
        T = lie.se3_to_SE3(tau)
        tau2 = lie.SE3_to_se3(T)
        # reference ordering: se3_to_SE3 takes [theta, rho]; SE3_to_se3 returns [rho, theta]
        np.testing.assert_allclose(np.asarray(tau2[3:]), np.asarray(tau[:3]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(tau2[:3]), np.asarray(tau[3:]), atol=1e-4)

    def test_update_transform_semantics(self):
        # matches reference optimizer.py:426-441: R <- exp(dw) R, t <- dt + t
        T = jnp.eye(4)
        dx = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.1], jnp.float32)
        T2 = lie.update_transform(T, dx)
        np.testing.assert_allclose(np.asarray(T2[:3, 3]), [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(T2[:3, :3]), Rotation.from_rotvec([0, 0, 0.1]).as_matrix(), atol=1e-5
        )

    def test_invert(self):
        tau = jnp.asarray([0.3, -0.1, 0.2, 1.0, -2.0, 0.5], jnp.float32)
        T = lie.se3_to_SE3(tau)
        Ti = lie.invert_se3(T)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-5)


class TestCamera:
    def test_fov_focal_roundtrip(self):
        f = camera.fov2focal(camera.focal2fov(600.0, 1200), 1200)
        assert abs(f - 600.0) < 1e-9

    def test_w2c_c2w(self):
        R = jnp.asarray(Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix(), jnp.float32)
        t = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
        T = camera.world_to_camera(R, t)
        Ti = camera.camera_to_world(R, t)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-5)

    def test_projection_matrix_shapes(self):
        P = camera.projection_matrix_fov(0.01, 100.0, 1.2, 0.9)
        assert P.shape == (4, 4)
        assert P[3, 2] == 1.0


class TestSH:
    def test_deg0_matches_c0(self):
        shc = jnp.ones((5, 3, 1))
        out = sh.eval_sh(0, shc, jnp.zeros((5, 3)))
        np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_higher_degrees_finite(self, deg):
        rng = np.random.default_rng(deg)
        shc = jnp.asarray(rng.normal(size=(7, 3, (deg + 1) ** 2)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(deg, shc, dirs)
        assert out.shape == (7, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestTransforms:
    def test_build_rotation_identity(self):
        q = jnp.asarray([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(np.asarray(transforms.build_rotation(q)[0]), np.eye(3), atol=1e-6)

    def test_build_rotation_vs_scipy(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(10, 4)).astype(np.float32)
        R = transforms.build_rotation(jnp.asarray(q))
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        # scipy uses xyzw ordering
        R_ref = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_compute_rot_aligns_z_to_normal(self):
        rng = np.random.default_rng(4)
        n = rng.normal(size=(20, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        z = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (20, 1))
        q = transforms.compute_rot(z, jnp.asarray(n))
        R = transforms.build_rotation(q)
        aligned = np.einsum("nij,j->ni", np.asarray(R), np.array([0.0, 0.0, 1.0]))
        dots = np.sum(aligned * n, axis=-1)
        assert np.all(dots > 0.999)

    def test_transform_map(self):
        pts = jnp.ones((4, 5, 3))
        R = jnp.eye(3) * 2.0
        t = jnp.asarray([1.0, 0.0, 0.0])
        out = transforms.transform_map(pts, R, t)
        np.testing.assert_allclose(np.asarray(out[0, 0]), [3.0, 2.0, 2.0], atol=1e-6)

    def test_incident_angle_center_pixel(self):
        # at the principal point the ray is +z; a +z normal gives |cos| = 1
        nmap = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (9, 9, 1))
        intr = jnp.asarray([10.0, 10.0, 4.0, 4.0])
        cos = transforms.compute_incident_angle(nmap, intr)
        assert abs(float(cos[4, 4, 0]) - 1.0) < 1e-5

    def test_confidence_peak_at_center(self):
        coords = jnp.stack(jnp.meshgrid(jnp.arange(5.0), jnp.arange(5.0), indexing="ij"), -1)
        conf = transforms.compute_confidence(coords, jnp.asarray([2.0, 2.0]), 400, 0.72)
        assert float(conf[2, 2]) == pytest.approx(1.0)
        assert float(conf[0, 0]) < 1.0
