import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.ops import image as imops
from eggfusion_tpu.ops import pyramid as pyr


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestVertexNormal:
    def test_vertex_backprojection(self):
        depth = jnp.full((8, 10), 2.0)
        intr = jnp.asarray([5.0, 5.0, 4.5, 3.5])
        v = imops.vertex_from_depth(depth, intr)
        # pixel (y=3, x=4): X=(4-4.5)*2/5, Y=(3-3.5)*2/5, Z=2
        np.testing.assert_allclose(np.asarray(v[3, 4]), [-0.2, -0.2, 2.0], atol=1e-6)

    def test_normal_of_flat_plane_is_minus_z(self):
        # A fronto-parallel plane: v01-v00 ~ +y, v10-v00 ~ +x, cross(y, x) = -z
        depth = jnp.full((8, 10), 2.0)
        intr = jnp.asarray([5.0, 5.0, 4.5, 3.5])
        _, n = imops.compute_vertex_and_normal(depth, intr)
        np.testing.assert_allclose(np.asarray(n[2, 2]), [0.0, 0.0, -1.0], atol=1e-5)

    def test_normal_zero_on_degenerate(self):
        depth = jnp.zeros((6, 6))
        intr = jnp.asarray([5.0, 5.0, 2.5, 2.5])
        _, n = imops.compute_vertex_and_normal(depth, intr)
        assert np.all(np.isfinite(np.asarray(n)))
        np.testing.assert_allclose(np.asarray(n[5, 5]), 0.0, atol=1e-7)


class TestGradient:
    def test_scharr_ramp(self):
        # ramp in x: grad_x should equal slope * (2*0.52201 + 0.79451) * 2
        H, W = 10, 12
        img = jnp.asarray(np.tile(np.arange(W, dtype=np.float32), (H, 1)))
        gx, gy = imops.scharr_gradient(img)
        expected = 2 * (2 * 0.52201 + 0.79451)
        np.testing.assert_allclose(np.asarray(gx[5, 5]), expected, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gy[5, 5]), 0.0, atol=1e-5)

    def test_diff_gradients_match_reference_semantics(self):
        d = jnp.asarray(_rng(1).normal(size=(6, 7)).astype(np.float32))
        gx, gy = imops.diff_gradients(d)
        ref_gx = np.diff(np.asarray(d), axis=1, append=np.asarray(d)[:, -1:])
        ref_gy = np.diff(np.asarray(d), axis=0, append=np.asarray(d)[-1:, :])
        np.testing.assert_allclose(np.asarray(gx), ref_gx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy), ref_gy, atol=1e-6)


class TestFilters:
    def test_downsample_shape_and_constancy(self):
        img = jnp.full((12, 16, 3), 5.0)
        out = imops.gaussian_downsample(img)
        assert out.shape == (6, 8, 3)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-5)

    def test_downsample_matches_naive(self):
        """Cross-check against a literal port of the CUDA loop."""
        rng = _rng(2)
        img = rng.normal(size=(10, 14, 1)).astype(np.float32)
        out = np.asarray(imops.gaussian_downsample(jnp.asarray(img)))
        k = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32)
        H, W = img.shape[:2]
        ref = np.zeros((H // 2, W // 2, 1), np.float32)
        for y in range(H // 2):
            for x in range(W // 2):
                s = 0.0
                c = 0.0
                for dy in range(-2, 3):
                    for dx in range(-2, 3):
                        ny, nx = 2 * y + dy, 2 * x + dx
                        if 0 <= ny < H and 0 <= nx < W:
                            w = k[dy + 2, dx + 2]
                            s += img[ny, nx, 0] * w
                            c += w
                ref[y, x, 0] = s / c
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_bilateral_preserves_edges(self):
        img = np.ones((16, 16), np.float32)
        img[:, 8:] = 2.0
        out = np.asarray(imops.bilateral_filter(jnp.asarray(img), 13, 0.03, 4.5))
        # strong color sigma barrier: the step should survive almost exactly
        assert abs(out[8, 4] - 1.0) < 1e-3
        assert abs(out[8, 12] - 2.0) < 1e-3

    def test_bilateral_matches_naive(self):
        rng = _rng(3)
        img = (rng.normal(size=(9, 9)) * 0.01 + 1.0).astype(np.float32)
        out = np.asarray(imops.bilateral_filter(jnp.asarray(img), 5, 0.03, 4.5))
        inv_s = 1.0 / (2 * 4.5**2)
        inv_c = 1.0 / (2 * 0.03**2)
        H, W = img.shape
        ref = np.zeros_like(img)
        for y in range(H):
            for x in range(W):
                s1 = s2 = 0.0
                for dy in range(-2, 3):
                    for dx in range(-2, 3):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < H and 0 <= nx < W:
                            dc = img[y, x] - img[ny, nx]
                            w = np.exp(-(dy * dy + dx * dx) * inv_s - dc * dc * inv_c)
                            s1 += img[ny, nx] * w
                            s2 += w
                ref[y, x] = s1 / s2
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_gaussian_filter_smooths(self):
        rng = _rng(4)
        img = rng.normal(size=(16, 16)).astype(np.float32)
        out = np.asarray(imops.gaussian_filter(jnp.asarray(img), 5, 2.0))
        assert out.std() < img.std()


class TestSampling:
    def test_bilinear_identity_grid(self):
        rng = _rng(5)
        img = jnp.asarray(rng.normal(size=(7, 9, 2)).astype(np.float32))
        H, W = 7, 9
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        coords = jnp.stack([2 * xs / (W - 1) - 1, 2 * ys / (H - 1) - 1], axis=-1)
        out = imops.bilinear_sample(img, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_bilinear_zeros_padding(self):
        img = jnp.ones((4, 4, 1))
        coords = jnp.asarray([[[-2.0, 0.0]]])  # far out of bounds
        out = imops.bilinear_sample(img, coords, padding="zeros")
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_nearest_border_padding(self):
        img = jnp.arange(16.0).reshape(4, 4, 1)
        coords = jnp.asarray([[[-2.0, -2.0]]])
        out = imops.nearest_sample(img, coords, padding="border")
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # clamps to (0,0)


class TestPyramid:
    def test_build_shapes(self):
        rng = _rng(6)
        H, W = 32, 48
        color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
        depth = jnp.asarray((rng.uniform(size=(H, W, 1)) + 1.0).astype(np.float32))
        mask = jnp.ones((H, W, 1), jnp.float32)
        intr = jnp.asarray([30.0, 30.0, W / 2 - 0.5, H / 2 - 0.5])
        p = pyr.build_pyramid(color, depth, mask, intr, nlevel=3)
        assert len(p) == 3
        assert p[0].intensity.shape == (H, W, 1)
        assert p[1].intensity.shape == (H // 2, W // 2, 1)
        assert p[2].vertex.shape == (H // 4, W // 4, 3)
        np.testing.assert_allclose(np.asarray(p[1].intr), np.asarray(intr) / 2, atol=1e-6)
        # masks: valid depth > 0.1 everywhere
        assert bool(jnp.all(p[0].mask))

    def test_gray_uses_reference_coefficients(self):
        color = jnp.zeros((4, 4, 3)).at[..., 0].set(1.0)  # pure "R" channel
        depth = jnp.ones((4, 4, 1))
        mask = jnp.ones((4, 4, 1))
        intr = jnp.asarray([2.0, 2.0, 1.5, 1.5])
        p = pyr.build_pyramid(color, depth, mask, intr, nlevel=1)
        # reference quirk: R channel weighted by 0.114 (BGR coeffs on RGB input)
        np.testing.assert_allclose(np.asarray(p[0].intensity), 0.114, atol=1e-6)
