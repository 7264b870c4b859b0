"""Pallas tile rasterizer vs the golden XLA compositor.

On CPU the kernel runs in interpreter mode; the same code path compiles via
Mosaic on TPU (covered by bench / TPU runs). Comparisons mask to pixels with
meaningful coverage: the fixed KSUB*KY sub-column footprint window truncates
oversized splats at fringe pixels whose normalized depth/normal then differ
from the golden render by design (raster_pallas.py module docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggfusion_tpu.core import surfels as sf
from eggfusion_tpu.ops.raster_xla import render_xla
from eggfusion_tpu.ops.raster_pallas import render_pallas

W, H = 160, 96
INTR = jnp.asarray([100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5])
# capacity is per 32-px SUB-COLUMN (CAP / N_SUB slots); the central
# sub-columns of this scene carry up to 33 entries, so CAP=256 (64 slots)
# keeps the parity fixtures clear of the documented farthest-drop overflow
CAP = 256


def _random_scene(n=64, seed=0, scale_range=(0.01, 0.045)):
    # scale_range keeps 3-sigma radii <= ~13.5 px at f=100/z>=1 — inside the
    # KSUB*KY window's guaranteed-coverage radius of 15.5 px (production
    # splats are ~6-10 px; larger ones truncate by documented policy)
    rng = np.random.default_rng(seed)
    cfg = sf.SurfelConfig(capacity=2 * n, max_sh_degree=0, active_sh_degree=0)
    s = sf.SurfelMap.empty(cfg)
    xyz = np.concatenate(
        [rng.uniform(-0.6, 0.6, (n, 2)), rng.uniform(1.0, 3.0, (n, 1))], -1
    ).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    batch = sf.SpawnBatch(
        xyz=jnp.asarray(xyz),
        normal=jnp.asarray(nrm),
        color=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        dist=jnp.asarray(rng.uniform(*scale_range, (n, 3)).astype(np.float32)),
        eta=jnp.zeros((n, 6)),
        sigma2=jnp.ones((n, 2)),
        valid=jnp.ones(n, bool),
    )
    return sf.append_surfels(s, batch, jnp.int32(0), 0.95)


@pytest.fixture(scope="module")
def scene():
    s = _random_scene()
    params = sf.render_params(s)
    out_x = render_xla(params, jnp.eye(4), INTR, W, H, sh_degree=0)
    out_p = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP)
    return s, params, out_x, out_p


class TestForwardParity:
    def test_color_opacity_exact(self, scene):
        _, _, out_x, out_p = scene
        np.testing.assert_allclose(np.asarray(out_p["color"]), np.asarray(out_x["color"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_p["opacity"]), np.asarray(out_x["opacity"]), atol=1e-5)

    def test_depth_normal_on_covered_pixels(self, scene):
        _, _, out_x, out_p = scene
        mask = np.asarray(out_x["opacity"][..., 0]) > 0.05
        dd = np.abs(np.asarray(out_p["depth"] - out_x["depth"])[mask])
        dn = np.abs(np.asarray(out_p["normal"] - out_x["normal"])[mask])
        assert dd.max() < 1e-3
        assert dn.max() < 1e-4

    def test_output_shapes(self, scene):
        _, _, _, out_p = scene
        assert out_p["color"].shape == (H, W, 3)
        assert out_p["normal"].shape == (H, W, 3)
        assert out_p["depth"].shape == (H, W, 1)
        assert out_p["opacity"].shape == (H, W, 1)


class TestGradParity:
    def test_grads_match_golden(self, scene):
        s, params, _, _ = scene

        def make_loss(render):
            def loss(xyz, opacity, shs):
                p = dict(params)
                p["xyz"] = xyz
                p["opacity"] = opacity
                p["shs"] = shs
                o = render(p)
                return (
                    jnp.mean(jnp.abs(o["color"] - 0.3))
                    + jnp.mean(jnp.abs(o["depth"] - 1.5))
                    + jnp.mean(o["normal"] ** 2)
                    + jnp.mean(o["opacity"])
                )

            return loss

        rx = lambda p: render_xla(p, jnp.eye(4), INTR, W, H, sh_degree=0)
        rp = lambda p: render_pallas(p, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP)
        args = (params["xyz"], params["opacity"], params["shs"])
        gx = jax.grad(make_loss(rx), argnums=(0, 1, 2))(*args)
        gp = jax.grad(make_loss(rp), argnums=(0, 1, 2))(*args)
        for a, b in zip(gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            assert np.abs(a - b).max() < 2e-4 * max(scale, 1.0), (np.abs(a - b).max(), scale)

    def test_inactive_padding_gets_no_gradient(self, scene):
        s, params, _, _ = scene

        def loss(xyz):
            p = dict(params)
            p["xyz"] = xyz
            o = render_pallas(p, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP)
            return jnp.mean(o["color"] ** 2)

        g = np.asarray(jax.grad(loss)(params["xyz"]))
        n_active = int(s.num_active())
        assert np.all(np.isfinite(g))
        assert np.abs(g[:, n_active:]).sum() == 0.0


class TestOcclusion:
    def test_near_occludes_far(self):
        cfg = sf.SurfelConfig(capacity=4, max_sh_degree=0, active_sh_degree=0)
        s = sf.SurfelMap.empty(cfg)
        batch = sf.SpawnBatch(
            xyz=jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]]),  # far first
            normal=jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]),
            color=jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
            dist=jnp.asarray([[0.3, 0.3, 0.0], [0.15, 0.15, 0.0]]),
            eta=jnp.zeros((2, 6)),
            sigma2=jnp.ones((2, 2)),
            valid=jnp.asarray([True, True]),
        )
        s = sf.append_surfels(s, batch, jnp.int32(0), 0.99)
        out = render_pallas(sf.render_params(s), jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP)
        cy, cx = H // 2, W // 2
        assert float(out["color"][cy, cx, 0]) > 0.9  # near red wins
        assert float(out["color"][cy, cx, 1]) < 0.1
        np.testing.assert_allclose(float(out["depth"][cy, cx, 0]), 1.5, atol=0.05)


class TestCachedBinning:
    def test_precomputed_binning_matches(self, scene):
        """A render with a precomputed Binning equals the self-binned render
        (the cache is what window optimization reuses across Adam steps)."""
        from eggfusion_tpu.ops.raster_pallas import compute_binning

        _, params, _, out_p = scene
        b = compute_binning(params, jnp.eye(4), INTR, W, H, cap=CAP)
        out_c = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP, binning=b)
        for k in ("color", "normal", "depth", "opacity"):
            np.testing.assert_allclose(np.asarray(out_c[k]), np.asarray(out_p[k]), atol=1e-6)

    def test_grads_with_cached_binning(self, scene):
        from eggfusion_tpu.ops.raster_pallas import compute_binning

        _, params, _, _ = scene
        b = compute_binning(params, jnp.eye(4), INTR, W, H, cap=CAP)

        def loss(xyz, binning):
            p = dict(params)
            p["xyz"] = xyz
            o = render_pallas(p, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP, binning=binning)
            return jnp.mean(jnp.abs(o["color"] - 0.3)) + jnp.mean(o["depth"])

        g_cached = np.asarray(jax.grad(loss)(params["xyz"], b))
        g_fresh = np.asarray(jax.grad(loss)(params["xyz"], None))
        np.testing.assert_allclose(g_cached, g_fresh, atol=1e-6)


class TestCapacityOverflow:
    def test_overflow_keeps_nearest(self):
        """With CAP smaller than the per-tile load, the nearest surfels are
        kept (depth-ordered entries), so a saturated pixel stays correct."""
        n = 40
        rng = np.random.default_rng(3)
        cfg = sf.SurfelConfig(capacity=n, max_sh_degree=0, active_sh_degree=0)
        s = sf.SurfelMap.empty(cfg)
        z = np.linspace(1.0, 3.0, n)[:, None].astype(np.float32)
        xyz = np.concatenate([np.zeros((n, 2), np.float32), z], -1)
        batch = sf.SpawnBatch(
            xyz=jnp.asarray(xyz),
            normal=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1)),
            color=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)).at[0].set(jnp.asarray([1.0, 0.0, 0.0])),
            dist=jnp.full((n, 3), 0.2),
            eta=jnp.zeros((n, 6)),
            sigma2=jnp.ones((n, 2)),
            valid=jnp.ones(n, bool),
        )
        s = sf.append_surfels(s, batch, jnp.int32(0), 0.99)
        params = sf.render_params(s)
        out_full = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=128)
        out_cut = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=32)
        cy, cx = H // 2, W // 2
        # with opacity 0.99, the front few surfels decide the pixel
        np.testing.assert_allclose(
            np.asarray(out_cut["color"][cy, cx]), np.asarray(out_full["color"][cy, cx]), atol=1e-4
        )


class TestTileSubset:
    """Tile-subset rendering (stochastic map optimization)."""

    def test_keep_all_matches_full(self, scene):
        _, params, _, out_p = scene
        from eggfusion_tpu.ops.raster_pallas import n_tiles_static

        keep = jnp.ones((n_tiles_static(W, H),), bool)
        out_k = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP,
                              tile_keep=keep)
        for k in ("color", "depth", "normal", "opacity"):
            np.testing.assert_allclose(np.asarray(out_k[k]), np.asarray(out_p[k]), atol=1e-6)

    def test_dropped_tiles_render_zero_and_kept_match(self, scene):
        _, params, _, out_p = scene
        from eggfusion_tpu.ops.raster_pallas import n_tiles_static, tile_pixel_mask

        nt = n_tiles_static(W, H)
        keep = jnp.asarray(np.arange(nt) % 2 == 0)
        out_k = render_pallas(params, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP,
                              tile_keep=keep)
        pm = np.asarray(tile_pixel_mask(keep, W, H))
        assert pm.shape == (H, W)
        # kept pixels identical to the full render; dropped pixels zero
        np.testing.assert_allclose(
            np.asarray(out_k["color"])[pm], np.asarray(out_p["color"])[pm], atol=1e-6
        )
        assert np.abs(np.asarray(out_k["opacity"])[~pm]).max() == 0.0

    def test_subset_gradients_match_masked_full(self, scene):
        """d/dp [masked loss over kept pixels] must be identical whether the
        dropped tiles were composited or not."""
        _, params, _, _ = scene
        from eggfusion_tpu.ops.raster_pallas import n_tiles_static, tile_pixel_mask

        nt = n_tiles_static(W, H)
        keep = jnp.asarray(np.arange(nt) % 2 == 0)
        pm = tile_pixel_mask(keep, W, H)[..., None]

        def loss(xyz, tk):
            p = dict(params)
            p["xyz"] = xyz
            o = render_pallas(p, jnp.eye(4), INTR, W, H, sh_degree=0, cap=CAP,
                              tile_keep=tk)
            return jnp.sum(jnp.where(pm, jnp.abs(o["color"] - 0.3), 0.0))

        g_sub = np.asarray(jax.grad(loss)(params["xyz"], keep))
        g_full = np.asarray(jax.grad(loss)(params["xyz"], None))
        np.testing.assert_allclose(g_sub, g_full, atol=1e-5)
