import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.core import surfels as sf
from eggfusion_tpu.ops import raster_common as rc
from eggfusion_tpu.ops.raster_xla import render_xla

W, H = 64, 48
INTR = jnp.asarray([60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5])


def _single_surfel_params(xyz=(0.0, 0.0, 2.0), normal=(0.0, 0.0, -1.0), color=(1.0, 0.0, 0.0),
                          scale=0.3, opacity=0.99, n_pad=4):
    """Build render params for one surfel (+ inactive padding)."""
    from eggfusion_tpu.core.surfels import SpawnBatch, append_surfels

    cfg = sf.SurfelConfig(capacity=n_pad, max_sh_degree=0, active_sh_degree=0)
    s = sf.SurfelMap.empty(cfg)
    lam = jnp.asarray([[100.0, 100.0]])
    batch = SpawnBatch(
        xyz=jnp.asarray([xyz]),
        normal=jnp.asarray([normal]),
        color=jnp.asarray([color]),
        dist=jnp.asarray([[scale, scale, 0.0]]),
        eta=jnp.zeros((1, 6)),
        sigma2=1.0 / lam,
        valid=jnp.asarray([True]),
    )
    s = append_surfels(s, batch, jnp.int32(0), opacity)
    return sf.render_params(s), s


class TestProjection:
    def test_center_projection(self):
        params, _ = _single_surfel_params()
        proj = rc.project_surfels(params, jnp.eye(4), INTR, W, H, sh_degree=0)
        np.testing.assert_allclose(np.asarray(proj.mean2d[:, 0]), [W / 2 - 0.5, H / 2 - 0.5], atol=1e-4)
        assert float(proj.depth[0]) == 2.0
        assert bool(proj.valid[0])
        assert not bool(proj.valid[1])  # padding inactive

    def test_behind_camera_culled(self):
        params, _ = _single_surfel_params(xyz=(0.0, 0.0, -2.0))
        proj = rc.project_surfels(params, jnp.eye(4), INTR, W, H, sh_degree=0)
        assert not bool(proj.valid[0])

    def test_normal_faces_camera(self):
        params, _ = _single_surfel_params(normal=(0.0, 0.0, 1.0))  # away from cam
        proj = rc.project_surfels(params, jnp.eye(4), INTR, W, H, sh_degree=0)
        assert float(proj.normal_cam[2, 0]) < 0  # flipped toward camera


class TestRenderXLA:
    def test_single_surfel_center_color(self):
        params, _ = _single_surfel_params(color=(1.0, 0.2, 0.1), scale=0.4)
        out = render_xla(params, jnp.eye(4), INTR, W, H, sh_degree=0)
        cy, cx = H // 2, W // 2
        assert float(out["opacity"][cy, cx, 0]) > 0.9
        np.testing.assert_allclose(np.asarray(out["color"][cy, cx]), [1.0, 0.2, 0.1], atol=0.05)
        # depth at center = plane depth = 2.0
        np.testing.assert_allclose(float(out["depth"][cy, cx, 0]), 2.0, atol=1e-2)
        # corner: no surfel coverage
        assert float(out["opacity"][0, 0, 0]) < 0.05

    def test_plane_depth_is_geometric(self):
        """A tilted surfel's per-pixel depth follows the plane, not the center z."""
        n = np.array([0.5, 0.0, -0.866], np.float32)
        params, _ = _single_surfel_params(normal=tuple(n), scale=0.6)
        out = render_xla(params, jnp.eye(4), INTR, W, H, sh_degree=0)
        cy, cx = H // 2, W // 2
        off = 6
        d_left = float(out["depth"][cy, cx - off, 0])
        d_right = float(out["depth"][cy, cx + off, 0])
        # plane n.(p - p0) = 0 through (0,0,2): analytic depths
        def plane_depth(px):
            ray = np.array([(px - (W / 2 - 0.5)) / 60.0, 0.0, 1.0])
            return float(n @ np.array([0, 0, 2.0]) / (n @ ray))

        np.testing.assert_allclose(d_left, plane_depth(cx - off), rtol=0.02)
        np.testing.assert_allclose(d_right, plane_depth(cx + off), rtol=0.02)
        assert abs(d_left - d_right) > 0.02  # actually tilted

    def test_occlusion_order(self):
        """Near surfel must occlude far one regardless of input order."""
        from eggfusion_tpu.core.surfels import SpawnBatch, append_surfels

        cfg = sf.SurfelConfig(capacity=4, max_sh_degree=0, active_sh_degree=0)
        s = sf.SurfelMap.empty(cfg)
        batch = SpawnBatch(
            xyz=jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]]),  # far first
            normal=jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]),
            color=jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
            dist=jnp.asarray([[0.8, 0.8, 0.0], [0.4, 0.4, 0.0]]),
            eta=jnp.zeros((2, 6)),
            sigma2=jnp.ones((2, 2)),
            valid=jnp.asarray([True, True]),
        )
        s = append_surfels(s, batch, jnp.int32(0), 0.99)
        out = render_xla(sf.render_params(s), jnp.eye(4), INTR, W, H, sh_degree=0)
        cy, cx = H // 2, W // 2
        # near (red) dominates the center
        assert float(out["color"][cy, cx, 0]) > 0.9
        assert float(out["color"][cy, cx, 1]) < 0.1
        np.testing.assert_allclose(float(out["depth"][cy, cx, 0]), 1.5, atol=0.05)

    def test_gradients_flow(self):
        params, s = _single_surfel_params(scale=0.4)

        def loss_fn(xyz):
            p = dict(params)
            p["xyz"] = xyz
            out = render_xla(p, jnp.eye(4), INTR, W, H, sh_degree=0)
            target = jnp.zeros((H, W, 3))
            return jnp.mean((out["color"] - target) ** 2)

        g = jax.grad(loss_fn)(params["xyz"])
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g[:, 0]).sum()) > 0  # active surfel gets gradient
        assert float(jnp.abs(g[:, 1:]).sum()) == 0  # inactive padding does not

    def test_gradcheck_opacity(self):
        """Finite-difference check of d(loss)/d(opacity)."""
        params, _ = _single_surfel_params(scale=0.4)
        target = jnp.full((H, W, 3), 0.3)

        def loss_fn(op):
            p = dict(params)
            p["opacity"] = op
            out = render_xla(p, jnp.eye(4), INTR, W, H, sh_degree=0)
            return jnp.mean((out["color"] - target) ** 2)

        op0 = params["opacity"]
        g = jax.grad(loss_fn)(op0)
        eps = 1e-3
        dv = jnp.zeros_like(op0).at[0, 0].set(eps)
        fd = (loss_fn(op0 + dv) - loss_fn(op0 - dv)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=0.05, atol=1e-7)
