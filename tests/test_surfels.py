import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.core import surfels as sf


def _cfg(cap=64):
    return sf.SurfelConfig(capacity=cap, max_sh_degree=3, active_sh_degree=3)


def _batch(k, valid=None, seed=0):
    rng = np.random.default_rng(seed)
    n = rng.normal(size=(k, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(1.0, 3.0, size=(k,)).astype(np.float32)
    lam_p = 1.0 / (d * 1.0) ** 2
    lam_n = 1.0 / (d * 0.5) ** 2
    xyz = rng.normal(size=(k, 3)).astype(np.float32)
    return sf.SpawnBatch(
        xyz=jnp.asarray(xyz),
        normal=jnp.asarray(n),
        color=jnp.asarray(rng.uniform(size=(k, 3)).astype(np.float32)),
        dist=jnp.asarray(np.stack([0.01 * d, 0.01 * d, np.zeros_like(d)], -1)),
        eta=jnp.asarray(np.concatenate([xyz * lam_p[:, None], n * lam_n[:, None]], -1)),
        sigma2=jnp.asarray(np.stack([1 / lam_p, 1 / lam_n], -1)),
        valid=jnp.asarray(np.ones(k, bool) if valid is None else valid),
    )


class TestAppend:
    def test_append_counts(self):
        s = sf.SurfelMap.empty(_cfg())
        s = sf.append_surfels(s, _batch(10), jnp.int32(0), 0.99)
        assert int(s.count) == 10
        assert int(s.num_active()) == 10

    def test_append_masked(self):
        valid = np.zeros(10, bool)
        valid[[1, 4, 7]] = True
        s = sf.SurfelMap.empty(_cfg())
        s = sf.append_surfels(s, _batch(10, valid), jnp.int32(3), 0.99)
        assert int(s.count) == 3
        # appended compactly at the front, tic stamped
        np.testing.assert_array_equal(np.asarray(s.tic[:3]), 3)
        assert bool(jnp.all(s.active[:3]))
        assert not bool(jnp.any(s.active[3:]))

    def test_append_capacity_clamp(self):
        s = sf.SurfelMap.empty(_cfg(cap=8))
        s = sf.append_surfels(s, _batch(20), jnp.int32(0), 0.99)
        assert int(s.count) == 8
        assert int(s.num_active()) == 8

    def test_normal_roundtrip(self):
        """Appended surfel's derived normal equals the batch normal."""
        b = _batch(16, seed=2)
        s = sf.SurfelMap.empty(_cfg())
        s = sf.append_surfels(s, b, jnp.int32(0), 0.99)
        n_out = np.asarray(s.get_normal()[:, :16]).T
        n_in = np.asarray(b.normal)
        dots = np.sum(n_out * n_in, axis=-1)
        assert np.all(dots > 0.999)

    def test_color_roundtrip(self):
        b = _batch(8, seed=3)
        s = sf.SurfelMap.empty(_cfg())
        s = sf.append_surfels(s, b, jnp.int32(0), 0.99)
        np.testing.assert_allclose(np.asarray(s.get_color()[:, :8]).T, np.asarray(b.color), atol=1e-5)

    def test_opacity_activation(self):
        s = sf.append_surfels(sf.SurfelMap.empty(_cfg()), _batch(4), jnp.int32(0), 0.99)
        np.testing.assert_allclose(np.asarray(s.get_opacity()[0, :4]), 0.99, atol=1e-5)

    def test_confidence_matches_reference_formula(self):
        b = _batch(6, seed=4)
        s = sf.append_surfels(sf.SurfelMap.empty(_cfg()), b, jnp.int32(0), 0.99)
        conf = np.asarray(s.get_confidence()[:6])
        ref = np.sum(1.0 / np.asarray(b.sigma2), axis=-1)
        np.testing.assert_allclose(conf, ref, rtol=1e-5)


class TestPruneCompact:
    def test_prune_and_compact(self):
        s = sf.append_surfels(sf.SurfelMap.empty(_cfg()), _batch(12), jnp.int32(0), 0.99)
        kill = jnp.zeros(64, bool).at[jnp.asarray([0, 3, 5])].set(True)
        s = sf.prune_surfels(s, kill)
        assert int(s.num_active()) == 9
        xyz_live = np.asarray(s.xyz).T[np.asarray(s.active)]
        s2 = sf.compact_surfels(s)
        assert int(s2.count) == 9
        assert bool(jnp.all(s2.active[:9]))
        assert not bool(jnp.any(s2.active[9:]))
        np.testing.assert_allclose(np.sort(np.asarray(s2.xyz[:, :9]).T, 0), np.sort(xyz_live, 0), atol=1e-6)

    def test_append_after_compact(self):
        s = sf.append_surfels(sf.SurfelMap.empty(_cfg()), _batch(12), jnp.int32(0), 0.99)
        s = sf.prune_surfels(s, jnp.zeros(64, bool).at[:6].set(True))
        s = sf.compact_surfels(s)
        s = sf.append_surfels(s, _batch(5, seed=9), jnp.int32(2), 0.99)
        assert int(s.count) == 11
        assert int(s.num_active()) == 11


class TestJit:
    def test_append_is_jittable_and_stable_shape(self):
        cfg = _cfg()

        @jax.jit
        def step(s, b):
            return sf.append_surfels(s, b, jnp.int32(1), 0.99)

        s = sf.SurfelMap.empty(cfg)
        s = step(s, _batch(10))
        s = step(s, _batch(10, seed=1))
        assert int(s.count) == 20

    def test_update_stability(self):
        s = sf.append_surfels(sf.SurfelMap.empty(_cfg()), _batch(8), jnp.int32(0), 0.99)
        # crank confidence on slot 0
        s = s.replace(sigma2=s.sigma2.at[:, 0].set(0.01))
        s = sf.update_stability(s, threshold=10.0)
        assert bool(s.stable[0])


class TestGrow:
    def test_grow_preserves_content_and_extends(self):
        s = sf.SurfelMap.empty(_cfg(cap=64))
        s = sf.append_surfels(s, _batch(10), jnp.int32(0), 0.99)
        xyz_before = np.asarray(s.xyz[:, :10])
        g = sf.grow_surfels(s, 128)
        assert g.capacity == 128
        assert int(g.count) == 10
        assert int(g.num_active()) == 10
        np.testing.assert_array_equal(np.asarray(g.xyz[:, :10]), xyz_before)
        # padding slots are inert: inactive, identity-ish defaults
        assert not bool(np.asarray(g.active[64:]).any())
        np.testing.assert_array_equal(np.asarray(g.rotation[0, 64:]), 1.0)
        np.testing.assert_array_equal(np.asarray(g.sigma2[:, 64:]), 1.0)
        # appending continues at the watermark in the grown map
        g = sf.append_surfels(g, _batch(100, seed=1), jnp.int32(1), 0.99)
        assert int(g.count) == 110

    def test_grow_noop_when_not_larger(self):
        s = sf.SurfelMap.empty(_cfg(cap=64))
        g = sf.grow_surfels(s, 64)
        assert g.capacity == 64

    def test_grown_map_renders_like_padded_map(self):
        """Render output must not depend on which capacity bucket holds the
        same active surfels (inactive padding is inert)."""
        from eggfusion_tpu.ops.raster_xla import render_xla

        cfgA = _cfg(cap=32)
        s = sf.SurfelMap.empty(cfgA)
        b = _batch(12, seed=3)
        # place surfels in front of the camera
        b = b._replace(xyz=b.xyz + jnp.asarray([0.0, 0.0, 3.0]))
        s = sf.append_surfels(s, b, jnp.int32(0), 0.99)
        g = sf.grow_surfels(s, 256)
        intr = jnp.asarray([60.0, 60.0, 31.5, 23.5], jnp.float32)
        w2c = jnp.eye(4)
        outA = render_xla(sf.render_params(s), w2c, intr, 64, 48, sh_degree=3)
        outB = render_xla(sf.render_params(g), w2c, intr, 64, 48, sh_degree=3)
        for k in ("color", "normal", "depth", "opacity"):
            np.testing.assert_allclose(np.asarray(outA[k]), np.asarray(outB[k]), atol=1e-6)
