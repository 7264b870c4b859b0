import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.core import surfels as sf
from eggfusion_tpu.ops import fusion

W, H = 32, 24
INTR = jnp.asarray([30.0, 30.0, W / 2 - 0.5, H / 2 - 0.5])
CFG = sf.SurfelConfig(capacity=32, max_sh_degree=0, active_sh_degree=0, alpha_p=1.0, alpha_n=0.5)


def _map_with(xyzs, normals=None, colors=None, sigma2=None):
    n = len(xyzs)
    normals = normals or [[0.0, 0.0, -1.0]] * n
    colors = colors or [[0.5, 0.5, 0.5]] * n
    lam = np.full((n, 2), 1.0) if sigma2 is None else 1.0 / np.asarray(sigma2)
    xyz = np.asarray(xyzs, np.float32)
    nrm = np.asarray(normals, np.float32)
    batch = sf.SpawnBatch(
        xyz=jnp.asarray(xyz),
        normal=jnp.asarray(nrm),
        color=jnp.asarray(colors, jnp.float32),
        dist=jnp.full((n, 3), 0.05),
        eta=jnp.asarray(np.concatenate([xyz * lam[:, :1], nrm * lam[:, 1:]], -1), jnp.float32),
        sigma2=jnp.asarray(1.0 / lam, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return sf.append_surfels(sf.SurfelMap.empty(CFG), batch, jnp.int32(0), 0.99)


class TestProjectToFrame:
    def test_index_map_and_depth(self):
        s = _map_with([[0.0, 0.0, 2.0]])
        imap, dbuf = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        cy, cx = H // 2, W // 2
        # cx-0.5 rounds to cx... center pixel: u = 30*0/2 + 15.5 = 15.5 -> 16
        hits = np.argwhere(np.asarray(imap) >= 0)
        assert len(hits) == 1
        y, x = hits[0]
        assert abs(y - cy) <= 1 and abs(x - cx) <= 1
        assert abs(float(dbuf[y, x]) - 2.0) < 1e-5

    def test_nearest_wins(self):
        s = _map_with([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]])
        imap, dbuf = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        y, x = np.argwhere(np.asarray(imap) >= 0)[0]
        assert int(imap[y, x]) == 1
        assert abs(float(dbuf[y, x]) - 1.5) < 1e-5

    def test_inactive_ignored(self):
        s = _map_with([[0.0, 0.0, 2.0]])
        s = sf.prune_surfels(s, jnp.ones(32, bool))
        imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        assert int(jnp.max(imap)) == -1


class TestFusion:
    def _frame(self, vertex_fn, normal=(0, 0, -1.0), color=(1.0, 0, 0), depth_val=2.0):
        vert = np.zeros((H, W, 3), np.float32)
        for y in range(H):
            for x in range(W):
                vert[y, x] = vertex_fn(x, y)
        nrm = np.tile(np.asarray(normal, np.float32), (H, W, 1))
        col = np.tile(np.asarray(color, np.float32), (H, W, 1))
        dep = np.full((H, W, 1), depth_val, np.float32)
        geo = np.ones((H, W, 1), bool)
        return jnp.asarray(vert), jnp.asarray(nrm), jnp.asarray(col), jnp.asarray(dep), jnp.asarray(geo)

    def test_information_filter_position_update(self):
        s = _map_with([[0.0, 0.0, 2.0]], sigma2=[[1.0, 1.0]])
        imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        # measurement at the surfel's pixel, offset by 1 cm in x
        vert, nrm, col, dep, geo = self._frame(lambda x, y: (0.01, 0.0, 2.0))
        s2, stats = fusion.fuse_surfels(s, imap, jnp.eye(4), INTR, vert, nrm, col, dep, geo, 0.1, CFG)
        assert int(stats.fused_pixels) == 1
        # information filter: lam_old = 1, lam_meas = 1/(2*1)^2 = 0.25
        # x_new = (eta_old + 0.25 * 0.01) / 1.25 in x; eta_old_x = 0
        expect_x = (0.0 + 0.25 * 0.01) / 1.25
        np.testing.assert_allclose(float(s2.xyz[0, 0]), expect_x, rtol=1e-4)
        # precision accumulated
        np.testing.assert_allclose(float(1.0 / s2.sigma2[0, 0]), 1.25, rtol=1e-5)
        assert int(s2.observe_count[0]) == 1

    def test_repeated_fusion_converges_to_measurement(self):
        s = _map_with([[0.05, 0.0, 2.0]], sigma2=[[1.0, 1.0]])
        vert, nrm, col, dep, geo = self._frame(lambda x, y: (0.0, 0.0, 2.0))
        for t in range(50):
            imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
            s, _ = fusion.fuse_surfels(s, imap, jnp.eye(4), INTR, vert, nrm, col, dep, geo, 0.2, CFG)
        assert abs(float(s.xyz[0, 0])) < 0.01  # pulled toward repeated measurement

    def test_distance_gate_counts_error(self):
        s = _map_with([[0.0, 0.0, 2.0]], sigma2=[[1.0, 1.0]])
        imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        vert, nrm, col, dep, geo = self._frame(lambda x, y: (0.0, 0.0, 3.0))  # 1 m off
        s2, stats = fusion.fuse_surfels(s, imap, jnp.eye(4), INTR, vert, nrm, col, dep, geo, 0.1, CFG)
        assert int(stats.fused_pixels) == 0
        assert int(s2.observe_count[0]) == 0
        assert int(s2.error_count[0]) == 1
        np.testing.assert_allclose(np.asarray(s2.xyz[:, 0]), [0, 0, 2.0], atol=1e-6)

    def test_stable_surfel_geometry_locked(self):
        s = _map_with([[0.0, 0.0, 2.0]], sigma2=[[1.0, 1.0]])
        s = s.replace(stable=s.stable.at[0].set(True))
        imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        vert, nrm, col, dep, geo = self._frame(lambda x, y: (0.02, 0.0, 2.0))
        s2, _ = fusion.fuse_surfels(s, imap, jnp.eye(4), INTR, vert, nrm, col, dep, geo, 0.1, CFG)
        np.testing.assert_allclose(np.asarray(s2.xyz[:, 0]), [0, 0, 2.0], atol=1e-6)
        assert int(s2.observe_count[0]) == 1  # still counted

    def test_prune_unstable(self):
        s = _map_with([[0.0, 0.0, 2.0], [1.0, 0.0, 2.0]])
        s = s.replace(error_count=s.error_count.at[0].set(20), observe_count=s.observe_count.at[0].set(1))
        s2 = fusion.prune_unstable(s, CFG, jnp.int32(5))
        assert not bool(s2.active[0])
        assert bool(s2.active[1])


class TestFuseFrame:
    def test_sort_winner_matches_imap_path(self):
        """fuse_frame (sort-based winner) == fuse_surfels (z-buffer imap)."""
        s = _map_with([[0.0, 0.0, 2.0], [0.02, 0.0, 2.0], [0.0, 0.0, 3.0],
                       [0.5, 0.3, 1.5], [-0.4, -0.2, 2.5]],
                      sigma2=[[1.0, 1.0]] * 5)
        rng = np.random.default_rng(1)
        vert = jnp.asarray(rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
                           + np.array([0, 0, 2.0], np.float32))
        nrm = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (H, W, 1))
        col = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
        dep = jnp.asarray(rng.uniform(1.5, 2.5, (H, W, 1)).astype(np.float32))
        geo = jnp.ones((H, W, 1), bool)
        imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        sA, stA = fusion.fuse_surfels(s, imap, jnp.eye(4), INTR, vert, nrm, col,
                                      dep, geo, 0.2, CFG)
        sB, stB = fusion.fuse_frame(s, jnp.eye(4), INTR, vert, nrm, col, dep, geo, 0.2, CFG)
        assert int(stA.fused_pixels) == int(stB.fused_pixels)
        np.testing.assert_allclose(np.asarray(sA.xyz), np.asarray(sB.xyz), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sA.observe_count), np.asarray(sB.observe_count))

    def test_winner_flags_nearest(self):
        s = _map_with([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]])
        winner, uc, vc = fusion.winner_flags(s.xyz, s.active, jnp.eye(4), INTR, W, H)
        w = np.asarray(winner)
        assert not w[0] and w[1]  # nearest wins


class TestMaintenance:
    """Live map maintenance wired into the pipeline (VERDICT r1 #3)."""

    def _mapping(self, prune_freq=2, compact_frag=0.0):
        from eggfusion_tpu import config as cfglib
        from eggfusion_tpu.core.mapper import Mapping
        from eggfusion_tpu.core.renderer import Renderer

        cfg = cfglib.default_config(
            Dataset={"Calibration": {"width": W, "height": H, "fx": 30.0, "fy": 30.0,
                                     "cx": W / 2 - 0.5, "cy": H / 2 - 0.5}},
            Viewer={"max_surfels_num": 64},
            Mapping={"prune_freq": prune_freq, "prune_max_age": 3,
                     "compact_frag": compact_frag},
            Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
            System={"capacity_bucketing": False},
        )
        return Mapping(cfg, Renderer(cfg, backend="xla"))

    def test_maintain_map_prunes_and_compacts(self):
        mp = self._mapping()
        s = _map_with([[0.0, 0.0, 2.0]] * 24)  # CFG capacity is 32
        # 9 error-dominated surfels, 15 healthy (observed, above error ratio)
        err = np.zeros(s.capacity, np.int32)
        err[:9] = 10
        obs = np.zeros(s.capacity, np.int32)
        obs[9:24] = 8
        s = s.replace(
            error_count=jnp.asarray(err), observe_count=jnp.asarray(obs),
        )
        mp.surfels = sf.grow_surfels(s, 64)
        mp.time = 30
        mp.maintain_map()
        assert int(mp.surfels.num_active()) == 15
        # compacted: watermark equals active count, so freed slots are reusable
        assert int(mp.surfels.count) == 15
        assert mp._known_count == 15

    def test_pruned_slots_reused_by_append(self):
        mp = self._mapping()
        s = _map_with([[0.0, 0.0, 2.0]] * 30)
        err = np.zeros(s.capacity, np.int32)
        err[:20] = 10
        obs = np.zeros(s.capacity, np.int32)
        obs[20:30] = 8  # healthy: observed enough to dodge the stale rule
        s = s.replace(error_count=jnp.asarray(err), observe_count=jnp.asarray(obs))
        mp.surfels = sf.grow_surfels(s, 64)
        mp.time = 30
        mp.maintain_map()
        watermark = int(mp.surfels.count)
        assert watermark == 10
        # a fresh append lands in the reclaimed slots, not past the old mark
        rng = np.random.default_rng(3)
        xyz = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
        nrm = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (5, 1))
        batch = sf.SpawnBatch(
            xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
            color=jnp.full((5, 3), 0.5), dist=jnp.full((5, 3), 0.05),
            eta=jnp.asarray(np.concatenate([xyz, nrm * 4.0], -1)),
            sigma2=jnp.full((5, 2), 0.25), valid=jnp.ones(5, bool),
        )
        s2 = sf.append_surfels(mp.surfels, batch, jnp.int32(31), 0.99)
        assert int(s2.count) == 15
        assert int(s2.num_active()) == 15


class TestDeferredMaintenance:
    """The live loop's maintenance path (maintain_map(defer=True) +
    _maintain_finish): prune dispatches immediately, but the compact
    decision consumes async count copies a frame later — so maintenance
    never blocks on a device round-trip mid-frame."""

    def test_prune_now_compact_next_frame(self):
        import jax.numpy as jnp

        mp = TestMaintenance()._mapping(compact_frag=0.0)
        s = _map_with([[0.0, 0.0, 2.0]] * 30)
        err = np.zeros(s.capacity, np.int32)
        err[:20] = 10
        obs = np.zeros(s.capacity, np.int32)
        obs[20:30] = 8
        s = s.replace(error_count=jnp.asarray(err), observe_count=jnp.asarray(obs))
        mp.surfels = sf.grow_surfels(s, 64)
        mp.time = 30
        mp.maintain_map(defer=True)
        # prune already applied on-device; compact NOT yet (watermark intact)
        assert int(mp.surfels.num_active()) == 10
        assert int(mp.surfels.count) == 30
        assert mp._maint_pending is not None

        # the copies are consumed only once count_lag+1 frames old — an
        # earlier read blocks on ~2 frames of device compute (the 209/222 ms
        # outliers of BENCH_r03; VERDICT r3 #2)
        mp.time = 31
        mp._maintain_finish()
        assert mp._maint_pending is not None  # too fresh: no-op, no block

        mp.time = 30 + mp.count_lag + 1
        mp._maintain_finish()
        assert mp._maint_pending is None
        assert int(mp.surfels.count) == 10  # compacted once the copies aged
        assert mp._known_count == 10
        assert mp._known_time == 30  # the consumed state predates frame 31


class TestLaggedCapacityGrowth:
    """`_ensure_capacity` consumes count readbacks with lag N (pipelined,
    like the tracker's converged flags) and must still never overflow: every
    frame newer than the consumed count gets a full spawn_cap budget."""

    def _mapping(self, capacity=1 << 16):
        from eggfusion_tpu import config as cfglib
        from eggfusion_tpu.core.mapper import Mapping
        from eggfusion_tpu.core.renderer import Renderer

        cfg = cfglib.default_config(
            Dataset={"Calibration": {"width": W, "height": H, "fx": 30.0, "fy": 30.0,
                                     "cx": W / 2 - 0.5, "cy": H / 2 - 0.5}},
            Viewer={"max_surfels_num": capacity},
            Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        )
        return Mapping(cfg, Renderer(cfg, backend="xla"))

    def test_growth_budgets_margin_over_consumed_count(self):
        """Round-4 budget policy: capacity = freshest consumed count +
        `_spawn_margin` (plus the init burst while nothing is consumed).
        Bursts that outrun the margin drop at capacity for the 1-2 frames
        until the lag-N count readback lands (documented drop-at-capacity
        policy), instead of the r3 policy of budgeting a full spawn_cap per
        unconsumed frame (which held the 131k-surfel bench map in a 524288
        bucket — 2x every O(capacity) cost)."""
        import jax.numpy as jnp

        mp = self._mapping()
        assert mp.bucketing
        cap0 = mp.surfels.capacity
        assert cap0 >= mp.mcfg.spawn_cap_init + mp._spawn_margin

        # a count ref from frame 0 that is NOT yet old enough to consume
        near_full = cap0 - mp._spawn_margin // 2
        mp._count_pending.append((0, jnp.int32(near_full)))
        mp.time = 1
        mp._ensure_capacity(first=False)
        assert mp._known_time == -1  # nothing consumed
        assert mp.surfels.capacity == cap0  # no growth on unconsumed refs

        # once the ref ages past the lag it is consumed and sizes the bucket
        mp.time = 2
        mp._ensure_capacity(first=False)
        assert mp._known_time == 0
        assert mp._known_count == near_full
        assert mp.surfels.capacity >= near_full + mp._spawn_margin

    def test_shrink_after_prune(self):
        """Shrink-on-compact: after maintenance leaves the live map far
        below its bucket, the SoA slices down a rung (the inverse of
        growth), re-earning the O(capacity) per-frame savings."""
        mp = self._mapping()
        big = mp._ladder[2] if len(mp._ladder) > 2 else mp.surfels.capacity
        mp.surfels = sf.grow_surfels(mp.surfels, big)
        # tiny live map at a huge bucket; watermark inside the small rung
        mp._maintain_decide(count=100, n_active=100, known_time=5)
        assert mp.surfels.capacity == mp._bucket(100 + 2 * mp._spawn_margin)
        assert mp.surfels.capacity < big


class TestSaturationRecovery:
    def test_saturated_map_with_prunable_surfels_accepts_spawns(self):
        """VERDICT r2 #5 (test part): a map pinned at capacity whose
        surfels are partly prunable must, after maintenance (prune +
        compact), accept new spawns again — spawns at a full watermark are
        silently dropped by design, so maintenance is what keeps a
        long-running map live."""
        import jax.numpy as jnp
        import numpy as np

        from eggfusion_tpu.core import surfels as sf
        from eggfusion_tpu.ops import fusion

        C = 1024
        cfg = sf.SurfelConfig(capacity=C, max_sh_degree=0, active_sh_degree=0)
        s = sf.SurfelMap.empty(cfg)
        rng = np.random.default_rng(3)
        xyz = rng.uniform(-1, 1, (C, 3)).astype(np.float32)
        nrm = np.tile([0.0, 0.0, -1.0], (C, 1)).astype(np.float32)
        batch = sf.SpawnBatch(
            xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
            color=jnp.asarray(rng.uniform(size=(C, 3)).astype(np.float32)),
            dist=jnp.full((C, 3), 0.02), eta=jnp.zeros((C, 6)),
            sigma2=jnp.ones((C, 2)), valid=jnp.ones(C, bool),
        )
        s = sf.append_surfels(s, batch, jnp.int32(0), 0.9)
        assert int(np.asarray(s.count)) == C  # watermark at capacity

        # saturated: a fresh spawn batch is silently dropped
        s2 = sf.append_surfels(s, batch, jnp.int32(1), 0.9)
        assert int(s2.num_active()) == C

        # make 1/4 of the map prunable: old, unstable, never-confirmed
        idx = np.arange(0, C, 4)
        s = s.replace(
            tic=s.tic.at[idx].set(0),
            observe_count=s.observe_count.at[idx].set(0),
            stable=s.stable.at[idx].set(False),
        )
        t = jnp.int32(100)  # age 100 > max_age
        s = fusion.prune_unstable(s, cfg, t, max_age=30)
        n_after_prune = int(s.num_active())
        assert n_after_prune <= C - len(idx) + 8

        s = sf.compact_surfels(s)
        assert int(np.asarray(s.count)) == n_after_prune  # watermark dropped

        # spawns land again, reusing the freed slots
        K = 256
        batch2 = sf.SpawnBatch(
            xyz=jnp.asarray(xyz[:K]), normal=jnp.asarray(nrm[:K]),
            color=jnp.asarray(rng.uniform(size=(K, 3)).astype(np.float32)),
            dist=jnp.full((K, 3), 0.02), eta=jnp.zeros((K, 6)),
            sigma2=jnp.ones((K, 2)), valid=jnp.ones(K, bool),
        )
        s = sf.append_surfels(s, batch2, jnp.int32(101), 0.9)
        assert int(s.num_active()) == n_after_prune + K
