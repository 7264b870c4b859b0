"""End-to-end pipeline test on the synthetic corner scene.

The reference's only 'test' is running a downloaded benchmark (SURVEY.md §4);
here the full track->map->fuse->optimize loop runs on the analytic scene with
exact ground truth, validating trajectory accuracy and render quality with no
dataset download.
"""
import numpy as np
import pytest

from eggfusion_tpu import config as cfglib
from eggfusion_tpu.main import build_frame, run
from eggfusion_tpu.utils import eval as evalu


def _small_cfg(tmp_path, n_frames=8, only_mapping=False):
    return cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": n_frames,
            "preload": False,
            "Calibration": {
                "fx": 110.0, "fy": 110.0, "cx": 59.5, "cy": 44.5,
                "width": 120, "height": 90, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 6144},
        Mapping={"local_map_iter_init": 6, "local_map_iter": 2, "final_global_opt_iter": 4,
                 "sample_ratio": 0.05, "sample_ratio_init": 0.15},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"only_mapping": only_mapping, "save_dir": str(tmp_path / "run"),
                "root_dir": str(tmp_path), "final_global_opt": True,
                "heldout_stride": 3},  # small run: held-out picks uid 1, 4, 7
    )


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = _small_cfg(tmp, n_frames=8)
    ef = run(cfg, verbose=False)
    return ef, cfg


class TestEndToEnd:
    def test_trajectory_accuracy(self, pipeline_run):
        ef, _ = pipeline_run
        ref = np.asarray(ef.traj["ref"])[:, :3, 3]
        est = np.asarray(ef.traj["est"])[:, :3, 3]
        ate = evalu.ate_rmse(ref, est)
        # synthetic sub-cm motion; tracked trajectory should be within ~1 cm
        assert ate < 1.0, f"ATE {ate} cm"

    def test_fusion_observability(self, pipeline_run):
        """Fused-pixel counts are logged per frame and are healthy (VERDICT
        r3 #5): fused collapsing to ~0 while spawns run hot was the round-2
        spawn-flood signature — this is the cheap canary for the next
        coverage regression."""
        ef, cfg = pipeline_run
        stats = ef.mapper.fusion_stats
        assert stats, "no fusion stats were consumed"
        H = int(cfg.Dataset.Calibration.height)
        W = int(cfg.Dataset.Calibration.width)
        later = [f for t, (f, _e) in stats.items() if t >= 2]
        assert later and max(later) > 0.05 * H * W, stats
        # surfaced into the per-frame metrics records too
        assert any("fused_px" in m for m in ef.metrics)

    def test_map_nonempty_and_bounded(self, pipeline_run):
        ef, cfg = pipeline_run
        n = int(ef.mapper.surfels.num_active())
        assert 100 < n <= cfg.Viewer.max_surfels_num

    def test_render_quality(self, pipeline_run):
        ef, _ = pipeline_run
        metrics = ef.evaluate_render()
        # tiny CPU-budget run (6 init iters, 8 frames): coarse but sane bounds;
        # full-scale quality is measured by bench/TPU runs
        assert metrics["psnr"] > 12.0, metrics
        assert metrics["depth_l1"] < 0.15, metrics

    def test_heldout_render_metrics(self, pipeline_run):
        """Held-out render evaluation (VERDICT r4 #5): renders scored at
        stored NON-keyframe tracked poses, reported alongside the (self-
        graded) keyframe section."""
        import json
        import os

        ef, _ = pipeline_run
        ef.evaluate_render()
        with open(os.path.join(ef.save_dir, "render_metrics.json")) as f:
            rep = json.load(f)
        held = rep["held_out"]
        assert held and held["n_frames"] >= 1, rep.keys()
        kf_uids = set(ef.mapper.keyframe_manager.keyframes.keys())
        for row in held["per_frame"]:
            assert row["frame"] not in kf_uids  # truly non-training views
        assert np.isfinite(held["mean"]["psnr"]) and held["mean"]["psnr"] > 10.0
        assert held["mean"]["depth_l1"] < 0.2

    def test_recon_metrics(self, pipeline_run):
        import os

        ef, _ = pipeline_run
        rep = ef.evaluate_recon(thresh=0.02)
        # the fused map should lie on the observed surfaces: most surfel
        # centers within 2 cm of the depth cloud and vice versa
        assert rep["recon_f1"] > 0.7, rep
        assert rep["recon_acc_mean"] < 0.05, rep
        assert os.path.exists(os.path.join(ef.save_dir, "recon_metrics.json"))

    def test_artifacts_written(self, pipeline_run):
        import os

        ef, _ = pipeline_run
        assert os.path.exists(os.path.join(ef.save_dir, "final_surfels.ply"))
        assert os.path.exists(os.path.join(ef.save_dir, "checkpoint.npz"))
        ate = ef.evaluate_trajectory(plot=False)
        assert os.path.exists(os.path.join(ef.save_dir, "trajectory_est_tum.txt"))
        assert np.isfinite(ate)

    def test_reload_from_ply(self, pipeline_run, tmp_path):
        import os

        from eggfusion_tpu.system import EGGFusion

        ef, cfg = pipeline_run
        path = os.path.join(ef.save_dir, "final_surfels.ply")
        ef2 = EGGFusion(cfg)
        ef2.reload(path)
        assert int(ef2.mapper.surfels.num_active()) == int(ef.mapper.surfels.num_active())

    def test_checkpoint_resume(self, pipeline_run):
        import os

        from eggfusion_tpu.io import checkpoint as ckpt

        ef, _ = pipeline_run
        s2, extra = ckpt.load_checkpoint(os.path.join(ef.save_dir, "checkpoint.npz"))
        assert int(s2.num_active()) == int(ef.mapper.surfels.num_active())
        assert extra["traj_est"].shape[0] == len(ef.traj["est"])

    def test_system_resume_continues_run(self, pipeline_run, tmp_path):
        """A resumed system picks up the full SoA, clock, trajectory, and a
        rebuilt model_map, and can keep reconstructing new frames."""
        import os

        from eggfusion_tpu.data.datasets import load_dataset
        from eggfusion_tpu.system import EGGFusion

        ef, cfg = pipeline_run
        cfg2 = cfglib.Config.wrap(cfg.to_plain())
        cfg2.System.save_dir = str(tmp_path / "resumed")
        cfg2.Dataset.n_frames = 10
        ef2 = EGGFusion(cfg2)
        ef2.resume(os.path.join(ef.save_dir, "checkpoint.npz"))
        assert ef2.mapper.time == ef.mapper.time
        assert int(ef2.mapper.surfels.num_active()) == int(ef.mapper.surfels.num_active())
        assert ef2.model_map is not None and "pyramid" in ef2.model_map

        dataset = load_dataset(cfg2)
        for fid in (8, 9):
            ef2.reconstruct(build_frame(dataset, fid, False))
        assert len(ef2.traj["est"]) == 10
        ref = ef2._traj_np("ref")[:, :3, 3]
        est = ef2._traj_np("est")[:, :3, 3]
        assert evalu.ate_rmse(ref, est) < 1.0


class TestOnlyMapping:
    def test_gt_pose_mapping(self, tmp_path):
        cfg = _small_cfg(tmp_path, n_frames=4, only_mapping=True)
        ef = run(cfg, verbose=False)
        ref = np.asarray(ef.traj["ref"])
        est = np.asarray(ef.traj["est"])
        np.testing.assert_allclose(est, ref, atol=1e-5)  # GT poses passed through


class TestHalfModelView:
    def test_model_view_down2(self, tmp_path):
        """Tracking.model_view_down=2 (round 5b): the spawn/tracking model
        view renders at half resolution and dense tracking pairs it with
        the frame pyramid one octave down. The e2e contract must hold —
        trajectory within the same bound as the full-res run — and the
        model pyramid's base level must actually be half-size."""
        cfg = _small_cfg(tmp_path, n_frames=8)
        cfg.Tracking.model_view_down = 2
        cfg.Tracking.solver_stride = 1  # half-res stride-1 ~= full-res stride-2
        ef = run(cfg, verbose=False)
        ref = np.asarray(ef.traj["ref"])[:, :3, 3]
        est = np.asarray(ef.traj["est"])[:, :3, 3]
        assert evalu.ate_rmse(ref, est) < 1.0
        H = int(cfg.Dataset.Calibration.height)
        W = int(cfg.Dataset.Calibration.width)
        base = ef.model_map["pyramid"][0]
        assert base.intensity.shape[:2] == (H // 2, W // 2)
        # frames carry the extra level the tracker pairs against
        assert ef.nlevel_frame == ef.nlevel + 1
        # full-res eval renders are untouched by the half-res model view
        metrics = ef.evaluate_render()
        assert metrics["psnr"] > 12.0, metrics


class TestBurstSchedule:
    def test_reference_exact_burst_schedule(self, tmp_path):
        """`opt_schedule: burst` is the reference-exact optimization cadence
        (all local_map_iter x |window| steps at every sw_optimize_freq-th
        frame, `/root/reference/src/core/mapper.py:180-195`); the amortized
        default is a deviation (VERDICT r2 weak #5). Keep the burst path
        alive and equivalent in quality on the synthetic scene."""
        cfg = _small_cfg(tmp_path, n_frames=8)
        cfg.Mapping.opt_schedule = "burst"
        ef = run(cfg, verbose=False)
        ref = np.asarray(ef.traj["ref"])[:, :3, 3]
        est = np.asarray(ef.traj["est"])[:, :3, 3]
        assert evalu.ate_rmse(ref, est) < 1.0
        metrics = ef.evaluate_render()
        assert metrics["psnr"] > 12.0, metrics
        assert metrics["depth_l1"] < 0.15, metrics
