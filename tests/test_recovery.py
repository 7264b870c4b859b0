"""Tracking-loss recovery and NaN sentinels (VERDICT r1 #7, #8).

The reference free-runs after a dense+sparse tracking failure (its fallback
commits the seed delta each frame with no re-anchor, `/root/reference/src/
core/tracker.py:153-170`) and hard-exits on NaN loss (`mapper.py:440-442`).
Here: after `Tracking.recover_after` consecutive non-converged dense solves
the system re-anchors the model view to the last keyframe, and
`System.check_nan` turns on loss/keyframe-map validation that raises.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from eggfusion_tpu import config as cfglib
from eggfusion_tpu.core.frame import Frame
from eggfusion_tpu.main import build_frame
from eggfusion_tpu.data.datasets import load_dataset
from eggfusion_tpu.system import EGGFusion, _cal_intrinsics
from eggfusion_tpu.utils import eval as evalu

W, H = 120, 90


def _cfg(tmp_path, n_frames, **system):
    return cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": n_frames,
            "preload": False,
            "Calibration": {
                "fx": 110.0, "fy": 110.0, "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "width": W, "height": H, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 6144},
        Tracking={"recover_after": 2},
        Mapping={"local_map_iter_init": 6, "local_map_iter": 2,
                 "sample_ratio": 0.05, "sample_ratio_init": 0.15},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": str(tmp_path / "run"), "root_dir": str(tmp_path),
                "final_global_opt": False, **system},
    )


def _corrupt_frame(uid, gt_pose, cfg):
    """A frame with depth dropout + textureless color: every ICP and RGB
    constraint is gated out, so the dense solve cannot converge."""
    return Frame(
        uid=uid, ts=uid * 0.05,
        color_u8=np.full((H, W, 3), 0.5, np.float32),
        depth_raw=np.zeros((H, W), np.float32),
        mask=np.ones((H, W), np.float32),
        gt_pose_w2c=np.asarray(gt_pose, np.float32),
        intr=_cal_intrinsics(cfg), depth_scale=1.0,
        nlevel=int(cfg.Tracking.pyramid_level), prefiltered=True,
    )


class TestRecovery:
    def test_recovers_after_tracking_loss(self, tmp_path):
        n = 16
        cfg = _cfg(tmp_path, n)
        dataset = load_dataset(cfg)
        ef = EGGFusion(cfg)
        ef.warmup()

        for fid in range(n):
            if 6 <= fid < 9:  # 3 corrupted frames: dense tracking must fail
                frame = _corrupt_frame(fid, dataset.poses[fid], cfg)
            else:
                frame = build_frame(dataset, fid, False)
            ef.reconstruct(frame)

        recs = [m for m in ef.metrics if "recovered_to_kf" in m]
        assert recs, "recovery never triggered"

        # trajectory over the GOOD frames stays bounded (no free-run blowup)
        good = [i for i in range(n) if not (6 <= i < 9)]
        ref = ef._traj_np("ref")[good][:, :3, 3]
        est = ef._traj_np("est")[good][:, :3, 3]
        ate = evalu.ate_rmse(ref, est)
        # free-running (no recovery) this scenario diverges to ~17 cm and
        # stays there; recovered it re-locks to ~2 cm and keeps improving
        assert ate < 3.0, f"ATE over good frames {ate} cm"

    def test_no_recovery_on_clean_sequence(self, tmp_path):
        n = 10
        cfg = _cfg(tmp_path, n)
        dataset = load_dataset(cfg)
        ef = EGGFusion(cfg)
        ef.warmup()
        for fid in range(n):
            ef.reconstruct(build_frame(dataset, fid, False))
        assert not [m for m in ef.metrics if "recovered_to_kf" in m]


class TestNaNGuard:
    def test_nan_keyframe_map_raises(self, tmp_path):
        cfg = _cfg(tmp_path, 4, check_nan=True)
        dataset = load_dataset(cfg)
        ef = EGGFusion(cfg)
        ef.warmup()
        for fid in range(2):
            ef.reconstruct(build_frame(dataset, fid, False))
        km = ef.mapper.keyframe_manager
        kf = km.keyframes[km.ids()[-1]]
        kf.maps["color"] = jnp.asarray(kf.maps["color"]).at[0, 0, 0].set(jnp.nan)
        km.sliding_window.clear()
        km.sliding_window.append(kf)
        with pytest.raises(FloatingPointError, match="non-finite"):
            ef.mapper.frame_batch_optimization(None)

    def test_nan_guard_off_by_default(self, tmp_path):
        cfg = _cfg(tmp_path, 4)
        ef = EGGFusion(cfg)
        assert ef.mapper.debug_nan is False
