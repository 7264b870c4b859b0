"""Composed TUM-class end-to-end test (VERDICT r4 #7).

The reference's TUM path exercises FOUR features TOGETHER that previous
tests only covered separately (`/root/reference/configs/tum/fr1_desk.yaml`:
distortion coefficients + `configs/tum/base.yaml:11` `use_sparse: true`):

  1. radial-distortion undistortion remap (native loader),
  2. the sparse feature frontend seeding the dense solve (`use_sparse`),
  3. descriptor relocalization enabled (`reloc_descriptors`),
  4. the reference-exact burst optimization schedule.

This test composes all four on ONE on-disk TUM-format fixture: a 32-frame
textured handheld sequence with Kinect-style sensor noise, written as
radially DISTORTED images (forward lens model applied to the clean renders,
so the loader's undistortion must invert it before any geometry works).
"""
import os

import numpy as np
import pytest

from eggfusion_tpu import config as cfglib
from eggfusion_tpu.data.datasets import load_dataset
from eggfusion_tpu.geometry.camera import CameraIntrinsics
from eggfusion_tpu.main import run
from eggfusion_tpu.utils import eval as evalu

W, H = 120, 90
FX, FY, CX, CY = 110.0, 110.0, W / 2 - 0.5, H / 2 - 0.5
N_FRAMES = 32
K1 = 0.06  # mild pincushion distortion (fr1-class magnitude; positive k1
#            keeps the test's inverse-model fixed-point iteration a contraction)


def _save_png(path, arr):
    from PIL import Image

    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        Image.fromarray(arr).save(path)


def _distort_image(img: np.ndarray, k1: float) -> np.ndarray:
    """Synthesize the DISTORTED camera image from a clean (undistorted)
    render: each distorted pixel looks up its undistorted source through the
    inverse lens model (fixed-point iteration on x_u = x_d / radial(x_u)),
    then bilinear-samples the clean image. The dataset loader's forward-model
    undistortion remap must invert this to within interpolation error."""
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    xd = (xs - CX) / FX
    yd = (ys - CY) / FY
    xu, yu = xd.copy(), yd.copy()
    for _ in range(8):
        r2 = xu * xu + yu * yu
        radial = 1.0 + k1 * r2
        xu = xd / radial
        yu = yd / radial
    sx = np.clip(xu * FX + CX, 0, W - 1)
    sy = np.clip(yu * FY + CY, 0, H - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = (sx - x0)[..., None] if img.ndim == 3 else (sx - x0)
    fy = (sy - y0)[..., None] if img.ndim == 3 else (sy - y0)
    out = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
           + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return out


@pytest.fixture(scope="module")
def tum_tree(tmp_path_factory):
    from scipy.spatial.transform import Rotation

    from eggfusion_tpu.data import synthetic as syn

    tmp = tmp_path_factory.mktemp("tum_composed")
    root = tmp / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    intr = CameraIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
    # smooth sway trajectory + detail texture for FAST corners. This test
    # proves the four features COMPOSE (distortion remap + sparse seed +
    # reloc + burst schedule); robustness under jitter/burst is priced
    # separately by tools/adversarial_probe.py
    poses = syn.make_trajectory(N_FRAMES)
    scale = 5000.0
    rgb_lines = ["# color images"]
    dep_lines = ["# depth images"]
    gt_lines = ["# ground truth trajectory"]
    for i in range(N_FRAMES):
        c, d = syn.render_corner_scene_jit(intr, poses[i], detail=0.35)
        c = np.asarray(c)
        d = np.asarray(d)[..., 0]
        # forward-distort what the "camera" saw, THEN apply sensor noise
        # (noise happens in the distorted capture; noising first would
        # bilinear-smear dropout zeros through the warp)
        cd = _distort_image(c, K1)
        dd = _distort_image(d, K1)
        cd, dd = syn.apply_sensor_noise(cd, dd, seed=100 + i, depth_sigma0=0.001,
                                        depth_sigma2=0.001, dropout_frac=0.001)
        ts = 1305031100.0 + i * 0.0625
        _save_png(root / "rgb" / f"{ts:.6f}.png",
                  (np.clip(cd, 0, 1) * 255).astype(np.uint8))
        _save_png(root / "depth" / f"{ts:.6f}.png",
                  np.round(np.clip(dd, 0, None) * scale).astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dep_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        c2w = np.linalg.inv(poses[i])
        q = Rotation.from_matrix(c2w[:3, :3]).as_quat()
        t = c2w[:3, 3]
        gt_lines.append(
            f"{ts + 0.01:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return tmp, root, poses


class TestTUMComposed:
    def test_full_tum_path(self, tum_tree):
        tmp, root, poses = tum_tree
        cfg = cfglib.default_config(
            Dataset={
                "type": "tum", "dataset_path": str(root), "scene": "composed",
                "preload": False,
                "Calibration": {
                    "fx": FX, "fy": FY, "cx": CX, "cy": CY,
                    "width": W, "height": H, "depth_scale": 5000.0,
                    "k1": K1, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
                    "distorted": True,
                },
            },
            Viewer={"max_surfels_num": 8192},
            Tracking={
                "use_sparse": True,  # configs/tum/base.yaml:11
                "reloc_descriptors": True,
                "fast_threshold": 8, "orb_min_matches": 12,
            },
            Mapping={"local_map_iter_init": 6, "local_map_iter": 2,
                     "final_global_opt_iter": 2, "sample_ratio": 0.05,
                     "sample_ratio_init": 0.15,
                     "opt_schedule": "burst"},  # reference-exact cadence
            Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
            System={"save_dir": str(tmp / "run"), "root_dir": str(tmp),
                    "final_global_opt": False},
        )
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES
        assert ds._distorted  # the undistortion remap path is actually live

        ef = run(cfg, verbose=False)
        est = np.asarray(ef.traj["est"])[:, :3, 3]
        ref = np.asarray(ef.traj["ref"])[:, :3, 3]
        ate = evalu.ate_rmse(ref, est)
        # noisy + distorted + double-interpolated at 120x90 (the distortion
        # round-trip alone smooths the speckle texture to ~0.05 MAE): the
        # measured regime is ~3 cm; the bound catches composition breakage
        # (a broken undistort/seed/schedule path free-runs to 30+ cm — the
        # depth-undistort loader bug this test caught measured 63 cm)
        assert ate < 8.0, f"ATE {ate} cm"
        # composition proof: the sparse frontend seeded dense solves
        assert ef.tracker._sparse is not None
        assert ef.tracker.sparse_seeds >= N_FRAMES // 2, ef.tracker.sparse_seeds
        # reloc is constructed lazily on recovery; enabled is what composes
        assert ef._reloc_enabled
        # burst schedule ran real optimization rounds
        assert ef.mapper.opt_steps_total >= 6
        assert int(ef.mapper.surfels.num_active()) > 100
