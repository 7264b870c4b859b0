"""Real-format dataset parser validation (VERDICT r1 #4).

Writes tiny on-disk TUM / Replica / ScanNet++ trees in the REAL file formats
(synthetic corner-scene renders saved as png/jpg + the real metadata files:
`rgb.txt`/`depth.txt`/`groundtruth.txt`, `traj.txt`,
`transforms_undistorted.json`), then runs `load_dataset` -> the full
`run()` pipeline end to end on each. This exercises exactly the code the
reference exercises only on downloaded benchmarks (`/root/reference/src/
utils/dataset.py:117-292`): timestamp association, pose parsing/inversion,
re-basing, axis conventions, depth scaling, image IO.

All three fixtures share the calibration of `test_system_e2e` so the jitted
pipeline programs compile once per pytest process.
"""
import json
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
N_FRAMES = 6


def _render_frames():
    """(colors u8 (H, W, 3), depths f32 m, poses w2c rebased frame0=I)."""
    from eggfusion_tpu.data import synthetic as syn

    intr = CameraIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
    poses = syn.make_trajectory(N_FRAMES)
    colors, depths = [], []
    for i in range(N_FRAMES):
        c, d = syn.render_corner_scene_jit(intr, poses[i])
        colors.append((np.asarray(c) * 255).astype(np.uint8))
        depths.append(np.asarray(d)[..., 0])
    return colors, depths, poses


@pytest.fixture(scope="module")
def frames():
    return _render_frames()


def _save_png(path, arr):
    from PIL import Image

    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        Image.fromarray(arr).save(path)


def _cfg(dataset_section, tmp, depth_scale, extra_system=None):
    return cfglib.default_config(
        Dataset={
            **dataset_section,
            "preload": False,
            "Calibration": {
                "fx": FX, "fy": FY, "cx": CX, "cy": CY,
                "width": W, "height": H, "depth_scale": depth_scale,
            },
        },
        Viewer={"max_surfels_num": 6144},
        Mapping={"local_map_iter_init": 6, "local_map_iter": 2,
                 "final_global_opt_iter": 2, "sample_ratio": 0.05,
                 "sample_ratio_init": 0.15},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": str(tmp / "run"), "root_dir": str(tmp),
                "final_global_opt": False, **(extra_system or {})},
    )


def _check_run(cfg, poses_w2c, ate_tol):
    ef = run(cfg, verbose=False)
    est = np.asarray(ef.traj["est"])[:, :3, 3]
    ref_c2w = np.stack([np.linalg.inv(p) for p in poses_w2c])[:, :3, 3]
    # the dataset's GT (rebased) should round-trip through the parser exactly
    parsed_ref = np.asarray(ef.traj["ref"])[:, :3, 3]
    np.testing.assert_allclose(parsed_ref, ref_c2w[: len(parsed_ref)], atol=5e-4)
    ate = evalu.ate_rmse(parsed_ref, est)
    assert ate < ate_tol, f"ATE {ate} cm"
    assert int(ef.mapper.surfels.num_active()) > 100
    return ef


class TestTUMFixture:
    def test_end_to_end(self, frames, tmp_path):
        colors, depths, poses = frames
        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        scale = 5000.0
        rgb_lines = ["# color images", "# file: fixture", "# timestamp filename"]
        dep_lines = ["# depth images", "# file: fixture", "# timestamp filename"]
        gt_lines = ["# ground truth trajectory"]
        from scipy.spatial.transform import Rotation

        for i in range(N_FRAMES):
            ts = 1305031100.0 + i * 0.0625  # 16 fps: survives 32-fps culling
            _save_png(root / "rgb" / f"{ts:.6f}.png", colors[i])
            _save_png(root / "depth" / f"{ts:.6f}.png",
                      np.round(depths[i] * scale).astype(np.uint16))
            rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
            dep_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
            c2w = np.linalg.inv(poses[i])
            q = Rotation.from_matrix(c2w[:3, :3]).as_quat()  # x y z w
            t = c2w[:3, 3]
            # pose stream at a slightly offset timestamp (association test)
            gt_lines.append(
                f"{ts + 0.013:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
            )
        (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
        (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
        (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

        cfg = _cfg({"type": "tum", "dataset_path": str(root), "scene": "fx"},
                   tmp_path, scale)
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES
        # depth decodes back to metric through depth_scale
        _, _, dep, _, _ = ds[0]
        np.testing.assert_allclose(dep / scale, depths[0], atol=1.5 / scale)
        _check_run(cfg, poses, ate_tol=1.0)

    def test_association_drops_unmatched(self, frames, tmp_path):
        colors, depths, poses = frames
        root = tmp_path / "tum2"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rgb_lines, dep_lines, gt_lines = ["# c"], ["# d"], ["# g"]
        from scipy.spatial.transform import Rotation

        for i in range(N_FRAMES):
            # 5 fps spacing: a 0.1 s depth offset is then unambiguously
            # unmatched (no neighboring depth within the 0.08 s gate)
            ts = 100.0 + i * 0.2
            _save_png(root / "rgb" / f"{i}.png", colors[i])
            _save_png(root / "depth" / f"{i}.png",
                      np.round(depths[i] * 5000).astype(np.uint16))
            rgb_lines.append(f"{ts:.6f} rgb/{i}.png")
            # frame 3's depth timestamp is far off -> association must drop it
            dts = ts + (0.1 if i == 3 else 0.01)
            dep_lines.append(f"{dts:.6f} depth/{i}.png")
            c2w = np.linalg.inv(poses[i])
            q = Rotation.from_matrix(c2w[:3, :3]).as_quat()
            t = c2w[:3, 3]
            gt_lines.append(f"{ts:.6f} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}")
        (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
        (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
        (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
        cfg = _cfg({"type": "tum", "dataset_path": str(root), "scene": "fx"},
                   tmp_path, 5000.0)
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES - 1


class TestReplicaFixture:
    def test_end_to_end(self, frames, tmp_path):
        colors, depths, poses = frames
        root = tmp_path / "replica"
        (root / "results").mkdir(parents=True)
        scale = 6553.5
        traj = []
        from PIL import Image

        for i in range(N_FRAMES):
            Image.fromarray(colors[i]).save(
                root / "results" / f"frame{i:06d}.jpg", quality=98
            )
            _save_png(root / "results" / f"depth{i:06d}.png",
                      np.round(depths[i] * scale).astype(np.uint16))
            c2w = np.linalg.inv(poses[i])  # traj.txt rows are c2w
            traj.append(" ".join(f"{v:.9f}" for v in c2w.reshape(-1)))
        (root / "traj.txt").write_text("\n".join(traj) + "\n")

        cfg = _cfg({"type": "replica", "dataset_path": str(root), "scene": "fx"},
                   tmp_path, scale)
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES
        _check_run(cfg, poses, ate_tol=1.0)


class TestScanNetPPFixture:
    def test_end_to_end(self, frames, tmp_path):
        colors, depths, poses = frames
        root = tmp_path / "scannetpp"
        (root / "dslr/undistorted_images").mkdir(parents=True)
        (root / "dslr/undistorted_depths").mkdir(parents=True)
        (root / "dslr/nerfstudio").mkdir(parents=True)
        scale = 1000.0
        from PIL import Image

        flip = np.array([[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float64)
        entries, names = [], []
        for i in range(N_FRAMES):
            name = f"DSC{i:05d}"
            names.append(name)
            Image.fromarray(colors[i]).save(
                root / "dslr/undistorted_images" / f"{name}.JPG", quality=98
            )
            _save_png(root / "dslr/undistorted_depths" / f"{name}.png",
                      np.round(depths[i] * scale).astype(np.uint16))
            # invert the loader's convention chain: it applies
            # v = stored; v[:, 1:3] *= -1; P = flip @ v; pose_i = inv(P_i) @ P_0
            # so store P_i = inv(w2c_i) (P_0 = I since poses are rebased)
            P = np.linalg.inv(poses[i])
            v = flip @ P  # flip is an involution
            v[:, 1:3] *= -1
            entries.append({
                "file_path": f"{name}.JPG",
                "transform_matrix": v.tolist(),
                "is_bad": False,
            })
        # REAL train/test split (VERDICT r4 #5): the last frame is held out
        # as the test split, exactly how ScanNet++ ships
        # `train_test_lists.json`; the run builds the map from train only
        # and `evaluate_render_dataset` scores renders at the test frame's
        # GT pose re-based into the train world.
        (root / "dslr/nerfstudio/transforms_undistorted.json").write_text(
            json.dumps({"frames": entries})
        )
        (root / "dslr/train_test_lists.json").write_text(
            json.dumps({"train": [f"{n}.JPG" for n in names[:-1]],
                        "test": [f"{names[-1]}.JPG"]})
        )

        cfg = _cfg({"type": "scannetpp", "dataset_path": str(root), "scene": "fx"},
                   tmp_path, scale, extra_system={"only_mapping": True})
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES - 1
        # pose convention survives the flip chain: parsed w2c == written w2c
        for i in range(N_FRAMES - 1):
            np.testing.assert_allclose(ds.poses[i], poses[i], atol=1e-9)
        ef = _check_run(cfg, poses, ate_tol=1.0)

        # test-split evaluation: load the held-out split and score renders
        ds_test = load_dataset(cfg, test=True)
        assert len(ds_test) == 1
        rep = ef.evaluate_render_dataset(ds_test, train_pivot=ds.pivot)
        assert rep["n_frames"] == 1
        assert np.isfinite(rep["mean"]["psnr"]) and rep["mean"]["psnr"] > 10.0, rep
        assert rep["mean"]["depth_l1"] < 0.2, rep
        assert os.path.exists(os.path.join(ef.save_dir, "render_metrics_testsplit.json"))


class TestAzureFixture:
    def test_end_to_end(self, frames, tmp_path):
        """Azure Kinect offline tree (VERDICT r2 #8): `color/*.jpg` +
        `depth/*.png` in millimetres, no GT poses (reference
        `AzureKinectParser/Dataset`, `dataset.py:296-345`). The run
        free-tracks from identity; we validate decode/scale/resize and that
        the pipeline completes with a live map."""
        colors, depths, _poses = frames
        root = tmp_path / "azure"
        (root / "color").mkdir(parents=True)
        (root / "depth").mkdir()
        scale = 1000.0  # Azure depth is uint16 mm
        from PIL import Image

        for i in range(N_FRAMES):
            Image.fromarray(colors[i]).save(
                root / "color" / f"{i:06d}.jpg", quality=98
            )
            _save_png(root / "depth" / f"{i:06d}.png",
                      np.round(depths[i] * scale).astype(np.uint16))

        cfg = _cfg({"type": "azure", "dataset_path": str(root), "scene": "fx"},
                   tmp_path, scale)
        ds = load_dataset(cfg)
        assert len(ds) == N_FRAMES
        ts, color, dep, mask, pose = ds[0]
        # Azure ships no trajectory: parser must report identity poses
        np.testing.assert_array_equal(pose, np.eye(4))
        assert color.shape == (H, W, 3) and dep.shape == (H, W)
        np.testing.assert_allclose(dep / scale, depths[0], atol=2.0 / scale)
        assert np.abs(color.astype(np.float32) - colors[0]).mean() < 6.0  # jpg

        ef = run(cfg, verbose=False)
        assert int(ef.mapper.surfels.num_active()) > 100
        assert len(ef.traj["est"]) == N_FRAMES
        # frame-to-frame motion in this fixture is mm-scale; the estimated
        # trajectory must stay bounded (no free-run blowup without GT)
        est = np.asarray(ef.traj["est"])[:, :3, 3]
        assert np.linalg.norm(est, axis=1).max() < 0.5
