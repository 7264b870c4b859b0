"""System orchestrator: the per-frame reconstruct pipeline.

TPU-native equivalent of the reference `EGGFusion` (`/root/reference/src/
system.py`): reconstruct(frame) = track -> preprocess -> map -> postprocess ->
trajectory bookkeeping; finish() runs the global keyframe optimization and
exports the map; evaluate_trajectory() computes the cumulative ATE curve and
plots. `evaluate_render()` additionally wires up the render metrics the
reference implemented but never invoked (`eval_utils.py:93-109`, SURVEY.md §5).

Both preprocess and postprocess are single jitted XLA programs; the host loop
only routes arrays and makes the (scalar) keyframe/convergence decisions.
"""
from __future__ import annotations

import functools
import json
import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.core.frame import Frame
from eggfusion_tpu.core.mapper import Mapping
from eggfusion_tpu.core.renderer import Renderer
from eggfusion_tpu.core.tracker import Tracker
from eggfusion_tpu.geometry import transforms as tf
from eggfusion_tpu.io import checkpoint as ckpt
from eggfusion_tpu.io import ply as plyio
from eggfusion_tpu.ops import image as imops
from eggfusion_tpu.ops.pyramid import build_pyramid
from eggfusion_tpu.geometry.camera import CameraIntrinsics
from eggfusion_tpu.utils import eval as evalu


def _cal_intrinsics(cfg) -> CameraIntrinsics:
    cal = cfg.Dataset.Calibration
    return CameraIntrinsics(
        fx=float(cal.fx), fy=float(cal.fy), cx=float(cal.cx), cy=float(cal.cy),
        width=int(cal.width), height=int(cal.height),
    )


@functools.partial(jax.jit, static_argnames=("reco_normal_thres",))
def preprocess_frame_map(color, depth, vmap, nmap, mask, intr, w2c, reco_normal_thres: float):
    """Build the frame_map (reference `EGGFusion.preprocess`,
    `system.py:83-125`): depth-gradient edge mask (>0.1), incident-angle
    grazing mask, invalid zeroing, radial confidence, world-frame maps.
    Takes w2c and inverts in-program (an eager 4x4 inverse is a separate
    dispatch per frame on tunnel-attached TPUs)."""
    c2w = jnp.linalg.inv(w2c)
    gx, gy = imops.diff_gradients(depth)
    edge_mask = jnp.sqrt(gx**2 + gy**2) > 0.1

    similarity = tf.compute_incident_angle(nmap, intr)[..., 0]
    normal_mask = similarity < jnp.sin(jnp.deg2rad(reco_normal_thres))

    inf_mask = jnp.any(jnp.isinf(nmap), axis=-1)
    invalid = normal_mask | jnp.all(nmap == 0, axis=-1) | edge_mask | inf_mask

    depth = jnp.where(invalid[..., None], 0.0, depth)
    nmap = jnp.where(invalid[..., None], 0.0, nmap)
    vmap = jnp.where(invalid[..., None], 0.0, vmap)

    H, W = depth.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)
    conf = tf.compute_confidence(coords, intr[2:4], 400.0, 0.72)

    R = c2w[:3, :3]
    t = c2w[:3, 3]
    t0 = jnp.zeros(3)
    return {
        "color_map": color,
        "depth_map": depth,
        "vertex_map_c": vmap,
        "normal_map_c": nmap,
        "confidence_map": conf,
        "rgb_mask": mask > 0.5,
        "geo_mask": ~invalid[..., None],
        "vertex_map_w": tf.transform_map(vmap, R, t),
        "normal_map_w": tf.transform_map(nmap, R, t0),
    }


@functools.partial(jax.jit, static_argnames=("reco_normal_thres", "reco_depth_thres", "reco_opacity_thres", "depth_min", "depth_max", "nlevel", "down", "bilateral"))
def postprocess_model_map(rendered: dict, frame_map: dict, intr, w2c,
                          reco_normal_thres: float, reco_depth_thres: float,
                          reco_opacity_thres: float, depth_min: float, depth_max: float,
                          nlevel: int, down: int = 1, bilateral: str = "exact"):
    """Consistency masks + fill-in + next-frame tracking pyramid (reference
    `EGGFusion.postprocess`, `system.py:51-81`, fused with the model-pyramid
    build the reference redoes inside the tracker, `tracker.py:136-143`).

    `down` > 1 (Tracking.model_view_down): the rendered maps are already at
    1/down resolution; the frame-side inputs are nearest-subsampled to match
    and the tracking pyramid's base level is the 1/down view."""
    if down > 1:
        frame_map = {
            k: (frame_map[k][::down, ::down] if hasattr(frame_map[k], "ndim")
                and frame_map[k].ndim >= 2 else frame_map[k])
            for k in ("normal_map_c", "depth_map", "color_map", "geo_mask")
        }
        intr = intr / down
    n1 = frame_map["normal_map_c"]
    n2 = rendered["render_normal"]
    cos = jnp.sum(n1 * n2, axis=-1) / (
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1) + 1e-8
    )
    angle = jnp.degrees(jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7)))
    normal_mask = angle < reco_normal_thres

    d1 = frame_map["depth_map"]
    d2 = rendered["render_depth"]
    depth_range = (d2 > depth_min) & (d2 < depth_max)
    depth_mask = (jnp.abs(d1 - d2) < reco_depth_thres) & frame_map["geo_mask"] & depth_range
    opacity_mask = rendered["render_opacity"][..., 0] > reco_opacity_thres
    valid = normal_mask & depth_mask[..., 0] & opacity_mask

    color = jnp.where(valid[..., None], rendered["render_color"], frame_map["color_map"])
    depth = jnp.where(valid[..., None], rendered["render_depth"], frame_map["depth_map"])

    pyramid = build_pyramid(color, depth, opacity_mask[..., None].astype(jnp.float32), intr, nlevel=nlevel,
                            bilateral=bilateral)
    return {
        "rendered_color": color,
        "rendered_depth": depth,
        "mask": valid,
        "opacity_mask": opacity_mask,
        "transform": w2c,
        "pyramid": pyramid,
    }


class EGGFusion:
    def __init__(self, cfg):
        self.cfg = cfg
        self.renderer = Renderer(cfg)
        self.tracker = Tracker(cfg)
        self.mapper = Mapping(cfg, self.renderer)
        self.frame_map = None
        self.model_map = None

        s = cfg.System
        self.save_dir = s.get("save_dir", "") or "results/run"
        self.final_global_opt = bool(s.final_global_opt)
        self.reco_normal_thres = float(s.reco_normal_threshold)
        self.reco_depth_thres = float(s.reco_depth_threshold)
        self.reco_opacity_thres = float(s.reco_opacity_threshold)
        self.depth_range_min = float(s.depth_range_min)
        self.depth_range_max = float(s.depth_range_max)
        self.nlevel = int(cfg.Tracking.pyramid_level)
        # model-view downsample (Tracking.model_view_down, see config.py):
        # the tracking/spawn model view renders at 1/down resolution; frames
        # build `view_off` extra pyramid levels so the tracker can pair the
        # model pyramid with the frame pyramid one octave down.
        self.mv_down = int(cfg.Tracking.get("model_view_down", 1))
        self.view_off = self.mv_down.bit_length() - 1
        self.nlevel_frame = self.nlevel + self.view_off

        self.traj = {"ts": [], "ref": [], "est": []}
        self.metrics = []  # per-frame observability records

        # held-out render evaluation (VERDICT r4 #5): keep every
        # `heldout_stride`-th frame's color/depth DEVICE refs + tracked pose;
        # `evaluate_render` scores renders at those poses too. Frames whose
        # uid later becomes a keyframe are excluded at eval time, so the
        # held_out section is a true non-training-view metric (the keyframe
        # section scores views the optimizer itself fit). Device-resident on
        # purpose: host copies of full-res frames through a tunnel-attached
        # TPU cost seconds each. 0 disables.
        self.heldout_stride = int(s.get("heldout_stride", 25))
        self.heldout_max = int(s.get("heldout_max", 8))
        self._heldout: list = []  # (uid, w2c ref, color ref, depth ref)

        # descriptor-indexed relocalization (reference: ORB-SLAM2 keyframe
        # database + Relocalization, `tracker.py:85-122`); lazy so the native
        # build is only required if recovery ever fires
        self._reloc = None
        self._reloc_enabled = bool(cfg.Tracking.get("reloc_descriptors", True))
        # rotation-hypothesis re-lock (round 5, VERDICT r4 #3): descriptor
        # reloc needs texture; the clean fast-rotation failure happens in
        # low-texture scenes where it cannot fire. On recovery, sweep a fan
        # of pure-rotation seed hypotheses with COARSE-level-only dense
        # solves against the re-anchored model view and seed the next full
        # solve from the best converged one — rotation is exactly the axis
        # the dense basin loses first (2 deg/frame x readback lag ~ 10-20
        # deg offset, far outside the fine-level basin, well inside +-24).
        self._rot_sweep = bool(cfg.Tracking.get("recovery_rotation_sweep", True))

        # render + postprocess fused into ONE program: skips a dispatch and
        # the HBM round-trip of the four intermediate full-res render maps
        from eggfusion_tpu.core import surfels as _sf

        render_at = self.renderer.render_at
        nt, dt_, ot = self.reco_normal_thres, self.reco_depth_thres, self.reco_opacity_thres
        dmin, dmax, nlevel = self.depth_range_min, self.depth_range_max, self.nlevel
        mv_down = self.mv_down
        bilat = str(self.cfg.System.get("bilateral_mode", "exact"))

        @functools.partial(jax.jit, static_argnames=("width", "height"))
        def render_postprocess(s, frame_map: dict, w2c, intr, width: int, height: int):
            # width/height are FULL frame size; the model view renders at
            # 1/mv_down and postprocess_model_map subsamples the frame side
            intr_r = intr / mv_down if mv_down > 1 else intr
            out = render_at(_sf.render_params(s), w2c, intr_r,
                            width // mv_down, height // mv_down,
                            need_grad=False)
            rendered = {
                "render_color": out["color"],
                "render_depth": out["depth"],
                "render_normal": out["normal"],
                "render_opacity": out["opacity"],
            }
            return postprocess_model_map(
                rendered, frame_map, intr, w2c, nt, dt_, ot, dmin, dmax, nlevel,
                down=mv_down, bilateral=bilat,
            )

        self._render_postprocess = render_postprocess
        # register the system-owned per-capacity program with the mapper's
        # background next-bucket precompiler (see Mapping._maybe_precompile)
        self.mapper.precompile_hooks.append(self._precompile_hook)

    def _precompile_hook(self, capacity: int, thunks: list) -> None:
        sds = jax.ShapeDtypeStruct
        s = self.mapper.surfel_sds(capacity)
        fm = self.mapper._fm_sds
        W, H = self.mapper._wh
        thunks.append(("render_postprocess", lambda: self._render_postprocess.lower(
            s, fm, sds((4, 4), jnp.float32), sds((4,), jnp.float32),
            width=W, height=H).compile()))

    def warmup(self, full: bool | None = None) -> None:
        """Pre-compile the pipeline's programs before the sequence starts.

        Real-time discipline: all compilation should happen before frame 0.
        Empirically also required on remote-attached TPUs, where compiling
        the tracker mid-sequence (after the mapping programs and large
        buffers are resident) can crash the device worker.

        `full=True` (default on TPU) additionally lowers+compiles EVERY
        mapping/postprocess program at production shapes in a thread pool
        (VERDICT r2 #3): backend compiles release the GIL and run
        concurrently, so cold-start wall time approaches the slowest single
        program (~130 s) instead of the serial sum (~6-8 minutes through
        the tunnel). Results populate the persistent compilation cache.
        """
        from eggfusion_tpu.core.tracker import dense_track, dense_track_pose

        if full is None:
            full = jax.default_backend() not in ("cpu",)
        cal = self.cfg.Dataset.Calibration
        H, W = int(cal.height), int(cal.width)
        f = Frame(
            uid=-1, ts=0.0,
            color_u8=np.zeros((H, W, 3), np.float32),
            depth_raw=np.ones((H, W), np.float32),
            mask=np.ones((H, W), np.float32),
            gt_pose_w2c=np.eye(4, dtype=np.float32),
            intr=_cal_intrinsics(self.cfg),
            depth_scale=1.0, nlevel=self.nlevel_frame, prefiltered=True,
        )
        f.update_transform_gt()
        eye = jnp.eye(4)
        off = self.view_off  # model pyramid = frame pyramid one octave down
        curr, _, _, _ = dense_track_pose(f.pyramid[off:], f.pyramid[off:], eye,
                                         eye, self.tracker.config,
                                         self.tracker.mesh)
        jax.block_until_ready(curr)
        if self._rot_sweep:
            # the recovery rotation sweep's coarse-only program — compile it
            # now, not mid-recovery
            L = self.tracker.config.pyramid_level
            coarse_cfg = self.tracker.config._replace(
                pyramid_level=1, pyramid_iters=(6,), solver_stride_fine=0)
            jax.block_until_ready(dense_track(
                (f.pyramid[L - 1 + off],), (f.pyramid[L - 1 + off],), eye,
                coarse_cfg, self.tracker.mesh)[0])
        if not full:
            return

        import concurrent.futures as cf
        import time as _t

        self.preprocess(f)
        thunks = self.mapper.warmup_lowerings(f, self.frame_map)
        thunks.append((
            "render_postprocess",
            lambda: self._render_postprocess.lower(
                self.mapper.surfels, self.frame_map, eye, f.intr,
                width=W, height=H).compile(),
        ))
        t0 = _t.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=6) as ex:
            futs = {ex.submit(fn): label for label, fn in thunks}
            for fut in cf.as_completed(futs):
                try:
                    fut.result()
                except Exception as e:  # warmup is best-effort
                    print(f"warmup compile {futs[fut]} failed: {e}")
        print(f"warmup: {len(thunks)} programs compiled in {_t.perf_counter()-t0:.1f}s")
        if bool(self.cfg.System.get("precompile_ladder", False)):
            # queue background campaigns for the WHOLE capacity ladder
            # (VERDICT r4 #2): long exploratory runs then never cold-compile
            # a rung inline. Off by default — steady-scene runs never leave
            # their rung and the campaigns' tunnel RPCs contend with
            # dispatch; envelope/exploration drivers opt in.
            n = self.mapper.queue_ladder_precompile()
            print(f"warmup: queued ladder precompile for {n} rungs (background)")
        self.frame_map = None  # dummy-frame state must not leak into frame 0

    # ---- per-frame pipeline -------------------------------------------------

    def _model_map_at(self, w2c) -> dict:
        """Minimal tracking model map (render + pyramid) at an arbitrary pose.

        Used by `resume()` and by tracking-loss recovery — both re-anchor
        the tracker to a freshly rendered model view."""
        intr = _cal_intrinsics(self.cfg)
        ia = jnp.asarray([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32)
        d = self.mv_down
        out = self.mapper._render_model(self.mapper.surfels, w2c, ia / d if d > 1 else ia,
                                        intr.width // d, intr.height // d)
        opa = out["opacity"] > self.reco_opacity_thres
        pyramid = build_pyramid(
            out["color"], out["depth"], opa.astype(jnp.float32),
            ia / d if d > 1 else ia, nlevel=self.nlevel
        )
        return {"transform": w2c, "pyramid": pyramid}

    def _rotation_hypothesis_seed(self, frame) -> int:
        """Coarse-level rotational seed sweep (see `_rot_sweep`): solve the
        coarsest pyramid level from each hypothesis delta; install the best
        converged delta as the tracker's one-shot seed override. Returns the
        number of converged hypotheses. Host syncs are fine here — recovery
        is rare and the sweep replaces frames of free-running."""
        from eggfusion_tpu.core.tracker import dense_track

        if self.model_map is None or "pyramid" not in self.model_map:
            return 0
        L = self.tracker.config.pyramid_level
        pm = (self.model_map["pyramid"][L - 1],)
        pf = (frame.pyramid[L - 1 + self.view_off],)
        coarse_cfg = self.tracker.config._replace(
            pyramid_level=1, pyramid_iters=(6,), solver_stride_fine=0)

        def rot(axis, deg):
            a = np.deg2rad(deg)
            c, s = np.cos(a), np.sin(a)
            R = np.eye(4, dtype=np.float32)
            if axis == "y":
                R[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
            else:
                R[:3, :3] = [[1, 0, 0], [0, c, -s], [0, s, c]]
            return R

        hyps = [("y", d) for d in (0.0, 8.0, -8.0, 16.0, -16.0, 24.0, -24.0)]
        hyps += [("x", d) for d in (8.0, -8.0)]
        best = None
        n_conv = 0
        cfg = self.tracker.config
        for axis, deg in hyps:
            seed = jnp.asarray(rot(axis, deg))
            delta, conv, rms, n_icp = dense_track(pm, pf, seed, coarse_cfg,
                                                  self.tracker.mesh)
            # commit rule of dense_track_pose: strict convergence OR a true
            # point-to-plane RMS under commit_rms_m with enough constraints
            ok = bool(np.asarray(conv)) or (
                cfg.commit_min_count > 0
                and float(np.asarray(rms)) < cfg.commit_rms_m
                and float(np.asarray(n_icp)) >= cfg.commit_min_count)
            if ok:
                n_conv += 1
                score = float(np.asarray(rms))
                if best is None or score < best[0]:
                    best = (score, delta)
        if best is not None:
            self.tracker.seed_override = best[1]
        return n_conv

    def _recover_tracking(self, frame=None) -> bool:
        """Re-anchor tracking after a failure streak (VERDICT r1 #7; extends
        the reference's per-frame fallback contract, `tracker.py:153-170`,
        which free-runs with no recovery path).

        Anchor choice, best first:
          1. descriptor relocalization — match the lost frame's FAST+BRIEF
             descriptors against the keyframe database and solve the full
             pose vs the best-matching keyframe (reference: ORB-SLAM2
             Relocalization, `tracker.py:85-122`);
          2. the last pose whose dense solve converged;
          3. the last keyframe.
        The model view is re-rendered at the anchor (clean render, no
        corrupted-frame fill-in) and the motion model cleared; the next
        dense solve re-locks against it."""
        km = self.mapper.keyframe_manager
        anchor = anchor_id = None
        reloc_inliers = 0
        if frame is not None and self._reloc_enabled and km.keyframes:
            if self._reloc is None:
                try:
                    from eggfusion_tpu.core.reloc import DescriptorRelocalizer

                    self._reloc = DescriptorRelocalizer(self.cfg)
                except Exception as e:  # pragma: no cover - build-env dependent
                    print(f"descriptor relocalization unavailable ({e})")
                    self._reloc_enabled = False
            if self._reloc is not None:
                hit = self._reloc.relocalize(frame, km.keyframes)
                if hit is not None:
                    w2c, anchor_id, reloc_inliers = hit
                    anchor = jnp.asarray(w2c)
        if anchor is None:
            anchor, anchor_id = self.tracker.last_good_w2c, -1
        if anchor is None:
            ids = km.ids()
            if not ids:
                return False
            kf = km.keyframes[ids[-1]]
            anchor, anchor_id = jnp.asarray(kf.w2c), kf.uid
        self.model_map = self._model_map_at(jnp.asarray(anchor))
        self.tracker.reset_motion()
        rec = {"frame": -1, "recovered_to_kf": anchor_id}
        if reloc_inliers:
            rec["reloc_inliers"] = reloc_inliers
        if frame is not None and self._rot_sweep:
            rec["rot_sweep_converged"] = self._rotation_hypothesis_seed(frame)
        self.metrics.append(rec)
        return True

    def reconstruct(self, frame: Frame) -> None:
        t0 = _time.perf_counter()
        if self.model_map is not None and self.tracker.needs_recovery():
            self._recover_tracking(frame)
        self.tracker.tracking(frame, self.model_map)
        t1 = _time.perf_counter()
        self.preprocess(frame)
        model_map = self.mapper.mapping(
            frame, self.frame_map,
            fail_streak=max(self.tracker._fail_streak, self.tracker.chronic_fails))
        t2 = _time.perf_counter()
        from eggfusion_tpu.core.mapper import KEEP_MODEL_MAP

        if isinstance(model_map, str) and model_map == KEEP_MODEL_MAP:
            # settled fuse-only frame (Mapping.settled_skip): keep tracking
            # against the previous model view (one frame staler)
            pass
        elif model_map is not None:
            # fused path: the map update already rendered + postprocessed
            self.model_map = model_map
        else:
            # optimization frame: render AFTER the window optimization so the
            # next frame tracks against the refined map (reference ordering)
            self.postprocess(frame)
        t3 = _time.perf_counter()
        self.append_trajectory(frame)
        if self.heldout_stride > 0 and frame.uid % self.heldout_stride == self.heldout_stride // 2:
            # offset by stride//2 so held-out picks interleave keyframe-check
            # frames instead of coinciding with them
            self._heldout.append((frame.uid, frame.w2c_matrix(), frame.color, frame.depth))
            if len(self._heldout) > self.heldout_max:
                self._heldout.pop(0)
        # surfel count stays a device scalar — no per-frame host readback
        # (each sync is a full dispatch round-trip on remote-attached TPUs)
        rec = {
            "frame": frame.uid,
            "track_ms": (t1 - t0) * 1e3,
            "map_ms": (t2 - t1) * 1e3,
            "post_ms": (t3 - t2) * 1e3,
            "surfels": self.mapper.surfels.num_active(),
        }
        # freshest consumed fusion-stats observation (lag-N async readback);
        # `stats_frame` says which frame it describes
        fs = self.mapper.fusion_stats
        if fs:
            t_last = next(reversed(fs))
            rec["stats_frame"] = t_last
            rec["fused_px"], rec["error_px"] = fs[t_last]
        # map-opt observability (VERDICT r4 #8): exact cumulative step count
        # + the freshest lag-N loss readback
        rec["opt_steps"] = self.mapper.opt_steps_total
        if self.mapper.settled_skip:
            rec["render_skips"] = self.mapper.render_skips
        ol = self.mapper.opt_losses
        if ol:
            t_loss = next(reversed(ol))
            rec["opt_loss_frame"] = t_loss
            rec["opt_loss"] = ol[t_loss]
        self.metrics.append(rec)

    def preprocess(self, frame: Frame) -> None:
        p0 = frame.pyramid[0]
        self.frame_map = preprocess_frame_map(
            frame.color, frame.depth, p0.vertex, p0.normal, frame.mask,
            frame.intr, frame.w2c_matrix(), self.reco_normal_thres,
        )

    def postprocess(self, frame: Frame) -> None:
        self.model_map = self._render_postprocess(
            self.mapper.surfels, self.frame_map, frame.w2c_matrix(), frame.intr,
            frame.width, frame.height,
        )

    def append_trajectory(self, frame: Frame) -> None:
        # GT stays host-side numpy (it never touches the device); the
        # estimate is stored as the already-cached device w2c HANDLE — no
        # per-frame inverse dispatch, no sync. `_traj_np` batch-inverts on
        # the host when the trajectory is actually read.
        self.traj["ts"].append(frame.ts)
        self.traj["ref"].append(np.linalg.inv(frame.gt_w2c))
        self.traj["est"].append(frame.w2c_matrix())

    def _traj_np(self, key: str) -> np.ndarray:
        """Materialize a trajectory as host c2w matrices. Entries are either
        np c2w (GT / resumed / already converted) or device w2c handles —
        the latter are converted in ONE bulk transfer + batched inversion."""
        entries = self.traj[key]
        if not entries:
            return np.zeros((0, 4, 4), np.float32)
        idx_dev = [i for i, m in enumerate(entries) if not isinstance(m, np.ndarray)]
        if idx_dev:
            conv = np.linalg.inv(np.asarray(jnp.stack([entries[i] for i in idx_dev])))
            for j, i in enumerate(idx_dev):
                entries[i] = conv[j]
        return np.stack(entries).astype(np.float32)

    # ---- finalization -------------------------------------------------------

    def finish(self) -> None:
        print("Finishing...")
        ids = self.mapper.keyframe_manager.ids()
        print(f"Keyframe IDs: {ids}")
        if self.final_global_opt:
            self.mapper.keyframe_optimization()
        os.makedirs(self.save_dir, exist_ok=True)
        self.save_ply(os.path.join(self.save_dir, "final_surfels.ply"))
        ckpt.save_checkpoint(
            os.path.join(self.save_dir, "checkpoint.npz"),
            self.mapper.surfels,
            extra={
                "traj_ref": self._traj_np("ref"),
                "traj_est": self._traj_np("est"),
                "ts": np.asarray(self.traj["ts"]),
                "time": np.int64(self.mapper.time),
            },
        )

    def save_ply(self, path: str) -> None:
        s = self.mapper.surfels
        act = np.asarray(s.active)
        # PLY is row-layout (N, k...); the SoA is transposed (k..., N) — a
        # full axis reversal maps between them for every field rank
        row = lambda x: np.asarray(x).T[act]
        plyio.save_ply(
            path,
            row(s.xyz),
            row(s.features_dc),
            row(s.features_rest),
            row(s.scaling),
            row(s.rotation),
            row(s.opacity),
        )
        print(f"Saved surfels to {path}")

    def resume(self, path: str) -> None:
        """Resume mid-run from a full-state checkpoint (counterpart of
        `finish()`'s checkpoint.npz). Unlike `reload` (PLY, 3DGS fields only,
        reference `system.py:140`), this restores the COMPLETE surfel SoA —
        fusion state eta/sigma2/counters included — plus the trajectory and
        frame clock, so mapping continues exactly where the run stopped."""
        s, extra = ckpt.load_checkpoint(path)
        self.mapper.surfels = s
        self.mapper._known_count = int(np.asarray(s.count))
        self.mapper._count_pending.clear()
        if "time" in extra:
            self.mapper.time = int(extra["time"])
        self.mapper._known_time = self.mapper.time - 1
        if "ts" in extra:
            self.traj = {
                "ts": list(np.asarray(extra["ts"])),
                "ref": [np.asarray(m) for m in extra.get("traj_ref", [])],
                "est": [np.asarray(m) for m in extra.get("traj_est", [])],
            }
        # rebuild the tracking model_map (render at the last estimated pose)
        # and the tracker's pose history, so the next frame tracks seamlessly
        if self.traj["est"]:
            last_c2w = np.asarray(self.traj["est"][-1])
            w2c = jnp.asarray(np.linalg.inv(last_c2w), jnp.float32)
            self.model_map = self._model_map_at(w2c)
            self.tracker._push_pose(w2c)
            self.tracker.initialized = True
        print(f"Resumed {int(np.asarray(s.count))} surfels @ frame {self.mapper.time} from {path}")

    def reload(self, path: str) -> None:
        """Load a PLY map back (reference `EGGFusion.reload`, `system.py:140`)."""
        data = plyio.load_ply(path)
        s = self.mapper.surfels
        n = len(data["xyz"])
        if n > s.capacity:  # grow to fit (bounded by the configured maximum)
            from eggfusion_tpu.core import surfels as sflib

            s = sflib.grow_surfels(s, self.mapper._bucket(n))
        n = min(n, s.capacity)

        def put(dst, src):
            # PLY rows (n, k...) -> transposed SoA (k..., n) leading slots
            # (full axis reversal, the inverse of save_ply's row())
            return dst.at[..., :n].set(jnp.asarray(src[:n], jnp.float32).T)

        self.mapper.surfels = s.replace(
            xyz=put(s.xyz, data["xyz"]),
            features_dc=put(s.features_dc, data["features_dc"]),
            features_rest=put(s.features_rest, data["features_rest"]) if data["features_rest"].shape[1] == s.features_rest.shape[1] else s.features_rest,
            scaling=put(s.scaling, data["scaling"]),
            rotation=put(s.rotation, data["rotation"]),
            opacity=put(s.opacity, data["opacity"]),
            active=s.active.at[:n].set(True),
            count=jnp.int32(n),
        )
        self.mapper._known_count = n
        self.mapper._known_time = self.mapper.time - 1
        self.mapper._count_pending.clear()
        print(f"Reloaded {n} surfels from {path}")

    # ---- evaluation ---------------------------------------------------------

    def evaluate_trajectory(self, plot: bool = True) -> float:
        os.makedirs(self.save_dir, exist_ok=True)
        ref = self._traj_np("ref")
        est = self._traj_np("est")
        ts = self.traj["ts"]

        tum_ref = [evalu.matrix_to_tum(t, m) for t, m in zip(ts, ref)]
        tum_est = [evalu.matrix_to_tum(t, m) for t, m in zip(ts, est)]
        np.savetxt(os.path.join(self.save_dir, "trajectory_ref_tum.txt"), tum_ref)
        np.savetxt(os.path.join(self.save_dir, "trajectory_est_tum.txt"), tum_est)
        np.savetxt(os.path.join(self.save_dir, "trajectory_ref.txt"), ref.reshape(-1, 16))
        np.savetxt(os.path.join(self.save_dir, "trajectory_est.txt"), est.reshape(-1, 16))

        # O(n) incremental sweep (VERDICT r3 #8): the naive per-prefix Horn
        # alignment is O(n^2) — minutes at TUM-length (1000s of frames)
        ates = evalu.cumulative_ate(ref[:, :3, 3], est[:, :3, 3])
        ate = float(ates[-1])

        if plot:
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure()
                plt.plot(ates)
                plt.title(f"ate:{ate}")
                plt.savefig(os.path.join(self.save_dir, "ates.png"))
                for a, b, name in [(0, 1, "xy"), (1, 2, "yz"), (0, 2, "xz")]:
                    plt.figure()
                    plt.plot(est[:, a, 3], est[:, b, 3])
                    plt.plot(ref[:, a, 3], ref[:, b, 3])
                    plt.legend(["es", "gt"])
                    plt.savefig(os.path.join(self.save_dir, f"traj_{name}.jpg"))
                plt.close("all")
            except Exception as e:  # headless plotting is best-effort
                print(f"plotting skipped: {e}")

        print(f"ATE RMSE: {ate:.05f}cm")
        return ate

    def evaluate_recon(self, thresh: float = 0.01) -> dict:
        """Reconstruction accuracy/completeness/F-score of the fused map vs
        the observed keyframe depth clouds (wires the reference's dead
        `eval_recon` flag — see `utils.eval.eval_recon`)."""
        kfs = self.mapper.keyframe_manager.keyframes.values()
        # adaptive stride: the observed cloud must be at least as dense as
        # the map, or cloud sparsity (pixel pitch * stride * depth / f)
        # floors the accuracy metric (test-size images need every pixel)
        clouds = [
            evalu.unproject_depth(
                np.asarray(kf.maps["depth"]), np.asarray(kf.intr),
                np.linalg.inv(np.asarray(kf.w2c)),
                stride=max(1, min(4, kf.width // 320)),
            )
            for kf in kfs
        ]
        s = self.mapper.surfels
        act = np.asarray(s.active)
        xyz = np.asarray(s.xyz).T[act]  # (M, 3)
        # a surfel is a DISK, not a point: completeness against the dense
        # depth cloud must sample the disk surface, or a map 50x sparser
        # than the cloud scores near-zero recall at any tight threshold.
        # 5 samples per surfel: center + 4 at +-0.7 sigma along the tangent
        # axes (the disk's covariance axes).
        q = np.asarray(s.rotation).T[act]  # (M, 4) wxyz, unnormalized
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        # rotation-matrix columns 0/1 (tangent axes) from the quaternion
        tu = np.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)], 1)
        tv = np.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)], 1)
        sc = np.exp(np.asarray(s.scaling).T[act][:, :2])
        du = 0.7 * sc[:, :1] * tu
        dv = 0.7 * sc[:, 1:2] * tv
        samples = np.concatenate([xyz, xyz + du, xyz - du, xyz + dv, xyz - dv])
        rep = evalu.eval_recon(samples, clouds, thresh=thresh) if clouds else {}
        if rep:
            os.makedirs(self.save_dir, exist_ok=True)
            with open(os.path.join(self.save_dir, "recon_metrics.json"), "w") as f:
                json.dump(rep, f, indent=2)
            print("Recon metrics:", {k: round(v, 5) if isinstance(v, float) else v
                                     for k, v in rep.items()})
        return rep

    @staticmethod
    @jax.jit
    def _device_render_metrics(ref_color, ref_depth, est_color, est_depth):
        """PSNR + masked depth-L1 computed ON DEVICE (held-out eval keeps
        frames device-resident; pulling full-res images to the host costs
        seconds each on a tunnel-attached TPU). Returns a (2,) vector."""
        mse = jnp.mean((ref_color - est_color) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        m = ref_depth > 0
        dl1 = jnp.sum(jnp.where(m, jnp.abs(ref_depth - est_depth), 0.0)) / jnp.maximum(
            jnp.sum(m.astype(jnp.float32)), 1.0)
        return jnp.stack([psnr, dl1])

    def evaluate_render_heldout(self) -> dict:
        """Held-out render metrics (VERDICT r4 #5): renders scored at stored
        NON-keyframe tracked poses — views the map optimizer never fit.
        PSNR/depth-L1 only (device-computed; SSIM needs host images)."""
        kf_uids = set(self.mapper.keyframe_manager.keyframes.keys())
        intr = _cal_intrinsics(self.cfg)
        ia = jnp.asarray([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32)
        rows = []
        for uid, w2c, color, depth in self._heldout:
            if uid in kf_uids:
                continue
            out = self.mapper._render_model(
                self.mapper.surfels, w2c, ia, intr.width, intr.height)
            v = np.asarray(self._device_render_metrics(
                color, depth, out["color"], out["depth"]))
            rows.append({"frame": uid, "psnr": float(v[0]), "depth_l1": float(v[1])})
        if not rows:
            return {}
        return {
            "per_frame": rows,
            "mean": {
                "psnr": float(np.mean([r["psnr"] for r in rows])),
                "depth_l1": float(np.mean([r["depth_l1"] for r in rows])),
            },
            "n_frames": len(rows),
        }

    def evaluate_render_dataset(self, dataset, train_pivot: np.ndarray | None = None) -> dict:
        """Score renders against an arbitrary dataset split at its GT poses
        — the ScanNet++ TEST-split evaluation the reference ships
        `train_test_lists.json` handling for but never drives (VERDICT r4
        #5). `dataset` is a loaded split (e.g. `load_dataset(cfg,
        test=True)`); `train_pivot` is the pivot of the split the map was
        BUILT from, so the test split's re-based poses are expressed in the
        run's world frame (each split re-bases on its own frame 0:
        w2c_run = w2c_split @ pivot_split @ inv(pivot_train))."""
        intr = _cal_intrinsics(self.cfg)
        ia = jnp.asarray([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32)
        adj = np.eye(4)
        if train_pivot is not None and getattr(dataset, "pivot", None) is not None:
            adj = np.asarray(dataset.pivot) @ np.linalg.inv(np.asarray(train_pivot))
        rows = []
        for i in range(len(dataset)):
            _ts, color, depth, _mask, w2c = dataset[i]
            w2c = jnp.asarray(np.asarray(w2c) @ adj, jnp.float32)
            out = self.mapper._render_model(
                self.mapper.surfels, w2c, ia, intr.width, intr.height)
            depth_m = (depth.astype(np.float32) / float(
                self.cfg.Dataset.Calibration.depth_scale))[..., None]
            r = evalu.eval_render(
                color.astype(np.float32) / 255.0, depth_m,
                np.asarray(out["color"]), np.asarray(out["depth"]))
            r["frame"] = i
            rows.append(r)
        if not rows:
            return {}
        vals = lambda k: [r[k] for r in rows
                          if isinstance(r.get(k), (int, float)) and np.isfinite(r[k])]
        rep = {
            "per_frame": [{k: v for k, v in r.items()
                           if not isinstance(v, float) or np.isfinite(v)} for r in rows],
            "mean": {k: float(np.mean(vals(k))) for k in ("psnr", "ssim", "depth_l1")
                     if vals(k)},
            "n_frames": len(rows),
        }
        os.makedirs(self.save_dir, exist_ok=True)
        with open(os.path.join(self.save_dir, "render_metrics_testsplit.json"), "w") as f:
            json.dump(rep, f, indent=2)
        return rep

    def evaluate_render(self) -> dict:
        """Render metrics over the keyframe set (wiring the reference's dead
        `eval_render` flag) plus a held-out section at non-keyframe tracked
        poses (see `evaluate_render_heldout`)."""
        results = []
        for kf in self.mapper.keyframe_manager.keyframes.values():
            out = self.mapper._render_model(
                self.mapper.surfels, jnp.asarray(kf.w2c), jnp.asarray(kf.intr), kf.width, kf.height
            )
            r = evalu.eval_render(
                kf.maps["color"], kf.maps["depth"], np.asarray(out["color"]), np.asarray(out["depth"])
            )
            results.append(r)
        if not results:
            return {}

        def nanmean(vals):
            # availability notes (e.g. lpips_note) pass through; metric
            # values are strictly numeric-or-None (None = unavailable)
            msgs = [v for v in vals if isinstance(v, str)]
            if msgs:
                return msgs[0]
            vals = [v for v in vals if v is not None and np.isfinite(v)]
            return float(np.mean(vals)) if vals else None  # None = strict JSON

        agg = {k: nanmean([r[k] for r in results]) for k in results[0]}
        held_out = self.evaluate_render_heldout()
        san = lambda v: v if isinstance(v, str) or v is None or np.isfinite(v) else None
        with open(os.path.join(self.save_dir, "render_metrics.json"), "w") as f:
            json.dump(
                {
                    "per_keyframe": [{k: san(v) for k, v in r.items()} for r in results],
                    "mean": agg,
                    "held_out": held_out,
                },
                f, indent=2,
            )
        print("Render metrics:", agg)
        if held_out:
            print("Held-out render metrics:", held_out["mean"],
                  f"({held_out['n_frames']} non-keyframe views)")
        return agg
