"""Mapping backend: keyframing, surfel spawning, fusion orchestration, and
sliding-window / global map optimization.

TPU-native equivalent of the reference `src/core/mapper.py` (`Mapping`,
`KeyFrame`, `KeyFrameManager`). Key redesigns:

* The per-frame map update (`surfels_preprocess`) is jit-compiled end to end:
  render -> rendered vertex/normal -> index map -> information fusion ->
  Bernoulli spawn-sampling -> masked append. Static shapes throughout
  (fixed spawn capacity instead of `torch.randperm` + `torch.cat` growth,
  `mapper.py:446-492`, `gaussian_surfels.py:152-167`).
* Map optimization is one jitted train step (render + loss + manual Adam with
  per-group learning rates, matching torch.optim.Adam semantics including the
  fresh-moments-per-round behavior of `mapper.py:338`).
* Keyframes snapshot their maps to HOST numpy (the reference's
  `KeyFrame.cpu()` migration, `mapper.py:54-66`) and are `device_put` per
  optimization iteration.
"""
from __future__ import annotations

import functools
from collections import deque
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eggfusion_tpu.core import surfels as sf
from eggfusion_tpu.geometry import transforms as tf
from eggfusion_tpu.ops import fusion
from eggfusion_tpu.ops import image as imops


class MapperConfig(NamedTuple):
    """Static mapping configuration (reference `Mapping:`/`Surfel:` config
    sections, `configs/replica/base.yaml:43-96`)."""

    local_map_iter: int = 3
    local_map_iter_init: int = 20
    final_global_opt_iter: int = 60
    add_opacity_thres: float = 0.8
    add_depth_thres: float = 0.05
    sample_ratio: float = 0.025
    sample_ratio_init: float = 0.2
    init_scale_ratio: float = 2.0
    fusion_dist_thres: float = 0.03
    sw_optimize_freq: int = 6
    sw_add_freq: int = 3
    color_weight: float = 1.0
    depth_weight: float = 1.0
    normal_weight: float = 1.0
    reg_weight: float = 10.0
    reg_weight_n: float = 1.0
    state_threshold: float = 30.0
    stable_confidence: float = 10.0
    spawn_cap: int = 32768
    spawn_cap_init: int = 262144
    border_pad: int = 7
    # live map maintenance (the working equivalent of the reference's dead
    # `merge_surfels` stable/unstable intent, `mapper.py:326-334,508-563`):
    # every `prune_freq` frames cull error-dominated / stale-unstable surfels
    # (`fusion.prune_unstable`), then compact the SoA when the fragmentation
    # (watermark - active) exceeds `compact_frag` of capacity so freed slots
    # are reused by later spawns. 0 disables.
    prune_freq: int = 30
    prune_max_age: int = 30
    compact_frag: float = 0.125
    # sliding-window optimization schedule:
    #   "burst"     — reference-exact (`mapper.py:180-195`): every
    #                 sw_optimize_freq frames run local_map_iter steps on
    #                 each window member (9-step ~500 ms frame spikes).
    #   "amortized" — same steps/second spread over every frame: 1-2 steps
    #                 per frame against a rotating window member, tile
    #                 binning cached across the member's rotation slot
    #                 (surfels move ~mm between frames — far below a tile),
    #                 Adam moments reset once per sw period (round parity).
    #                 No spikes, and the post-optimization re-render of opt
    #                 frames disappears (every frame's map update emits the
    #                 fused model map).
    opt_schedule: str = "amortized"
    # stochastic tile-subset map optimization (Pallas backend only): each
    # Adam step renders + backprops a random `opt_tile_fraction` subset of
    # the compositor tiles. The masked-mean gradient over the subset is an
    # approximately unbiased estimator of the full-image gradient (a ratio
    # estimator — it divides by the random subset's mask count), and
    # compositor cost (fwd + bwd kernels) scales with the fraction.
    # The dataclass default stays 1.0 = exact reference behavior (every
    # pixel, every step); the YAML/config layer owns the production value
    # (configs/base.yaml sets 0.5).
    opt_tile_fraction: float = 1.0
    # amortized-schedule step-budget scale: the amortized schedule runs
    # local_map_iter * |window| / sw_optimize_freq steps per frame (= the
    # reference's per-period step count); `opt_step_scale` multiplies that
    # rate. Each opt step carries a capacity-proportional FIXED cost
    # (projection, slab expand, back-map gather, Adam — ~10 ms at the 155k
    # rung) on top of the tile-fraction-scaled compositor cost, so fewer,
    # denser steps beat more, sparser ones at equal pixel budget (measured:
    # the r4 `steps1x075` A/B arm — 1.0 step/frame x tile 0.75 — matches
    # the 1.5 x 0.5 default on ATE/PSNR/depth-L1). 1.0 = reference rate;
    # the YAML layer owns the production value.
    opt_step_scale: float = 1.0


OPT_FIELDS = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


# sentinel returned by `Mapping.mapping` on settled fuse-only frames
# (Mapping.settled_skip): the system must KEEP the previous tracking model
# view instead of re-rendering one (None means "render after optimization")
KEEP_MODEL_MAP = "__keep_model_map__"


def _adam_init(params):
    zeros = lambda p: jnp.zeros_like(p)
    return {k: (zeros(v), zeros(v)) for k, v in params.items()}


def _adam_update(params, grads, moments, step, lrs):
    """torch.optim.Adam semantics (lr per group, betas (0.9, 0.999), eps 1e-8).

    `lrs` are traced scalars so learning-rate changes don't recompile.
    """
    new_params, new_moments = {}, {}
    t = step.astype(jnp.float32) + 1.0
    for k, p in params.items():
        g = grads[k]
        m, v = moments[k]
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        mhat = m / (1 - ADAM_B1**t)
        vhat = v / (1 - ADAM_B2**t)
        new_params[k] = p - lrs[k] * mhat / (jnp.sqrt(vhat) + ADAM_EPS)
        new_moments[k] = (m, v)
    return new_params, new_moments


def _masked_mean(x, mask):
    num = jnp.sum(jnp.where(mask, x, 0.0))
    den = jnp.maximum(jnp.sum(mask.astype(jnp.float32)) * (x.size / mask.size), 1.0)
    return num / den


def _safe_norm(x, axis=None, eps=1e-12):
    """sqrt(sum(x^2) + eps): finite gradient at ||x|| = 0, unlike
    jnp.linalg.norm (whose derivative x/||x|| NaNs the whole backward pass —
    e.g. the drift regularizer is exactly zero on the first Adam step)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def compute_image_loss(render_out: dict, kf: dict, mcfg: MapperConfig,
                       pix_mask: jnp.ndarray | None = None):
    """Per-keyframe image terms of the mapping loss (reference
    `compute_loss`, `mapper.py:381-444`): masked L1 color + L1 depth +
    (1 - cosine) normal. Split out from the map-global drift regularizer
    (`compute_reg_loss`) so the multi-chip window step can shard the image
    terms per keyframe while computing the regularizer once.

    `pix_mask` ((H, W) bool) restricts the image terms to the pixels a
    tile-subset render actually composited."""
    est_color = render_out["color"]
    est_depth = render_out["depth"]
    est_normal = render_out["normal"]

    mask = (kf["rgb_mask"] & kf["geo_mask"])[..., 0]  # (H, W)
    if pix_mask is not None:
        mask = mask & pix_mask
    m3 = mask[..., None]

    color_loss = _masked_mean(jnp.abs(kf["color"] - est_color), m3)
    depth_loss = _masked_mean(jnp.abs(kf["depth"] - est_depth), mask[..., None])

    cos = jnp.sum(kf["normal"] * est_normal, axis=-1) / (
        _safe_norm(kf["normal"], axis=-1) * _safe_norm(est_normal, axis=-1)
    )
    cos = jnp.clip(cos, -1 + 1e-6, 1 - 1e-6)
    normal_loss = _masked_mean(jnp.abs(1.0 - cos), mask)

    return (
        mcfg.color_weight * color_loss
        + mcfg.depth_weight * depth_loss
        + mcfg.normal_weight * normal_loss
    )


def compute_reg_loss(s: sf.SurfelMap, geo_snapshot: dict, mcfg: MapperConfig):
    """Drift regularizer vs the detached round-start geometry: global L2
    position norm (reference quirk: torch.norm over the whole tensor,
    `mapper.py:429`) + masked-mean normal cosine, pre-weighted by
    `reg_weight`."""
    reg_pos = _safe_norm(geo_snapshot["position"] - s.xyz)
    ncos = jnp.sum(geo_snapshot["normal"] * s.get_normal(), axis=0)
    ncos = jnp.clip(ncos, -1 + 1e-6, 1 - 1e-6)
    reg_norm = _masked_mean(jnp.abs(1.0 - ncos), s.active)
    return mcfg.reg_weight * (reg_pos + mcfg.reg_weight_n * reg_norm)


def compute_loss(render_out: dict, kf: dict, s: sf.SurfelMap, geo_snapshot: dict, mcfg: MapperConfig,
                 pix_mask: jnp.ndarray | None = None):
    """Full mapping loss (reference `compute_loss`, `mapper.py:381-444`) =
    image terms + drift regularizer."""
    return compute_image_loss(render_out, kf, mcfg, pix_mask) + compute_reg_loss(
        s, geo_snapshot, mcfg
    )


# slot reclamation: one argsort + gather over the SoA; donated so XLA can
# write the compacted fields in place of the old buffers
_compact_jit = jax.jit(sf.compact_surfels, donate_argnums=(0,))


@jax.jit
def _finite_fractions(kfm: dict) -> dict:
    return {k: jnp.mean(jnp.isfinite(v.astype(jnp.float32)).astype(jnp.float32))
            for k, v in kfm.items()}


def _check_nan_maps(kfm: dict, uid) -> None:
    """Validate keyframe loss inputs (reference `check_nan`, `mapper.py:21-27`)."""
    fracs = _finite_fractions(kfm)
    for k, frac in fracs.items():
        if float(np.asarray(frac)) < 1.0:
            raise FloatingPointError(f"non-finite values in keyframe uid={uid} map '{k}'")


@jax.jit
def _geo_snapshot(s: sf.SurfelMap) -> dict:
    """Round-start geometry for the drift regularizer. Fresh device buffers
    (xyz + 0.0, not an alias): opt_step donates the surfel SoA, so the
    snapshot must not share buffers with it."""
    return {"position": s.xyz + 0.0, "normal": s.get_normal()}


@functools.partial(jax.jit)
def _relative_pose_mag(w2c_a, w2c_b):
    """[rotation angle deg, translation dist] between two c2w poses as ONE
    (2,) device array — the keyframe check ships one async scalar pair, not
    two matrices or two separate syncs."""
    a = jnp.linalg.inv(w2c_a)
    b = jnp.linalg.inv(w2c_b)
    cos_theta = jnp.clip((jnp.trace(a[:3, :3].T @ b[:3, :3]) - 1) / 2, -1, 1)
    dR = jnp.degrees(jnp.arccos(cos_theta))
    dt = jnp.linalg.norm(a[:3, 3] - b[:3, 3])
    return jnp.stack([dR, dt])


class KeyFrame:
    """Snapshot of a frame + its maps (reference `KeyFrame`, `mapper.py:29-66`).

    The reference migrates maps to CPU to bound GPU memory; here maps stay
    device-resident by default (TPU HBM holds hundreds of keyframes, and a
    host round-trip per snapshot stalls the pipeline on remote-attached
    devices). Set `System.keyframe_storage: host` for very long sequences —
    `device_maps()` re-uploads on demand."""

    def __init__(self, frame, frame_map: dict, time: int, fid: int, storage: str = "device"):
        self.fid = fid
        self.time = time
        self.uid = frame.uid
        self.w2c = frame.w2c_matrix()  # device (4, 4)
        self.intr = frame.intr
        self.width, self.height = frame.width, frame.height
        maps = {
            "color": frame_map["color_map"],
            "depth": frame_map["depth_map"],
            "normal": frame_map["normal_map_c"],
            "rgb_mask": frame_map["rgb_mask"],
            "geo_mask": frame_map["geo_mask"],
        }
        self.storage = storage
        self.maps = {k: np.asarray(v) for k, v in maps.items()} if storage == "host" else maps

    def device_maps(self) -> dict:
        if self.storage == "host":
            return {k: jnp.asarray(v) for k, v in self.maps.items()}
        return self.maps


class KeyFrameManager:
    """Keyframe policy (reference `KeyFrameManager`, `mapper.py:68-116`):
    accept when rotation > check_keyframe_R deg or translation >
    check_keyframe_t vs the previous keyframe; frame 0 always. Maintains the
    sliding window deque."""

    def __init__(self, cfg):
        self.keyframes: dict[int, KeyFrame] = {}
        self.check_R = float(cfg.Tracking.check_keyframe_R)
        self.check_t = float(cfg.Tracking.check_keyframe_t)
        self.window_size = int(cfg.Tracking.sliding_window_size)
        self.sliding_window: deque = deque(maxlen=self.window_size)
        self.storage = str(cfg.System.get("keyframe_storage", "device"))
        # sync-free keyframe check (VERDICT r2 #2b): each frame `observe()`
        # dispatches the (dR, dt) magnitude vs the last keyframe and starts an
        # async copy; `check_keyframe` consumes the freshest observation at
        # least `check_lag` frames old — ready on host, so the decision costs
        # no device round trip. The trigger pose is <= check_lag frames stale
        # (~mm of motion against 20 deg / 0.3 m thresholds); the ACCEPTED
        # snapshot is always the current frame's.
        self.check_lag = max(1, int(cfg.Tracking.get("keyframe_check_lag", 2)))
        self._kf_gen = 0  # invalidates observations on keyframe accept
        self._pending_mag: deque = deque(maxlen=16)  # (time, gen, (2,) ref)

    def observe(self, frame, time: int) -> None:
        """Dispatch the pose-delta magnitude vs the last keyframe (async)."""
        if not self.keyframes:
            return
        prev = self.keyframes[self.ids()[-1]]
        mag = _relative_pose_mag(prev.w2c, frame.w2c_matrix())
        try:
            mag.copy_to_host_async()
        except Exception:
            pass
        self._pending_mag.append((time, self._kf_gen, mag))

    def _accept(self, kf) -> None:
        self.keyframes[kf.uid] = kf
        self._kf_gen += 1
        self._pending_mag.clear()

    def check_keyframe(self, frame, frame_map, time: int) -> bool:
        kf = KeyFrame(frame, frame_map, time, len(self.keyframes), self.storage)
        if time == 0 or not self.keyframes:
            self._accept(kf)
            return True
        ready = [
            m for (t, g, m) in self._pending_mag
            if g == self._kf_gen and t <= time - self.check_lag
        ]
        if ready:
            mag = np.asarray(ready[-1])
        else:
            # no aged observation (e.g. direct per-frame test calls, or the
            # frame right after an accept): fall back to the synchronous check
            mag = np.asarray(_relative_pose_mag(
                self.keyframes[self.ids()[-1]].w2c, kf.w2c))
        if float(mag[0]) > self.check_R or float(mag[1]) > self.check_t:
            self._accept(kf)
            return True
        return False

    def ids(self):
        return sorted(self.keyframes.keys())

    def __len__(self):
        return len(self.keyframes)


class Mapping:
    """Mapping orchestrator (reference `Mapping`, `mapper.py:118-586`)."""

    def __init__(self, cfg, renderer, surfel_cfg: sf.SurfelConfig | None = None):
        m = cfg.Mapping
        H = int(cfg.Dataset.Calibration.height)
        W = int(cfg.Dataset.Calibration.width)
        # model-view downsample (Tracking.model_view_down; see config.py):
        # the per-frame spawn/tracking model render runs at 1/down resolution
        self.view_down = int(cfg.Tracking.get("model_view_down", 1))
        if self.view_down > 1:
            assert W % self.view_down == 0 and H % self.view_down == 0, (
                f"model_view_down={self.view_down} must divide the frame "
                f"size ({W}x{H})")
        # settled-frame render skip (round 5b): on frames where the map is
        # settled (recent lag-N surfel counts flat within `settled_skip_tol`,
        # no failure streak, at most every other frame) the per-frame model
        # render + spawn are skipped and tracking keeps the previous view
        # (one frame staler). OFF by default (reference renders every frame,
        # `mapper.py:260-264`); the TPU-fast value lives in configs/base.yaml.
        self.settled_skip = bool(m.get("settled_skip", False))
        # spawn-activity gate: lag-N count spread must stay within
        # max(tol, tol_frac * count) — ABSOLUTE floor for big settled maps,
        # RELATIVE so toy-scale maps (adversarial probes at 320x240) with a
        # noise-driven spawn trickle never qualify as settled (measured:
        # a flat 256 let the noise arms skip, starve spawning 12.8k -> 7.5k
        # and double ATE)
        self.settled_skip_tol = int(m.get("settled_skip_tol", 64))
        self.settled_skip_tol_frac = float(m.get("settled_skip_tol_frac", 5e-4))
        # motion gate: staleness harm scales with inter-frame motion — skip
        # only under slow motion (lag-N readback of the tracked per-frame
        # pose delta). Measured: ungated, the clean rotation-burst arm
        # regressed 2.4 -> 13.1 cm; the burst's 2 deg/frame is 10x this gate.
        self.settled_skip_max_rot = float(m.get("settled_skip_max_rot", 0.3))
        self.settled_skip_max_trans = float(m.get("settled_skip_max_trans", 0.025))
        self._skip_last = False
        self.render_skips = 0  # observability: settled fuse-only frames
        self._count_hist: deque = deque(maxlen=3)
        self._prev_w2c_skip = None
        self._mag_pending: deque = deque()  # (time, (2,) [deg, m] ref)
        self._known_motion = None  # freshest consumed (deg, m)
        self._known_motion_time = -10
        self.mcfg = MapperConfig(
            local_map_iter=int(m.local_map_iter),
            local_map_iter_init=int(m.local_map_iter_init),
            final_global_opt_iter=int(m.final_global_opt_iter),
            add_opacity_thres=float(m.add_opacity_thres),
            add_depth_thres=float(m.add_depth_thres),
            sample_ratio=float(m.sample_ratio),
            sample_ratio_init=float(m.sample_ratio_init),
            init_scale_ratio=float(m.init_scale_ratio),
            fusion_dist_thres=float(m.fusion_dist_thres),
            sw_optimize_freq=int(m.sw_optimize_freq),
            sw_add_freq=int(m.sw_add_freq),
            color_weight=float(m.color_weight),
            depth_weight=float(m.depth_weight),
            normal_weight=float(m.normal_weight),
            reg_weight=float(m.reg_weight),
            reg_weight_n=float(m.reg_weight_n),
            state_threshold=float(m.state_threshold),
            spawn_cap=min(int(H * W * float(m.sample_ratio) * 2.0) + 256, H * W),
            spawn_cap_init=min(int(H * W * float(m.sample_ratio_init) * 1.5) + 256, H * W),
            opt_tile_fraction=float(m.get("opt_tile_fraction", 1.0)),
            opt_step_scale=float(m.get("opt_step_scale", 1.0)),  # validated below
            prune_freq=int(m.get("prune_freq", 30)),
            prune_max_age=int(m.get("prune_max_age", 30)),
            compact_frag=float(m.get("compact_frag", 0.125)),
            opt_schedule=str(m.get("opt_schedule", "amortized")),
        )
        # a non-positive rate would silently disable sliding-window
        # optimization forever (per_frame <= 0 -> the accumulator never
        # reaches 1) — surface the config error instead (ADVICE r4)
        if not self.mcfg.opt_step_scale > 0:
            raise ValueError(
                f"Mapping.opt_step_scale must be > 0 (got {self.mcfg.opt_step_scale})")
        if not 0 < self.mcfg.opt_tile_fraction <= 1:
            raise ValueError(
                f"Mapping.opt_tile_fraction must be in (0, 1] (got {self.mcfg.opt_tile_fraction})")
        # gate fusion/spawn on the dense-tracking convergence flag (VERDICT
        # r4 #3); off restores the reference's fuse-regardless behavior.
        # `gate_leak_streak`: after this many consecutive lagged failures
        # the gate OPENS again (full reference behavior) — a short failure
        # burst must not corrupt the map, but CHRONIC non-convergence
        # (noisy/miscalibrated regimes where the solver never meets the
        # strict thresholds) must not freeze it either: measured at 120x90
        # noisy-handheld, a never-leaking gate starved the map to 878
        # surfels and the emaciated model view produced a false-converged
        # 1.8 m pose commit; leaking restores the reference's drift regime.
        self.gate_fusion = bool(m.get("gate_fusion_on_tracking", True))
        self.gate_leak_streak = int(m.get("gate_leak_streak", 6))
        self.scfg = surfel_cfg or sf.SurfelConfig(
            capacity=int(cfg.Viewer.max_surfels_num),
            max_sh_degree=int(cfg.Surfel.max_sh_degree),
            active_sh_degree=int(cfg.Surfel.active_sh_degree),
            init_opacity=float(cfg.Surfel.init_opacity),
            alpha_p=float(cfg.Surfel.alpha_p),
            alpha_n=float(cfg.Surfel.alpha_n),
        )
        self.sw_lrs = {
            "xyz": float(m.position_lr),
            "features_dc": float(m.feature_lr),
            "features_rest": float(m.feature_lr) / 20.0,
            "opacity": float(m.opacity_lr),
            "scaling": float(m.scaling_lr),
            "rotation": float(m.rotation_lr),
        }
        self.global_lrs = {
            "xyz": float(m.final_position_lr),
            "features_dc": float(m.final_feature_lr),
            "features_rest": float(m.final_feature_lr) / 20.0,
            "opacity": float(m.final_opacity_lr),
            "scaling": float(m.final_scaling_lr),
            "rotation": float(m.final_rotation_lr),
        }

        self.renderer = renderer
        self.keyframe_manager = KeyFrameManager(cfg)
        # multi-chip (VERDICT r3 #4): System.mesh_devices >= 1 switches the
        # sliding-window/global optimization to the window-BATCHED,
        # keyframe-sharded shard_map step (parallel.mesh) — the same
        # algorithm at any device count, so mesh=1 == mesh=N trajectories.
        # 0 (default) keeps the reference's sequential per-keyframe loop.
        self.mesh = None
        self._window_opt_step = None
        mesh_devices = int(cfg.System.get("mesh_devices", 0))
        if mesh_devices >= 1:
            from eggfusion_tpu.parallel import mesh as pmesh

            self.mesh = pmesh.make_mesh(mesh_devices)
        # NaN sentinel parity (reference `check_nan` + hard exit on NaN loss,
        # `mapper.py:21-27,440-442`): when System.check_nan is on, every
        # optimization step syncs the loss and every keyframe's maps are
        # validated before use; a NaN raises instead of silently corrupting
        # the map. Debug mode — each check is a host round-trip.
        self.debug_nan = bool(cfg.System.get("check_nan", False))
        # postprocess thresholds (static): the fused map-update program also
        # emits the next frame's tracking model map (see `map_update`)
        self._system_cfg = {
            "reco_normal_thres": float(cfg.System.reco_normal_threshold),
            "reco_depth_thres": float(cfg.System.reco_depth_threshold),
            "reco_opacity_thres": float(cfg.System.reco_opacity_threshold),
            "depth_min": float(cfg.System.depth_range_min),
            "depth_max": float(cfg.System.depth_range_max),
            "nlevel": int(cfg.Tracking.pyramid_level),
            # depth bilateral-filter variant for the model-view pyramid's
            # per-level re-filter (System.bilateral_mode)
            "bilateral": str(cfg.System.get("bilateral_mode", "exact")),
        }
        # capacity bucketing: start in a small bucket and grow geometrically
        # (see `sf.grow_surfels`). Per-frame program cost then tracks the
        # actual map size instead of the configured maximum.
        self.max_capacity = self.scfg.capacity
        self.bucketing = bool(cfg.System.get("capacity_bucketing", True))
        # bucket ladder (round 4): geometric rungs of factor `bucket_factor`
        # rounded to 8192, replacing power-of-two buckets. Every render-path
        # cost is O(capacity) (binning sorts, slab back-map, projection,
        # Adam), and the pow2 ladder wasted up to 2x: the 1280x704 bench ran
        # its 131k-surfel map in a 524288 bucket — measured N-costs double
        # the 262144-capacity numbers ACCURACY.md r3 quoted. Finer rungs
        # mean more per-bucket compiles; `_maybe_precompile` warms the next
        # rung in a background thread before growth needs it.
        factor = float(cfg.System.get("bucket_factor", 1.4))
        # round 5: coarsen the ladder above `bucket_coarse_at` (default
        # 512k). Above half a million surfels each rung's programs cost
        # 10-163 s to cold-compile through the tunnel (r4 envelope sweep)
        # while rung dwell time grows with capacity anyway — fewer, bigger
        # rungs there trade a little O(capacity) slack for far fewer compile
        # storms (1M ladder: 15 rungs -> 12; 3M: 23 -> 14).
        coarse_at = int(cfg.System.get("bucket_coarse_at", 524288))
        factor_large = float(cfg.System.get("bucket_factor_large", 2.0))
        self._ladder = []
        c = 32768
        while c < self.max_capacity:
            self._ladder.append(c)
            f = factor if c < coarse_at else factor_large
            c = -(-int(c * f) // 8192) * 8192
        self._ladder.append(self.max_capacity)
        # spawn headroom budgeted above the freshest consumed count. The r3
        # budget charged a FULL spawn_cap for every not-yet-consumed frame
        # (lag x 45k at 1280x704), pushing the bucket a rung or two above
        # the live map. spawn_cap is already 2x the Bernoulli expectation
        # over every eligible pixel; steady-state spawns are a few hundred.
        # If a burst outruns the margin, `append_surfels` drops the
        # overflow for the 1-2 frames until the lag-N count readback
        # triggers growth (drop-at-capacity is the documented policy) —
        # transient spawn loss, re-spawned next frame, never a stall.
        self._spawn_margin = self.mcfg.spawn_cap // 8 + 2048
        # System.min_capacity: initial-bucket floor for KNOWN-large scenes —
        # sustained exploration can grow rungs faster than background
        # campaigns compile through a tunnel (measured: the 1M orbit sweep
        # crosses 4 rungs in ~2 min while a rung campaign needs minutes), so
        # a production user who knows the scene scale should start at it
        # and skip the growth path entirely.
        self._min_capacity = int(cfg.System.get("min_capacity", 0))
        init_cap = (
            self._bucket(self.mcfg.spawn_cap_init + self._spawn_margin)
            if self.bucketing else self.max_capacity
        )
        self.surfels = sf.SurfelMap.empty(self.scfg._replace(capacity=init_cap))
        self._known_count = 0  # count after frame `_known_time` (host mirror)
        self._known_time = -1
        # (time, device-scalar) async count copies, oldest first; consumed
        # once `count_lag` frames old so growth checks never stall the host
        self._count_pending: deque = deque()
        self.count_lag = max(1, int(cfg.System.get("count_lag", 2)))
        # amortized-schedule state
        self._opt_acc = 0.0  # fractional step accumulator
        self._opt_cache = None  # the binning used by the current opt step
        self._opt_cache_map: dict = {}  # per-member binning, window lifetime
        self._window_batch_cache = None  # (uids, batch) for the mesh path
        self.opt_steps_total = 0  # host-exact count of map-opt Adam steps
        self._loss_pending: deque = deque()  # (time, loss ref) lag-N copies
        self.opt_losses: dict[int, float] = {}  # consumed opt-loss readbacks
        self._opt_geo = None  # drift-regularizer anchor for the current round
        self._opt_moments = None
        self._opt_stepno = None
        self._maint_pending = None  # (time, count, active) refs of a deferred prune
        # background next-bucket precompile state (see `_maybe_precompile`)
        self._fm_sds = None  # frame_map ShapeDtypeStructs (captured live)
        self._wh = None
        self._precompiled: set[int] = set()
        self._ready_buckets: set[int] = set()
        self._precompile_thread = None
        self._compile_queue: list[int] = []  # caps awaiting a campaign slot
        self.compile_events: list[tuple[int, int]] = []  # (time, cap) finished
        self._shrink_target: int | None = None
        self._shrink_cooldown = 0
        self.precompile_hooks: list = []  # fn(capacity, thunks) extensions
        # fusion observability (VERDICT r3 #5): per-frame (fused, error)
        # pixel counts, shipped as lag-N async copies like the count/converged
        # readbacks; consumed into `fusion_stats` {time: (fused, error)}
        self._stats_pending: deque = deque()
        self.fusion_stats: dict[int, tuple[int, int]] = {}
        # adaptive model-render cap (round 5, see Renderer.adaptive_model_cap):
        # start at the safe raster_cap; drop to model_cap_min once the lag-N
        # occupancy signal stays under the small slab's stratified ceiling
        # for `_occ_streak_need` frames; escalate back IMMEDIATELY on any
        # reading near the ceiling. model_cap == 0 means "renderer default".
        self._adaptive_cap = self.renderer.adaptive_model_cap
        self.model_cap = self.renderer.raster_cap if self._adaptive_cap else 0
        self._occ_streak = 0
        self.cap_switches: list[tuple[int, int]] = []  # (time, new_cap) log
        if self._adaptive_cap:
            from eggfusion_tpu.ops import raster_pallas as rp

            capsub = self.renderer.model_cap_min // rp.N_SUB
            near = capsub * 3 // 4
            # `ceiling` is where the small slab starts CLIPPING depth (the
            # stratified tail represents runs up to near + tail_slots *
            # TAIL_STRIDE). Thresholds are deliberately CONSERVATIVE
            # (0.8 / 0.96 of ceiling): an A/B at 0.90/0.98 let the bench map
            # (occupancy ~390 vs ceiling 448) switch down and the tail
            # stratification visibly cost coverage — spawns inflated 131k ->
            # 151k within 40 frames (the visible surface of grazing-angle
            # sub-columns ranks deep in the candidate run, so the strided
            # tail drops covering splats, opacity dips below the spawn
            # threshold, and the map balloons). 0.8*ceiling keeps the switch
            # strictly in the regime where the near-exact slots hold the
            # whole visible surface.
            ceiling = near + (capsub - near) * rp.TAIL_STRIDE
            self._occ_down = int(ceiling * 0.80)
            self._occ_up = int(ceiling * 0.96)
            self._occ_streak_need = 20
        self.time = 0
        self.model_map: dict | None = None
        self._rng = jax.random.PRNGKey(int(cfg.System.get("seed", 0)))
        self._build_jitted_fns()

    # ------------------------------------------------------------------ jit --

    def _build_jitted_fns(self):
        mcfg = self.mcfg
        scfg = self.scfg
        render_at = self.renderer.render_at
        sh_degree = self.renderer.active_sh_degree

        sys_cfg = self._system_cfg

        # donate_argnums: the surfel SoA is tens of MB at production capacity;
        # donating lets XLA update it in place instead of copying the
        # pass-through fields every call.
        want_occ = self.renderer.adaptive_model_cap

        @functools.partial(jax.jit, static_argnames=("width", "height", "first", "full_post",
                                                     "model_cap", "down", "do_render"),
                           donate_argnums=(0,))
        def map_update(s: sf.SurfelMap, frame_map: dict, w2c, intr, time, root_key,
                       width: int, height: int, first: bool, full_post: bool,
                       model_cap: int = 0, conv=None, down: int = 1,
                       do_render: bool = True):
            """Per-frame map update (reference `surfels_preprocess`,
            `mapper.py:242-324`): fuse then spawn.

            Deviation from the reference's render schedule (documented): the
            reference renders the model TWICE per frame — once pre-fusion for
            the spawn mask (`mapper.py:260-264`) and once post-update for the
            next frame's tracking view (`system.py:55`). Here fusion is
            render-free (gather-form, `ops.fusion.fuse_frame`), so ONE
            post-fusion render serves both: with `full_post`, the same render
            also produces the postprocess model map (`postprocess_model_map`).
            Spawn regions fail its opacity gate (< reco_opacity_threshold)
            either way and fall back to frame pixels — exactly the values
            just-spawned surfels would render to. On sliding-window
            optimization frames the caller passes `full_post=False` (the
            model map must be re-rendered AFTER the optimization to match
            the reference, so the spawn render stays geometry-only).

            `conv` (device bool scalar) gates fusion AND spawning on the
            CURRENT frame's dense-tracking convergence (VERDICT r4 #3 /
            ADVICE r3): the reference keeps fusing at wrong poses for the
            whole failure streak (its fallback only affects the POSE,
            `tracker.py:153-170`), so a fast-rotation break corrupts the map
            before recovery fires. Because the flag is consumed on-device,
            the gate has zero lag and zero host syncs — a non-converged
            frame's measurements simply never touch the map (geo gate) and
            never spawn. The tracking view still renders (the system uses it
            to re-lock).

            `do_render=False` (Mapping.settled_skip, round 5b): fuse-only
            frame — the model render, spawn mask and spawning are skipped
            entirely and the caller keeps tracking against the previous
            model view (one frame staler). The host only chooses this on
            SETTLED frames: alternate frames at most, zero recent spawns
            (lag-N counts flat), no failure streak — so formation,
            exploration and recovery frames always render. The settledness
            signals are the same lag-N readbacks that feed capacity
            management, so the gate costs no syncs; coverage loss is
            self-correcting because any spawn burst un-settles the counts
            and re-enables per-frame renders within `count_lag` frames."""
            from eggfusion_tpu.system import postprocess_model_map

            key = jax.random.fold_in(root_key, time)  # per-frame key, in-program
            depth = frame_map["depth_map"]
            stats_vec = None
            model_map = None
            if conv is None:
                conv = jnp.bool_(True)
            if not first:
                # convergence gate: a False flag zeroes the geometry-valid
                # mask, so association, fusion and error counting all no-op
                geo_gate = frame_map["geo_mask"] & conv
                s, stats = fusion.fuse_frame(
                    s, w2c, intr,
                    frame_map["vertex_map_w"], frame_map["normal_map_w"],
                    frame_map["color_map"], depth, geo_gate,
                    mcfg.fusion_dist_thres, scfg,
                )
                if not do_render:  # settled fuse-only frame (no spawn)
                    s = sf.update_stability(s, mcfg.stable_confidence)
                    stats_vec = jnp.stack(
                        [stats.fused_pixels, stats.error_pixels, jnp.int32(-1)])
                    return s, None, stats_vec
                # model view at 1/down resolution (Tracking.model_view_down):
                # the spawn mask is computed on the downsampled grid and
                # nearest-upsampled; fusion above stays full-res
                intr_r = intr / down if down > 1 else intr
                model = render_at(sf.render_params(s), w2c, intr_r,
                                  width // down, height // down,
                                  geom_only=not full_post, need_grad=False,
                                  cap=model_cap or None, with_occupancy=want_occ)
                # fused/error pixel counts + the true binning occupancy
                # packed as ONE (3,) i32 vector so the host ships a single
                # async copy per frame (fusion observability — the canary
                # that catches coverage regressions: fused collapsing to 0
                # while spawns hit cap was the round-2 death-spiral
                # signature; occupancy drives the adaptive model cap)
                occ = model.pop("max_occupancy", jnp.int32(-1))
                stats_vec = jnp.stack(
                    [stats.fused_pixels, stats.error_pixels, occ])
                depth_d = depth[::down, ::down] if down > 1 else depth
                opacity_mask = model["opacity"] < mcfg.add_opacity_thres
                depth_err = model["depth"] - depth_d  # foreground-hole aware (`mapper.py:311`)
                sample_mask = ((opacity_mask | (depth_err > mcfg.add_depth_thres))
                               & (depth_d > 0) & conv)
                if down > 1:  # nearest-upsample: spawn picks full-res pixels
                    sample_mask = jnp.repeat(
                        jnp.repeat(sample_mask, down, axis=0), down, axis=1)
                ratio = mcfg.sample_ratio
                cap = mcfg.spawn_cap
                if full_post:
                    rendered = {
                        "render_color": model["color"],
                        "render_depth": model["depth"],
                        "render_normal": model["normal"],
                        "render_opacity": model["opacity"],
                    }
                    model_map = postprocess_model_map(
                        rendered, frame_map, intr, w2c,
                        sys_cfg["reco_normal_thres"], sys_cfg["reco_depth_thres"],
                        sys_cfg["reco_opacity_thres"], sys_cfg["depth_min"],
                        sys_cfg["depth_max"], sys_cfg["nlevel"], down=down,
                        bilateral=sys_cfg["bilateral"],
                    )
            else:
                sample_mask = depth > 0
                ratio = mcfg.sample_ratio_init
                cap = mcfg.spawn_cap_init

            batch = _sample_spawn(
                frame_map, sample_mask[..., 0], ratio, cap, key, intr, mcfg, scfg
            )
            s = sf.append_surfels(s, batch, time, scfg.init_opacity)
            s = sf.update_stability(s, mcfg.stable_confidence)
            return s, model_map, stats_vec

        @functools.partial(jax.jit, static_argnames=("width", "height"))
        def render_model(s: sf.SurfelMap, w2c, intr, width: int, height: int):
            return render_at(sf.render_params(s), w2c, intr, width, height,
                             need_grad=False)

        use_tile_subset = (
            mcfg.opt_tile_fraction < 1.0 and self.renderer.backend == "pallas"
        )
        # NOTE: the tile-subset PRNG key is passed as an ARGUMENT, not closed
        # over: a device-array constant in a jitted closure forces a
        # device->host readback during .lower(), which on a tunnel-attached
        # TPU stalls compilation for the full link round-trip (observed up to
        # minutes on a degraded link).
        self._tile_rng = jax.random.PRNGKey(0x7115)

        @functools.partial(jax.jit, static_argnames=("width", "height"),
                           donate_argnums=(0, 1))
        def opt_step(s: sf.SurfelMap, moments, step, kf: dict, w2c, intr,
                     geo_snapshot: dict, lrs: dict, width: int, height: int,
                     cache=None, tile_rng=None):
            """One render+loss+Adam map-optimization step (reference
            `frame_batch_optimization` inner loop, `mapper.py:351-368`).

            `cache` is an optional per-camera render cache (tile binning) —
            Adam moves positions by ~1e-5 m per step, so tile assignments
            stay valid across the few steps run on one keyframe."""
            params = {k: getattr(s, k) for k in OPT_FIELDS}

            tile_keep = pix_mask = None
            if use_tile_subset:
                from eggfusion_tpu.ops import raster_pallas as rp

                key = jax.random.fold_in(tile_rng, step)  # tile_rng is an arg
                nt = rp.n_tiles_static(width, height)
                tile_keep = jax.random.uniform(key, (nt,)) < mcfg.opt_tile_fraction
                pix_mask = rp.tile_pixel_mask(tile_keep, width, height)

            def loss_fn(p):
                s2 = s.replace(**p)
                out = render_at(sf.render_params(s2), w2c, intr, width, height,
                                cache=cache, tile_keep=tile_keep,
                                cap=self.renderer.opt_raster_cap)
                return compute_loss(out, kf, s2, geo_snapshot, mcfg, pix_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            new_params, moments = _adam_update(params, grads, moments, step, lrs)
            s = s.replace(**new_params)
            return s, moments, step + 1, loss

        def _sample_spawn(frame_map, sample_mask, ratio, cap, key, intr, mcfg, scfg):
            """Spawn-candidate sampling (reference `sample_for_init_surfels`,
            `mapper.py:446-492`) — Bernoulli per-pixel selection at probability
            `ratio` (statistically equivalent to the reference's exact-count
            randperm subset, but sort-free / static-shape) with 7-px border
            exclusion, compacted into a fixed-size SpawnBatch."""
            depth = frame_map["depth_map"][..., 0]
            normal = frame_map["normal_map_w"]
            H, W = depth.shape
            pad = mcfg.border_pad
            border = jnp.zeros((H, W), bool).at[pad:-pad, pad:-pad].set(True)
            invalid_normal = jnp.all(normal == 0, axis=-1)
            mask = sample_mask & border & ~invalid_normal

            u = jax.random.uniform(key, (H, W))
            sel = mask & (u < ratio)
            # Compact up to `cap` selected pixels WITHOUT a scatter or sort:
            # split the image into `cap` groups of G consecutive pixels and
            # keep each group's max-u selected pixel (a ~0.2 ms argmax reduce;
            # the cumsum+scatter compaction it replaces serialized 901k scatter
            # updates, ~4.2 ms at 1280x704 on v5e). At most one spawn per G
            # pixels: for sparse masks this matches Bernoulli selection, and
            # when oversubscribed it spends the same `cap` budget spatially
            # uniformly instead of the old scheme's top-of-image truncation.
            HW = H * W
            G = -(-HW // cap)
            u_flat = jnp.where(sel, u, -1.0).reshape(-1)
            u_flat = jnp.pad(u_flat, (0, cap * G - HW), constant_values=-1.0)
            groups = u_flat.reshape(cap, G)
            g_arg = jnp.argmax(groups, axis=1).astype(jnp.int32)
            valid = jnp.max(groups, axis=1) >= 0.0
            idx = jnp.minimum(jnp.arange(cap, dtype=jnp.int32) * G + g_arg, HW - 1)

            fx, fy = intr[0], intr[1]
            d = depth.reshape(-1)[idx]
            p = frame_map["vertex_map_w"].reshape(-1, 3)[idx]
            n = normal.reshape(-1, 3)[idx]
            c = frame_map["color_map"].reshape(-1, 3)[idx]
            dist = jnp.stack(
                [mcfg.init_scale_ratio * d / fx, mcfg.init_scale_ratio * d / fy, jnp.zeros_like(d)],
                axis=-1,
            )
            s2p = jnp.maximum((d * scfg.alpha_p) ** 2, 1e-12)
            s2n = jnp.maximum((d * scfg.alpha_n) ** 2, 1e-12)
            eta = jnp.concatenate([p / s2p[:, None], n / s2n[:, None]], axis=-1)
            return sf.SpawnBatch(
                xyz=p, normal=n, color=c, dist=dist, eta=eta,
                sigma2=jnp.stack([s2p, s2n], axis=-1), valid=valid,
            )

        precompute_cache = self.renderer.precompute_cache

        @functools.partial(jax.jit, static_argnames=("width", "height"))
        def bin_cache(s: sf.SurfelMap, w2c, intr, width: int, height: int):
            # the binning cache feeds opt_step only -> bin at the OPT cap
            return precompute_cache(sf.render_params(s), w2c, intr, width, height,
                                    cap=self.renderer.opt_raster_cap)

        self._map_update = map_update
        self._render_model = render_model
        self._opt_step = opt_step
        self._bin_cache = bin_cache
        if self.mesh is not None:
            from eggfusion_tpu.parallel import mesh as pmesh

            self._window_opt_step = pmesh.make_window_opt_step(
                render_at, mcfg, self.mesh, opt_cap=self.renderer.opt_raster_cap
            )

    def warmup_lowerings(self, frame, frame_map: dict) -> list:
        """(label, thunk) pairs that `.lower(...).compile()` every mapping
        program at production shapes WITHOUT executing it (VERDICT r2 #3:
        frame-0 otherwise compiles ~6 programs serially, 15-130 s each on a
        tunnel-attached TPU). Thunks are independent — run them in a thread
        pool: each backend compile releases the GIL, so distinct programs
        compile concurrently. Results land in the persistent compilation
        cache; the later real calls re-trace (cheap) and hit it."""
        W, H = frame.width, frame.height
        if self._fm_sds is None:  # enable ladder precompile straight from warmup
            self._fm_sds = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), frame_map
            )
            self._wh = (W, H)
        s = self.surfels
        w2c = frame.w2c_matrix()
        intr = frame.intr
        t0 = jnp.int32(0)
        kfm = {
            "color": frame_map["color_map"],
            "depth": frame_map["depth_map"],
            "normal": frame_map["normal_map_c"],
            "rgb_mask": frame_map["rgb_mask"],
            "geo_mask": frame_map["geo_mask"],
        }
        params = {k: getattr(s, k) for k in OPT_FIELDS}
        moments = _adam_init(params)
        geo = _geo_snapshot(s)
        lrs = self._lrs_dev(self.sw_lrs)

        conv = jnp.bool_(True)
        thunks = [
            ("map_update", lambda: self._map_update.lower(
                s, frame_map, w2c, intr, t0, self._rng, width=W, height=H,
                first=False, full_post=True, model_cap=self.model_cap,
                conv=conv, down=self.view_down).compile()),
            ("map_update_first", lambda: self._map_update.lower(
                s, frame_map, w2c, intr, t0, self._rng, width=W, height=H,
                first=True, full_post=True, model_cap=self.model_cap,
                conv=conv, down=self.view_down).compile()),
            ("render_model", lambda: self._render_model.lower(
                s, w2c, intr, width=W, height=H).compile()),
            ("bin_cache", lambda: self._bin_cache.lower(
                s, w2c, intr, width=W, height=H).compile()),
            ("opt_step", lambda: self._opt_step.lower(
                s, moments, jnp.int32(0), kfm, w2c, intr, geo, lrs, W, H,
                None, self._tile_rng).compile()),
            ("pose_mag", lambda: _relative_pose_mag.lower(w2c, w2c).compile()),
            ("compact", lambda: _compact_jit.lower(s).compile()),
        ]
        if self.settled_skip:
            thunks.append(("map_update_skip", lambda: self._map_update.lower(
                s, frame_map, w2c, intr, t0, self._rng, width=W, height=H,
                first=False, full_post=True, model_cap=self.model_cap,
                conv=conv, down=self.view_down, do_render=False).compile()))
        if self._adaptive_cap:
            thunks.append(("map_update_lowcap", lambda: self._map_update.lower(
                s, frame_map, w2c, intr, t0, self._rng, width=W, height=H,
                first=False, full_post=True,
                model_cap=self.renderer.model_cap_min, conv=conv,
                down=self.view_down).compile()))
        if self.renderer.backend == "pallas":
            # the cached-binning opt_step variant (amortized hot path) has a
            # different signature (cache pytree instead of None): lower it
            # against a freshly computed cache value
            def opt_step_cached():
                cache = self._bin_cache(s, w2c, intr, width=W, height=H)
                return self._opt_step.lower(
                    s, moments, jnp.int32(0), kfm, w2c, intr, geo, lrs, W, H,
                    cache, self._tile_rng).compile()

            thunks.append(("opt_step_cached", opt_step_cached))
        return thunks

    # ----------------------------------------------------------------- host --

    def _bucket(self, needed: int) -> int:
        """Smallest ladder rung >= needed (see `_ladder`), capped; floored
        at `System.min_capacity` so a known-large scene starts at scale and
        the shrink path never slices below it."""
        needed = min(max(needed, self._min_capacity), self.max_capacity)
        for c in self._ladder:
            if c >= needed:
                return c
        return self.max_capacity

    def _consume_counts(self) -> None:
        """Fold in surfel-count readbacks at least `count_lag` frames old
        (async copies — reading them never blocks on device progress)."""
        while self._count_pending and self._count_pending[0][0] <= self.time - self.count_lag:
            t, ref = self._count_pending.popleft()
            self._known_count = int(np.asarray(ref))
            self._known_time = t
            self._count_hist.append(self._known_count)

    def _cap_needed(self) -> int:
        """Capacity the map needs right now: freshest consumed count plus the
        spawn headroom (`_spawn_margin`; the frame-0 init burst while no
        count has been consumed yet)."""
        need = self._known_count + self._spawn_margin
        if self._known_time < 0:
            need += self.mcfg.spawn_cap_init
        return need

    def _ensure_capacity(self, first: bool) -> None:
        """Grow the surfel SoA if the map could outgrow it.

        Count readbacks are pipelined with lag N (like the tracker's
        converged flags): each frame's post-update count starts an async
        device->host copy, and only copies at least `count_lag` frames old
        are consumed — so the host never waits for the device to catch up
        (a lag-1 read forces a full host/device round trip per frame on
        remote-attached TPUs). Spawns that outrun the margin drop at
        capacity for the 1-2 frames until the count catches up (see
        `_spawn_margin`)."""
        self._consume_counts()
        cap_needed = self._cap_needed()
        if cap_needed > self.surfels.capacity:
            self.surfels = sf.grow_surfels(self.surfels, self._bucket(cap_needed))
            self._invalidate_capacity_state()
            self._shrink_target = None
            # a growth event is strong evidence of a growth TREND (sustained
            # exploration spawns ~10k/frame at 1280x704 — the one-margin
            # trigger below gives < 1 frame of warning there): start the
            # NEXT rung's compile campaign immediately so it gets the whole
            # current rung's dwell time instead of the last margin of it
            # (measured on the orbit envelope sweep: rung entries outran the
            # margin-triggered campaign and paid 140-160 s cold inline
            # compiles through the tunnel; warm persistent-cache runs
            # retrace in ~1 s either way)
            if self.surfels.capacity < self.max_capacity:
                self._request_bucket_compile(self._bucket(self.surfels.capacity + 1))
        elif self.bucketing:
            # pre-warm the NEXT rung before growth could need it. Trigger at
            # one spawn-margin of headroom BELOW the growth point (growth
            # fires at cap_needed > capacity): late enough that a stable map
            # sitting anywhere under that never launches a wasted campaign
            # (whose tunnel-RPC contention showed up as a 659 ms frame in
            # the r4 bench), early enough for cache-hit recompiles; a cold
            # campaign that loses the race just means growth falls back to
            # the inline compile it always tolerated.
            if cap_needed + self._spawn_margin > self.surfels.capacity \
                    and self.surfels.capacity < self.max_capacity:
                self._request_bucket_compile(self._bucket(self.surfels.capacity + 1))
            self._consider_shrink(cap_needed)

    def _consider_shrink(self, cap_needed: int) -> None:
        """Live-loop shrink: when the map sits a full rung (plus a margin of
        hysteresis) below its bucket — after the frame-0 init burst settles,
        or after heavy pruning — request the smaller rung's programs in the
        background and slice down once they are compiled. Shrinking before
        the programs exist would stall the loop for the full compile
        (tens of seconds cold through a tunnel-attached TPU)."""
        rung = self._bucket(cap_needed + self._spawn_margin)  # hysteresis
        if rung >= self.surfels.capacity:
            self._shrink_target = None
            return
        if self.time < self._shrink_cooldown:
            return
        if self._shrink_target != rung:
            self._shrink_target = rung
            self._request_bucket_compile(rung)
        if not self._bucket_ready(rung):
            return
        # one-shot sync: the exact watermark decides safety (rare event)
        wm = int(np.asarray(self.surfels.count))
        if wm <= rung:
            self.surfels = sf.shrink_surfels(self.surfels, rung)
            self._invalidate_capacity_state()
            self._known_count = wm
            self._known_time = self.time
            self._count_pending.clear()
        else:
            # fragmentation holds the watermark above the rung: retrying
            # every frame would pay this sync read per frame — wait for
            # the next maintenance cycle to compact first
            self._shrink_cooldown = self.time + max(self.mcfg.prune_freq, 1)
        self._shrink_target = None

    def _invalidate_capacity_state(self) -> None:
        """A capacity change invalidates amortized-opt per-capacity state."""
        self._opt_cache = None
        self._opt_cache_map = {}
        self._opt_moments = None

    def _request_bucket_compile(self, cap: int) -> None:
        """Queue `cap`'s programs for background compilation (round 4): a
        mid-run growth/shrink otherwise compiles ~6 programs inline — a
        multi-second stall even with the persistent cache, tens of seconds
        cold through a tunnel-attached TPU. One compile campaign runs at a
        time; further requests queue (ADVICE r4: the old one-shot dropped a
        request arriving while a campaign was alive — exactly the sustained-
        growth case the precompile exists for) and `_pump_compiles` starts
        the next one as soon as the thread frees up."""
        if self._fm_sds is None or cap in self._precompiled:
            return
        self._precompiled.add(cap)
        self._compile_queue.append(cap)
        self._pump_compiles()

    def _pump_compiles(self) -> None:
        """Start the next queued compile campaign if none is running.

        Campaigns lower from ShapeDtypeStructs (no device buffers); backend
        compiles release the GIL so frames keep flowing. The later real
        calls re-trace (cheap) and hit the persistent compilation cache."""
        if not self._compile_queue:
            return
        if self._precompile_thread is not None and self._precompile_thread.is_alive():
            return
        cap = self._compile_queue.pop(0)
        thunks = self._bucket_thunks(cap)
        for hook in self.precompile_hooks:
            hook(cap, thunks)

        def run():
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(max_workers=3) as ex:
                for fut in cf.as_completed([ex.submit(fn) for _, fn in thunks]):
                    try:
                        fut.result()
                    except Exception:  # best-effort: fall back to inline compile
                        pass
            self._ready_buckets.add(cap)
            self.compile_events.append((self.time, cap))

        import threading

        self._precompile_thread = threading.Thread(target=run, daemon=True)
        self._precompile_thread.start()

    def _bucket_ready(self, cap: int) -> bool:
        return cap in self._ready_buckets or jax.default_backend() == "cpu"

    def queue_ladder_precompile(self) -> int:
        """Queue background compile campaigns for EVERY ladder rung above the
        current capacity (VERDICT r4 #2: growth during sustained exploration
        outran the one-rung-ahead campaign and paid 10-163 s cold inline
        compiles). Called from `EGGFusion.warmup` so the whole ladder gets
        the maximum possible lead time; campaigns run one at a time in the
        background and results land in the persistent compilation cache.
        Returns the number of rungs queued."""
        if self._fm_sds is None or not self.bucketing:
            return 0
        n = 0
        for cap in self._ladder:
            if cap > self.surfels.capacity and cap not in self._precompiled:
                self._request_bucket_compile(cap)
                n += 1
        return n

    def surfel_sds(self, capacity: int):
        """ShapeDtypeStruct pytree of the SoA at `capacity` (no buffers)."""
        return jax.eval_shape(
            functools.partial(sf.SurfelMap.empty, self.scfg._replace(capacity=capacity))
        )

    def _bucket_thunks(self, capacity: int) -> list:
        """(label, thunk) pairs compiling every per-capacity program at
        `capacity` from ShapeDtypeStructs captured off the live shapes."""
        sds = jax.ShapeDtypeStruct
        f32 = jnp.float32
        W, H = self._wh
        s = self.surfel_sds(capacity)
        fm = self._fm_sds
        kfm = {
            "color": fm["color_map"], "depth": fm["depth_map"],
            "normal": fm["normal_map_c"], "rgb_mask": fm["rgb_mask"],
            "geo_mask": fm["geo_mask"],
        }
        w2c = sds((4, 4), f32)
        intr = sds((4,), f32)
        t0 = sds((), jnp.int32)
        key = sds(self._rng.shape, self._rng.dtype)
        params = {k: getattr(s, k) for k in OPT_FIELDS}
        moments = {k: (v, v) for k, v in params.items()}
        geo = {"position": s.xyz, "normal": sds(s.xyz.shape, f32)}
        lrs = {k: sds((), f32) for k in OPT_FIELDS}
        amortized = self.mcfg.opt_schedule == "amortized"

        convb = sds((), jnp.bool_)
        thunks = [
            ("map_update", lambda: self._map_update.lower(
                s, fm, w2c, intr, t0, key, width=W, height=H,
                first=False, full_post=amortized,
                model_cap=self.model_cap, conv=convb,
                down=self.view_down).compile()),
            *([("map_update_skip", lambda: self._map_update.lower(
                s, fm, w2c, intr, t0, key, width=W, height=H,
                first=False, full_post=amortized, model_cap=self.model_cap,
                conv=convb, down=self.view_down, do_render=False).compile())]
              if self.settled_skip and amortized else []),
            ("render_model", lambda: self._render_model.lower(
                s, w2c, intr, width=W, height=H).compile()),
            ("compact", lambda: _compact_jit.lower(s).compile()),
            ("prune", lambda: fusion.prune_unstable.lower(
                s, self.scfg, t0, self.mcfg.prune_max_age).compile()),
        ]
        if self._adaptive_cap:
            # the OTHER model-cap variant, so a mid-rung adaptive switch
            # never compiles inline
            other = (self.renderer.model_cap_min
                     if self.model_cap == self.renderer.raster_cap
                     else self.renderer.raster_cap)
            thunks.append(("map_update_altcap", lambda: self._map_update.lower(
                s, fm, w2c, intr, t0, key, width=W, height=H,
                first=False, full_post=amortized, model_cap=other,
                conv=convb, down=self.view_down).compile()))
        if self.mesh is not None:
            # mesh mode uses the window-batched step; its batch shapes
            # depend on the live window, so it compiles at first use
            return thunks
        if self.renderer.backend == "pallas":
            def opt_cached():
                cache = jax.eval_shape(
                    functools.partial(self._bin_cache, width=W, height=H),
                    s, w2c, intr)
                return self._opt_step.lower(
                    s, moments, t0, kfm, w2c, intr, geo, lrs, W, H,
                    cache, key).compile()

            thunks += [
                ("bin_cache", lambda: self._bin_cache.lower(
                    s, w2c, intr, width=W, height=H).compile()),
                ("opt_step_cached", opt_cached),
            ]
        else:
            thunks.append(("opt_step", lambda: self._opt_step.lower(
                s, moments, t0, kfm, w2c, intr, geo, lrs, W, H,
                None, key).compile()))
        return thunks

    def _skip_render_ok(self, fail_streak: int) -> bool:
        """Host-side settledness gate for the fuse-only frame (settled_skip).

        All signals are lag-N readbacks already consumed for capacity
        management — the check is sync-free. Conservative on purpose: any
        doubt (stale counts, moving counts, failure streak, last frame
        already skipped) renders."""
        if not self.settled_skip or self._skip_last or fail_streak > 0:
            return False
        h = self._count_hist
        if len(h) < h.maxlen or self._known_time < self.time - 3 * self.count_lag:
            return False
        tol = max(self.settled_skip_tol,
                  int(self.settled_skip_tol_frac * self._known_count))
        if max(h) - min(h) > tol:
            return False
        # motion gate: fresh reading, below the slow-motion thresholds
        if (self._known_motion is None
                or self._known_motion_time < self.time - 3 * self.count_lag):
            return False
        rot, trans = self._known_motion
        return rot <= self.settled_skip_max_rot and trans <= self.settled_skip_max_trans

    def mapping(self, frame, frame_map: dict, fail_streak: int = 0) -> dict | None:
        """Per-frame mapping entry (reference `Mapping.mapping`,
        `mapper.py:180-195`).

        Returns the postprocess model map when this frame's map update could
        produce it fused (non-optimization frames); None on sliding-window
        optimization frames, where the caller must render it AFTER the
        optimization (reference ordering, `system.py:47-49`).

        `fail_streak` (the tracker's lagged consecutive-failure count)
        drives two host-side gates: while 0 < streak < `gate_leak_streak`,
        keyframe acceptance and window appends are skipped (a pose from a
        failure streak must not become an optimization target) and the
        device-side fusion gate stays armed; at `gate_leak_streak` the
        system LEAKS back to full reference behavior (see
        `gate_leak_streak`)."""
        first = self.time == 0
        amortized = self.mcfg.opt_schedule == "amortized"
        opt_frame = self.time % self.mcfg.sw_optimize_freq == 0
        if self._fm_sds is None:
            self._fm_sds = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), frame_map
            )
            self._wh = (frame.width, frame.height)
        if self.bucketing:
            self._ensure_capacity(first)
            self._pump_compiles()  # start any queued campaign (ADVICE r4)
        elif self.settled_skip:
            self._consume_counts()  # settledness signal without bucketing
        if self.settled_skip:
            # async per-frame pose-delta readback (motion gate; same lag-N
            # pattern as counts — never blocks on device progress)
            w2c_now = frame.w2c_matrix()
            if self._prev_w2c_skip is not None:
                mag = _relative_pose_mag(w2c_now, self._prev_w2c_skip)
                try:
                    mag.copy_to_host_async()
                except Exception:
                    pass
                self._mag_pending.append((self.time, mag))
            self._prev_w2c_skip = w2c_now
            while (self._mag_pending
                   and self._mag_pending[0][0] <= self.time - self.count_lag):
                t, ref = self._mag_pending.popleft()
                v = np.asarray(ref)
                self._known_motion = (float(v[0]), float(v[1]))
                self._known_motion_time = t
        # amortized schedule: EVERY frame's map update emits the fused model
        # map (1-2 opt steps per frame don't warrant the reference's
        # post-optimization re-render; the next frame tracks a view at most
        # one micro-step stale)
        full_post = True if amortized else not opt_frame
        # device-side convergence gate (see map_update docstring); the LOOSE
        # map_ok flag (residual within gate_residual_factor x the commit
        # threshold) when the tracker provides it, else the strict flag.
        # GT-pose / frame-0 / gate-disabled / gate-leaked frames pass a
        # constant True scalar so the program signature stays unique
        leak = fail_streak >= self.gate_leak_streak > 0
        suspect = 0 < fail_streak and not leak
        conv = None
        if self.gate_fusion and not leak:
            conv = getattr(frame, "tracking_map_ok",
                           getattr(frame, "tracking_converged", None))
        if conv is None:
            conv = jnp.bool_(True)
        # settled fuse-only frame (see _skip_render_ok): skip render + spawn,
        # keep the previous tracking view. Only on fused-model-map frames
        # (amortized full_post) — burst-mode opt frames re-render after the
        # optimization anyway.
        skip = (not first and full_post and self._skip_render_ok(fail_streak))
        self.surfels, model_map, stats_vec = self._map_update(
            self.surfels, frame_map, frame.w2c_matrix(), frame.intr,
            jnp.int32(self.time), self._rng, frame.width, frame.height, first,
            full_post, model_cap=self.model_cap, conv=conv,
            down=self.view_down, do_render=not skip,
        )
        self._skip_last = skip
        if skip:
            self.render_skips += 1
            model_map = KEEP_MODEL_MAP
        if stats_vec is not None:
            try:
                stats_vec.copy_to_host_async()
            except Exception:
                pass
            self._stats_pending.append((self.time, stats_vec))
        while self._stats_pending and self._stats_pending[0][0] <= self.time - self.count_lag:
            t, ref = self._stats_pending.popleft()
            v = np.asarray(ref)
            self.fusion_stats[t] = (int(v[0]), int(v[1]))
            if v.shape[0] > 2 and int(v[2]) >= 0:
                self._observe_occupancy(int(v[2]))
        if self.bucketing or self.settled_skip:
            # fresh buffer (+0), NOT an alias: opt_step donates the SoA, which
            # would delete the very buffer the async copy reads from
            ref = self.surfels.count + 0
            try:
                ref.copy_to_host_async()
            except Exception:
                pass
            self._count_pending.append((self.time, ref))

        if self._maint_pending is not None:
            self._maintain_finish()
        if self.mcfg.prune_freq > 0 and self.time > 0 and self.time % self.mcfg.prune_freq == 0:
            self.maintain_map(defer=True)

        if self.time % self.mcfg.sw_add_freq == 0 and not suspect:
            self.keyframe_manager.sliding_window.append(
                KeyFrame(frame, frame_map, self.time, -1, self.keyframe_manager.storage)
            )
        if suspect:
            pass  # no keyframe decisions from a failure-streak pose
        elif opt_frame:
            self.keyframe_manager.check_keyframe(frame, frame_map, self.time)
        else:
            # async pose-delta observation feeding the NEXT opt frame's
            # sync-free keyframe check
            self.keyframe_manager.observe(frame, self.time)
        if first or not amortized:
            # frame 0 keeps the reference's init burst (local_map_iter_init
            # steps) in both schedules; burst mode keeps the full schedule
            if opt_frame:
                self.frame_batch_optimization(frame)
        else:
            self._amortized_opt()

        self.time += 1
        return model_map

    def _observe_occupancy(self, occ: int) -> None:
        """Adaptive model-render cap policy (see Renderer.adaptive_model_cap).

        `occ` is the TRUE (pre-clip) deepest sub-column candidate count of a
        recent model render (lag-N readback). Down-switch to `model_cap_min`
        only after `_occ_streak_need` consecutive healthy readings; escalate
        back to `raster_cap` IMMEDIATELY when occupancy approaches the small
        slab's stratified ceiling — the formation-phase density overshoot
        that death-spiraled a fixed cap 1024 (ACCURACY.md r3) trips this
        before any coverage is lost, since readings keep reporting true
        occupancy regardless of the currently rendered cap."""
        if not self._adaptive_cap:
            return
        full = self.renderer.raster_cap
        if occ >= self._occ_up:
            self._occ_streak = 0
            if self.model_cap != full:
                self.model_cap = full
                self.cap_switches.append((self.time, full))
        elif occ < self._occ_down:
            self._occ_streak += 1
            if (self.model_cap != self.renderer.model_cap_min
                    and self._occ_streak >= self._occ_streak_need):
                self.model_cap = self.renderer.model_cap_min
                self.cap_switches.append((self.time, self.model_cap))
        else:
            self._occ_streak = 0

    def maintain_map(self, defer: bool = False) -> None:
        """Live map-size management (VERDICT r1 #3): cull error-dominated and
        stale unstable surfels, then compact the SoA when fragmentation
        (watermark minus active count) exceeds `compact_frag` of capacity so
        later spawns reuse the freed slots. Runs every `prune_freq` frames.

        `defer=True` (the live loop): the prune program is dispatched now
        but the two count scalars are only COPIED asynchronously; the
        compact decision runs on the next frame via `_maintain_finish`,
        when the copies are long since ready — so maintenance never drains
        the ~3-frame device queue (the 390-500 ms per-frame spike BENCH_r02
        showed every prune_freq frames). `defer=False` keeps the immediate
        semantics (direct calls, tests, final cleanup)."""
        self.surfels = fusion.prune_unstable(
            self.surfels, self.scfg, jnp.int32(self.time), self.mcfg.prune_max_age
        )
        if defer:
            cnt = self.surfels.count + 0
            act = self.surfels.num_active() + 0
            for r in (cnt, act):
                try:
                    r.copy_to_host_async()
                except Exception:
                    pass
            self._maint_pending = (self.time, cnt, act)
            return
        self._maintain_decide(int(np.asarray(self.surfels.count)),
                              int(np.asarray(self.surfels.num_active())),
                              self.time)

    def _maintain_finish(self) -> None:
        # consume only once the copies are `count_lag`+1 frames old — the
        # device runs ~3 frames behind the host, so a next-frame read blocks
        # for ~2 frames of device compute (the 209/222 ms outliers BENCH_r03
        # showed on the frames after each prune; VERDICT r3 #2)
        t, cnt, act = self._maint_pending
        if self.time - t <= self.count_lag:
            return
        self._maint_pending = None
        # the copied scalars snapshot the post-prune state of frame t —
        # dating the consumed count there keeps the capacity budget safe
        self._maintain_decide(int(np.asarray(cnt)), int(np.asarray(act)), t,
                              immediate=False)

    def _maintain_decide(self, count: int, n_active: int, known_time: int,
                         immediate: bool = True) -> None:
        if count - n_active > self.mcfg.compact_frag * self.surfels.capacity:
            self.surfels = _compact_jit(self.surfels)
            count = n_active
            # compaction permutes slots: cached binning / Adam moments /
            # drift anchors refer to the old slot order
            self._invalidate_capacity_state()
        self._known_count = count
        self._known_time = known_time
        self._count_pending.clear()
        # shrink-on-compact (round 4): pruning can leave the map a full
        # ladder rung below its bucket; slicing the SoA prefix down
        # re-earns the O(capacity) savings growth paid for. `immediate`
        # (direct maintain_map calls, tests, bench warmup) shrinks here;
        # the live loop instead lets `_consider_shrink` do it once the
        # smaller rung's programs are background-compiled (a cold inline
        # compile stalls the loop for tens of seconds through the tunnel).
        if self.bucketing and immediate:
            rung = self._bucket(count + 2 * self._spawn_margin)
            if rung < self.surfels.capacity and count <= rung:
                self.surfels = sf.shrink_surfels(self.surfels, rung)
                self._invalidate_capacity_state()

    def _lrs_dev(self, lrs: dict) -> dict:
        """Device copies of the LR scalars, uploaded once (six per-frame tiny
        uploads are six tunnel round trips on remote-attached TPUs)."""
        key = tuple(sorted(lrs.items()))
        cache = getattr(self, "_lrs_cache", None)
        if cache is None or cache[0] != key:
            self._lrs_cache = (key, {k: jnp.float32(v) for k, v in lrs.items()})
        return self._lrs_cache[1]

    def _window_batch(self, kfs: list):
        """Stack keyframes into the fixed-size (B, ...) batch the sharded
        window step consumes: B = window_size rounded up to a mesh multiple,
        padding members masked out via `valid`.

        Cached per window GENERATION (VERDICT r4 weak #6): the members'
        maps and poses are frozen snapshots, so the stacked batch only
        changes when the window membership does — rebuilding B full-res map
        stacks every frame was a real per-frame host cost at production
        resolutions on a pod."""
        key = tuple(kf.uid for kf in kfs)
        cached = self._window_batch_cache
        if cached is not None and cached[0] == key:
            return cached[1]
        n = int(self.mesh.devices.size)
        Bmax = max(self.keyframe_manager.window_size, 1)
        B = -(-max(Bmax, n) // n) * n
        kfs = kfs[:B]
        maps = [kf.device_maps() for kf in kfs]
        pads = B - len(kfs)
        z = {k: jnp.zeros_like(v) for k, v in maps[0].items()}
        kf_batch = {k: jnp.stack([m[k] for m in maps] + [z[k]] * pads)
                    for k in maps[0]}
        w2c = jnp.stack([jnp.asarray(kf.w2c) for kf in kfs]
                        + [jnp.eye(4)] * pads)
        valid = jnp.asarray([1.0] * len(kfs) + [0.0] * pads, jnp.float32)
        batch = (kf_batch, w2c, valid)
        self._window_batch_cache = (key, batch)
        return batch

    def _amortized_opt(self) -> None:
        """Spread the sliding-window optimization over every frame (see
        `MapperConfig.opt_schedule`): the same local_map_iter * |window| steps
        per sw_optimize_freq frames, run 1-2 at a time against a rotating
        window member. The member's tile binning is computed once per
        rotation slot and reused across its frames (fusion moves surfels by
        ~mm — far below a tile; surfels spawned since simply miss their
        gradient until the next rebin).

        Under a mesh (`System.mesh_devices`), each step instead renders the
        WHOLE window batched (one keyframe shard per device), so the
        accumulator advances `local_map_iter / sw_optimize_freq` batched
        steps per frame — the same keyframe-render count per period."""
        window = list(self.keyframe_manager.sliding_window)
        if not window:
            return
        mcfg = self.mcfg
        per_frame = mcfg.local_map_iter / mcfg.sw_optimize_freq
        if self.mesh is None:
            per_frame *= len(window)
        per_frame *= mcfg.opt_step_scale
        self._opt_acc += per_frame
        n = int(self._opt_acc)
        if n == 0:
            return
        self._opt_acc -= n

        # round boundary: fresh Adam moments + drift anchor (the reference
        # re-creates both per optimization round, `mapper.py:338`)
        if self._opt_moments is None or self.time % mcfg.sw_optimize_freq == 0:
            params = {k: getattr(self.surfels, k) for k in OPT_FIELDS}
            self._opt_moments = _adam_init(params)
            self._opt_stepno = jnp.int32(0)
            self._opt_geo = _geo_snapshot(self.surfels)

        if self.mesh is not None:
            kf0 = window[0]
            kf_batch, w2c_b, valid = self._window_batch(window)
            intr = jnp.asarray(kf0.intr)
            lrs = self._lrs_dev(self.sw_lrs)
            for _ in range(n):
                (self.surfels, self._opt_moments, self._opt_stepno,
                 loss) = self._window_opt_step(
                    self.surfels, self._opt_moments, self._opt_stepno,
                    kf_batch, w2c_b, valid, intr, self._opt_geo, lrs,
                    kf0.width, kf0.height)
                if self.debug_nan and not np.isfinite(float(np.asarray(loss))):
                    raise FloatingPointError("NaN/Inf batched map-opt loss")
            self._note_opt(n, loss)
            return

        rot = max(1, mcfg.sw_optimize_freq // len(window))
        kf = window[(self.time // rot) % len(window)]
        w2c = jnp.asarray(kf.w2c)
        intr = jnp.asarray(kf.intr)
        # per-member binning cache with WINDOW lifetime (round 5): a member's
        # camera is frozen, so its tile binning stays valid for its whole
        # stay in the window (<= window_size * sw_add_freq frames) — only the
        # map drifts under it (fusion moves surfels ~mm; surfels spawned
        # since miss their gradient until the member's next re-bin, exactly
        # the staleness the per-slot cache already accepted). One binning per
        # member per window stay instead of one per rotation slot revisit
        # cuts the bin_cache dispatch rate ~2x; priced by the `kfbin`
        # A/B arm (quality-neutral: ATE/PSNR/depth-L1 at parity).
        live_uids = {k.uid for k in window}
        for uid in [u for u in self._opt_cache_map if u not in live_uids]:
            del self._opt_cache_map[uid]
        cache = self._opt_cache_map.get(kf.uid)
        if cache is None:
            cache = self._bin_cache(self.surfels, w2c, intr, kf.width, kf.height)
            self._opt_cache_map[kf.uid] = cache
        self._opt_cache = cache
        kfm = kf.device_maps()
        if self.debug_nan:
            _check_nan_maps(kfm, kf.uid)
        lrs = self._lrs_dev(self.sw_lrs)
        for _ in range(n):
            self.surfels, self._opt_moments, self._opt_stepno, loss = self._opt_step(
                self.surfels, self._opt_moments, self._opt_stepno, kfm, w2c, intr,
                self._opt_geo, lrs, kf.width, kf.height, self._opt_cache,
                self._tile_rng,
            )
            if self.debug_nan and not np.isfinite(float(np.asarray(loss))):
                raise FloatingPointError(
                    f"NaN/Inf map-optimization loss at keyframe uid={kf.uid}"
                )
        self._note_opt(n, loss)

    def _note_opt(self, n: int, loss) -> None:
        """Opt observability (VERDICT r4 #8): exact host-side step counter +
        a lag-N async loss readback (a sync read per frame would stall the
        pipeline on remote-attached devices), consumed into `opt_losses`."""
        self.opt_steps_total += n
        try:
            loss.copy_to_host_async()
        except Exception:
            pass
        self._loss_pending.append((self.time, loss))
        while self._loss_pending and self._loss_pending[0][0] <= self.time - self.count_lag:
            t, ref = self._loss_pending.popleft()
            self.opt_losses[t] = float(np.asarray(ref))

    def get_render_output(self, frame) -> dict:
        """Render the current model from a frame's pose (reference
        `get_render_output`, `mapper.py:494-506`). Channel-last maps."""
        out = self._render_model(self.surfels, frame.w2c_matrix(), frame.intr, frame.width, frame.height)
        self.model_map = {
            "render_color": out["color"],
            "render_depth": out["depth"],
            "render_normal": out["normal"],
            "render_opacity": out["opacity"],
        }
        return self.model_map

    def _optimize(self, runs: list, lrs: dict) -> float:
        """Adam-optimize the map over a schedule of (keyframe, n_iters) runs.

        Multi-iteration runs on one keyframe precompute the render cache
        (tile binning) once: Adam moves positions ~1e-5 m per step, so the
        binning stays valid and its two N*K-key sorts (~22 ms per render at
        600k capacity) are paid once per run instead of once per step.
        """
        geo_snapshot = _geo_snapshot(self.surfels)
        params = {k: getattr(self.surfels, k) for k in OPT_FIELDS}
        moments = _adam_init(params)
        step = jnp.int32(0)
        lrs_dev = {k: jnp.float32(v) for k, v in lrs.items()}
        loss = jnp.float32(jnp.nan)
        for kf, n in runs:
            kfm = kf.device_maps()
            if self.debug_nan:
                _check_nan_maps(kfm, kf.uid)
            w2c = jnp.asarray(kf.w2c)
            intr = jnp.asarray(kf.intr)
            cache = (
                self._bin_cache(self.surfels, w2c, intr, kf.width, kf.height)
                if n > 1 else None
            )
            for _ in range(n):
                self.surfels, moments, step, loss = self._opt_step(
                    self.surfels, moments, step, kfm, w2c, intr,
                    geo_snapshot, lrs_dev, kf.width, kf.height, cache,
                    self._tile_rng,
                )
                self.opt_steps_total += 1
                if self.debug_nan and not np.isfinite(float(np.asarray(loss))):
                    # reference behavior is exit() (`mapper.py:440-442`);
                    # raising keeps the guard testable and lets callers save
                    raise FloatingPointError(
                        f"NaN/Inf map-optimization loss at keyframe uid={kf.uid}"
                    )
        return loss  # device scalar; callers float() it only when reporting

    def _optimize_batched(self, batches: list, n_steps_each: int, lrs: dict) -> float:
        """Mesh path of `_optimize`: each element of `batches` is a list of
        keyframes rendered TOGETHER (one shard per device) for
        `n_steps_each` Adam steps."""
        geo = _geo_snapshot(self.surfels)
        params = {k: getattr(self.surfels, k) for k in OPT_FIELDS}
        moments = _adam_init(params)
        step = jnp.int32(0)
        lrs_dev = {k: jnp.float32(v) for k, v in lrs.items()}
        loss = jnp.float32(jnp.nan)
        for kfs in batches:
            kf_batch, w2c_b, valid = self._window_batch(kfs)
            intr = jnp.asarray(kfs[0].intr)
            for _ in range(n_steps_each):
                self.surfels, moments, step, loss = self._window_opt_step(
                    self.surfels, moments, step, kf_batch, w2c_b, valid,
                    intr, geo, lrs_dev, kfs[0].width, kfs[0].height)
                self.opt_steps_total += 1
                if self.debug_nan and not np.isfinite(float(np.asarray(loss))):
                    raise FloatingPointError("NaN/Inf batched map-opt loss")
        return loss

    def frame_batch_optimization(self, frame) -> float:
        """Sliding-window optimization (reference `mapper.py:336-378`):
        local_map_iter steps on each window member (init frame gets
        local_map_iter_init); under a mesh, the same number of steps on the
        window rendered as one sharded batch."""
        window = list(self.keyframe_manager.sliding_window)
        if not window:
            return float("nan")
        per_kf = self.mcfg.local_map_iter if self.time > 0 else self.mcfg.local_map_iter_init
        if self.mesh is not None:
            return self._optimize_batched([window], per_kf, self.sw_lrs)
        return self._optimize([(kf, per_kf) for kf in window], self.sw_lrs)

    def keyframe_optimization(self, keyframe_num: int = -1) -> float:
        """Final/global keyframe optimization (reference `mapper.py:197-240`):
        random-keyframe Adam steps, grouped into short runs so the render
        cache amortizes without losing the stochastic visit order. Under a
        mesh, each step renders a random keyframe SHARD per device at equal
        total keyframe-render count."""
        ids = self.keyframe_manager.ids()
        if not ids:
            return float("nan")
        if keyframe_num == -1:
            keyframe_num = len(ids)
        keyframe_num = min(keyframe_num, len(ids))
        kfs = [self.keyframe_manager.keyframes[i] for i in ids[:keyframe_num]]
        iters = self.mcfg.final_global_opt_iter * keyframe_num
        rng = np.random.default_rng(self.time)
        if self.mesh is not None:
            B = max(self.keyframe_manager.window_size, 1)
            n_batches = max(1, iters // B)
            batches = [
                [kfs[rng.integers(len(kfs))] for _ in range(min(B, len(kfs)))]
                for _ in range(n_batches)
            ]
            return self._optimize_batched(batches, 1, self.global_lrs)
        run_len = min(4, iters)
        runs = [(kfs[rng.integers(len(kfs))], run_len) for _ in range(iters // run_len)]
        return self._optimize(runs, self.global_lrs)
