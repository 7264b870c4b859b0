"""Decompose the adversarial-synthetic tracking error (VERDICT r3 #3/#7).

Arms on the handheld trajectory at 320x240: clean, depth-noise-only,
jitter-only, full noise+jitter, and the seed-source ablation on the full
scenario (motion model vs sparse frontend vs none). Reports ATE per arm ->
results/adversarial_probe.json.

    python tools/adversarial_probe.py [arm,arm,...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

NOISE = {"depth_sigma0": 0.001, "depth_sigma2": 0.0015, "depth_quant": 0.002,
         "edge_dropout_px": 1, "dropout_frac": 0.005, "color_sigma": 0.02}


def one(name, dataset_extra, tracking=None, n_frames=40, mapping=None, system=None):
    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run
    from eggfusion_tpu.utils import eval as evalu

    # PROBE_RES=WxHxF overrides the 320x240 default (e.g. 1280x704x600 —
    # the production bench optics) for pricing resolution-sensitive knobs
    # like solver_stride_fine at the resolution they actually ship at.
    # PROBE_SUFFIX names the rows so they don't clobber the 320x240 record.
    res = os.environ.get("PROBE_RES", "")
    if res:
        w, h, f = (int(x) for x in res.split("x"))
    else:
        w, h, f = 320, 240, 300
    name = name + os.environ.get("PROBE_SUFFIX", "")
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_frames, "preload": False,
            # host-feed at 320x240 (exercises the upload path); the tunnel
            # TPU's host->device bandwidth makes host-feed at production
            # resolutions minutes-per-frame, so PROBE_RES runs feed on-device
            "device_frames": bool(res),
            "Calibration": {
                "fx": float(f), "fy": float(f), "cx": w / 2 - 0.5, "cy": h / 2 - 0.5,
                "width": w, "height": h, "depth_scale": 1.0,
            },
            **dataset_extra,
        },
        Viewer={"max_surfels_num": 120_000 if not res else 600_000},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        # shipped production values (configs/base.yaml) — DEFAULTS are
        # reference parity since r5, so the probe states them explicitly
        Tracking={"pyramid_iters": [3, 3, 2], **(tracking or {})},
        Mapping={"opt_step_scale": 0.5, **(mapping or {})},
        System={"save_dir": f"results/advprobe_{name}", "final_global_opt": False,
                **(system or {})},
    )
    ef = run(cfg, verbose=False)
    ref = ef._traj_np("ref")[:, :3, 3]
    est = ef._traj_np("est")[:, :3, 3]
    ate = evalu.ate_rmse(ref, est)
    conv = sum(1 for m in ef.metrics if m.get("frame", -1) >= 0)
    row = {"name": name, "ate_cm": round(float(ate), 3),
           "surfels": int(np.asarray(ef.mapper.surfels.num_active())),
           "frames": conv}
    print(json.dumps(row), flush=True)
    return row


_HH = {"trajectory": "handheld", "noise": NOISE, "texture_detail": 0.25}

ARMS = {
    "clean_sway": ({}, None),
    "clean_handheld": ({"trajectory": "handheld"}, None),
    "noise_only": ({"noise": NOISE}, None),
    "noisy_handheld": ({"trajectory": "handheld", "noise": NOISE}, None),
    # seed-source ablation (VERDICT r3 #7): all three arms share the
    # detail texture the FAST/BRIEF frontend needs, so the ONLY variable
    # is the dense solve's seed: damped motion model (default), the native
    # sparse frontend, or none (identity)
    "noisy_handheld_motion": (_HH, None),
    "noisy_handheld_sparse": (_HH, {"use_sparse": True}),
    "noisy_handheld_nomotion": (_HH, {"use_motion_model": False}),
    "noisy_loop": ({"trajectory": "loop", "noise": NOISE}, None),
    # round-5 diagnostics: isolate the regression source on the noise arm
    "noise_nogate": ({"noise": NOISE}, None, {"gate_fusion_on_tracking": False}),
    "noise_iters332": ({"noise": NOISE}, {"pyramid_iters": [3, 3, 2]}, None),
    "noise_steps0667": ({"noise": NOISE}, None, {"opt_step_scale": 0.667}),
    "noisyhh_nogate": ({"trajectory": "handheld", "noise": NOISE}, None,
                       {"gate_fusion_on_tracking": False}),
    # round 5c: finest-level constraint stride 4 (tracking-cost lever) —
    # any tracking change must be priced here, not only on the benign
    # 1280x704 A/B (the [3,3,1] lesson). At 320x240 this thins level 0 to
    # an 80x60 grid, a deliberately harsher regime than production.
    "noise_stride4": ({"noise": NOISE}, {"solver_stride_fine": 4}, None),
    "noisyhh_stride4": ({"trajectory": "handheld", "noise": NOISE},
                        {"solver_stride_fine": 4}, None),
    "clean_handheld_stride4": ({"trajectory": "handheld"},
                               {"solver_stride_fine": 4}, None),
    # round 5c: separable bilateral depth filter under Kinect-law noise —
    # the depth filter's whole job is exactly this regime
    "noise_bilatsep": ({"noise": NOISE}, None, None,
                       {"bilateral_mode": "separable"}),
    "noisyhh_bilatsep": ({"trajectory": "handheld", "noise": NOISE}, None,
                         None, {"bilateral_mode": "separable"}),
    # the combined round-5c candidate production config
    "noisyhh_r5c": ({"trajectory": "handheld", "noise": NOISE},
                    {"solver_stride_fine": 4}, None,
                    {"bilateral_mode": "separable"}),
    "noise_r5c": ({"noise": NOISE}, {"solver_stride_fine": 4}, None,
                  {"bilateral_mode": "separable"}),
    "clean_handheld_r5c": ({"trajectory": "handheld"},
                           {"solver_stride_fine": 4}, None,
                           {"bilateral_mode": "separable"}),
    "noisy_loop_r5c": ({"trajectory": "loop", "noise": NOISE},
                       {"solver_stride_fine": 4}, None,
                       {"bilateral_mode": "separable"}),
    "clean_sway_r5c": ({}, {"solver_stride_fine": 4}, None,
                       {"bilateral_mode": "separable"}),
}

# round 5b: half-resolution model view (Tracking.model_view_down=2 +
# solver_stride 1 — equal finest-level constraint count). Any tracking
# change must be priced on these arms, not only the benign 1280x704 A/B
# (the [3,3,1] lesson, ACCURACY.md r5).
_HV = {"model_view_down": 2, "solver_stride": 1}
for _arm in ("clean_sway", "clean_handheld", "noise_only", "noisy_handheld",
             "noisy_loop"):
    _extra, _trk, *_rest = ARMS[_arm]
    ARMS[f"{_arm}_halfview"] = (_extra, {**(_trk or {}), **_HV},
                                *(_rest or [None]))
    # settled-frame render skip (Mapping.settled_skip) on the same arms
    _m = (_rest[0] if _rest else None) or {}
    ARMS[f"{_arm}_skip"] = (_extra, _trk, {**_m, "settled_skip": True})


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    which = (sys.argv[1].split(",") if len(sys.argv) > 1 else list(ARMS))
    os.makedirs("results", exist_ok=True)
    try:
        with open("results/adversarial_probe.json") as f:
            rows = json.load(f)
    except Exception:
        rows = []
    for name in which:
        extra, tracking, *rest = ARMS[name]
        row = one(name, extra, tracking,
                  mapping=rest[0] if rest else None,
                  system=rest[1] if len(rest) > 1 else None)
        rows = [r for r in rows if r.get("name") != name] + [row]
        with open("results/adversarial_probe.json", "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
