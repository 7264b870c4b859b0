"""Map-growth envelope sweep (VERDICT r3 #6): accumulate >=500k live
surfels on the orbit-in-a-room synthetic at production resolution and
measure the FPS/spike profile as capacity rungs grow.

Round-5 honesty fix: the sweep now maps at GT poses (`only_mapping`, the
reference's own mode for ScanNet++). Dense tracking on this scene is
DEGENERATE — the room is planar and low-texture, so point-to-plane ICP can
slide along walls with near-zero residual; r4's 975k-surfel sweep silently
free-ran on the motion model and grew the map along a drifting trajectory.
The envelope measures CAPACITY/THROUGHPUT (rung growth, compile storms,
1M+ live surfels), and with GT poses it measures exactly that.

    python tools/envelope_sweep.py [n_frames] [max_surfels]

Writes results/envelope_sweep.json: per-phase frame timings, surfel counts,
capacity rung transitions, compile events.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.system import EGGFusion

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    max_surfels = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # MIN_CAP=N pre-sizes the SoA (System.min_capacity): the known-scene-
    # scale mode that skips the growth path and its compile storms entirely
    min_cap = int(os.environ.get("MIN_CAP", 0))
    width, height = 1280, 704

    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_frames, "preload": False,
            "trajectory": "orbit", "scene": "room", "texture_detail": 0.15,
            "lazy_device": True, "device_frames": True,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": max_surfels},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        # production values (configs/base.yaml; DEFAULTS are reference parity)
        Mapping={"local_map_iter": 3, "opt_step_scale": 0.5},
        Tracking={"pyramid_iters": [3, 3, 2]},
        # round 5: whole-ladder background precompile from warmup — rung
        # growth during the sweep should hit compiled programs instead of
        # the 10-163 s inline compile storms BENCH/VERDICT r4 measured
        System={"save_dir": "results/envelope", "final_global_opt": False,
                "only_mapping": True, "min_capacity": min_cap,
                "precompile_ladder": min_cap == 0},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    t0 = time.perf_counter()
    ef.warmup()
    print(f"[env] warmup {time.perf_counter()-t0:.0f}s", flush=True)

    def fence():
        return int(np.asarray(ef.mapper.surfels.count))

    frame_ms = []
    counts = []
    caps = []
    t_all = time.perf_counter()
    for fid in range(n_frames):
        tf = time.perf_counter()
        ef.reconstruct(build_frame(dataset, fid, False))
        frame_ms.append((time.perf_counter() - tf) * 1e3)
        caps.append(ef.mapper.surfels.capacity)
        if fid % 25 == 0 or fid == n_frames - 1:
            c = fence()
            counts.append({"frame": fid, "count": c,
                           "capacity": ef.mapper.surfels.capacity,
                           "known": ef.mapper._known_count})
            print(f"[env] frame {fid}: count {c} cap {ef.mapper.surfels.capacity} "
                  f"median_ms {np.median(frame_ms[-25:]):.0f} "
                  f"max_ms {max(frame_ms[-25:]):.0f}", flush=True)
    wall = time.perf_counter() - t_all
    n_active = int(np.asarray(ef.mapper.surfels.num_active()))

    # per-capacity-rung timing profile (skip each rung's first 2 frames —
    # retrace/compile transients are reported separately as spikes)
    rungs = {}
    spikes = []
    phase = {m["frame"]: m for m in ef.metrics if m.get("frame", -1) >= 0}
    for i, (ms, cap) in enumerate(zip(frame_ms, caps)):
        rungs.setdefault(cap, []).append(ms)
        if ms > 400:
            row = {"frame": i, "ms": round(ms), "cap": cap}
            p = phase.get(i)
            if p:  # host-dispatch phase split of the spike frame
                row.update({k: round(p[k], 1) for k in ("track_ms", "map_ms", "post_ms")
                            if k in p})
            spikes.append(row)
    prof = {
        str(cap): {
            "frames": len(v),
            "median_ms": round(float(np.median(v)), 1),
            "p90_ms": round(float(np.percentile(v, 90)), 1),
            "max_ms": round(float(max(v)), 1),
        }
        for cap, v in sorted(rungs.items())
    }
    out = {
        "n_frames": n_frames, "resolution": [width, height],
        "final_active_surfels": n_active,
        "final_capacity": ef.mapper.surfels.capacity,
        "fps": round(n_frames / wall, 2),
        "per_rung": prof, "spikes_over_400ms": spikes[:40],
        # background compile campaigns that FINISHED, as (frame, capacity) —
        # a rung entered before its campaign appears here paid inline
        # compiles (VERDICT r4 #8: the sweep self-documents its storms)
        "compile_events": ef.mapper.compile_events,
        "cap_switches": ef.mapper.cap_switches,
        "growth": counts,
    }
    os.makedirs("results", exist_ok=True)
    out["min_capacity"] = min_cap
    with open("results/envelope_sweep%s.json" % ("_presized" if min_cap else ""), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "growth"}), flush=True)


if __name__ == "__main__":
    main()
