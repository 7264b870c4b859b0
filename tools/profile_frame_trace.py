"""Device-trace the bench frame loop: per-program device totals AND the
device idle fraction (wall span vs busy time). Distinguishes 'the device is
busy 150 ms/frame' from 'the device works 110 ms/frame and idles between
programs' — the remaining candidates for the bench's 149 ms steady frame.

    python tools/profile_frame_trace.py [n_frames]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_warm = 8
    width, height = 1280, 704
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_warm + n_frames, "unique_frames": 10,
            "device_frames": True, "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": 600_000},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        # production values (configs/base.yaml; DEFAULTS are reference parity)
        Mapping={"local_map_iter": 3, "opt_step_scale": 0.5},
        Tracking={"pyramid_iters": [3, 3, 2],
                  **({"model_view_down": 2, "solver_stride": 1}
                     if os.environ.get("BENCH_MVDOWN") == "2" else {})},
        System={"save_dir": "results/profile_trace", "final_global_opt": False,
                **({"raster_cap": int(os.environ["BENCH_RASTER_CAP"])}
                   if os.environ.get("BENCH_RASTER_CAP") else {})},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    for fid in range(n_warm):
        ef.reconstruct(build_frame(dataset, fid, False))
    int(np.asarray(ef.mapper.surfels.count))

    tmp = tempfile.mkdtemp(prefix="frametrace_")
    import time

    t0 = time.perf_counter()
    with jax.profiler.trace(tmp):
        for fid in range(n_warm, n_warm + n_frames):
            ef.reconstruct(build_frame(dataset, fid, False))
        int(np.asarray(ef.mapper.surfels.count))
    wall = time.perf_counter() - t0

    files = sorted(glob.glob(os.path.join(tmp, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    prog = collections.Counter()
    cnt = collections.Counter()
    spans = []
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and pids.get(e["pid"], "").startswith("/device"):
            if e["name"].startswith(("jit_", "jit(")):
                prog[e["name"]] += e["dur"]
                cnt[e["name"]] += 1
                spans.append((e["ts"], e["ts"] + e["dur"]))
    shutil.rmtree(tmp, ignore_errors=True)

    busy = sum(d for _, d in prog.items()) / 1e3
    if spans:
        spans.sort()
        lo, hi = spans[0][0], max(s[1] for s in spans)
        span_ms = (hi - lo) / 1e3
        # union of busy intervals (programs don't overlap on one core, but be exact)
        merged = 0.0
        cur_lo, cur_hi = spans[0]
        for a, b in spans[1:]:
            if a > cur_hi:
                merged += cur_hi - cur_lo
                cur_lo, cur_hi = a, b
            else:
                cur_hi = max(cur_hi, b)
        merged += cur_hi - cur_lo
        merged /= 1e3
    else:
        span_ms = merged = 0.0

    print(f"[trace] {n_frames} frames: wall {wall*1e3:.0f} ms "
          f"({wall/n_frames*1e3:.1f} ms/frame)", flush=True)
    print(f"[trace] device program span {span_ms:.0f} ms, busy (union) {merged:.0f} ms "
          f"-> idle-in-span {span_ms-merged:.0f} ms "
          f"({(span_ms-merged)/max(span_ms,1e-9)*100:.0f}%)", flush=True)
    print(f"[trace] per-frame device busy: {merged/n_frames:.1f} ms", flush=True)
    for name, d in prog.most_common(12):
        print(f"  {d/1e3/n_frames:7.2f} ms/frame  x{cnt[name]/n_frames:.1f}  {name}", flush=True)


if __name__ == "__main__":
    main()
