"""cProfile of the HOST side of the bench frame loop.

BENCH_r02 showed the steady frame is host-bound (~76 ms host dispatch,
device nearly idle) while tools/profile_dispatch.py proves raw dispatch
overhead through the tunnel is tiny (0.02-0.14 ms/call, frame-shaped
6-dispatch burst ~13 ms). So ~60 ms/frame of host time is unaccounted —
this tool runs the exact bench loop under cProfile and prints the top
cumulative-time functions to find it.

    python tools/profile_host.py [n_frames]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

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

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n_warm = 8
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 704))
    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic", "n_frames": n_warm + n_frames, "unique_frames": 10,
            "device_frames": True, "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": int(os.environ.get("BENCH_SURFELS", 600_000))},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        Mapping={"local_map_iter": 3},
        System={"save_dir": "results/profile_host", "final_global_opt": False,
                "capacity_bucketing": False},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    for fid in range(n_warm):
        ef.reconstruct(build_frame(dataset, fid, False))
    int(np.asarray(ef.mapper.surfels.count))  # true sync (tunnel fence)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for fid in range(n_warm, n_warm + n_frames):
        ef.reconstruct(build_frame(dataset, fid, False))
    prof.disable()
    host_s = time.perf_counter() - t0
    int(np.asarray(ef.mapper.surfels.count))
    wall = time.perf_counter() - t0
    print(f"[profile_host] {n_frames} frames: host {host_s:.2f}s "
          f"({host_s/n_frames*1e3:.1f} ms/frame), wall {wall:.2f}s", flush=True)

    buf = io.StringIO()
    st = pstats.Stats(prof, stream=buf)
    st.sort_stats("cumulative").print_stats(45)
    st.sort_stats("tottime").print_stats(25)
    out = buf.getvalue()
    print(out, flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/profile_host.txt", "w") as f:
        f.write(f"{n_frames} frames, host {host_s:.2f}s, wall {wall:.2f}s\n")
        f.write(out)


if __name__ == "__main__":
    main()
