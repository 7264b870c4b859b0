"""Large-scale Pallas-vs-XLA rasterizer parity (VERDICT r1 item 5).

Populates a real surfel map by running the synthetic pipeline at Replica-like
resolution until >= SURFELS_MIN active surfels exist (so scales/opacities
follow the distribution the system actually produces, not a toy sampler),
then renders the same camera through both backends and reports image diffs:

    python tools/parity_large.py            # 1280x704, >=100k surfels

Prints one JSON line with max/mean abs diffs per channel, the fraction of
pixels whose color differs by more than 1/255, and PSNR between the two
backends. Differences come only from the Pallas kernel's documented
footprint truncation (KSUB*KY sub-column window + radius clamps,
`ops/raster_pallas.py`) and per-sub-column cap overflow; the XLA oracle
(`ops/raster_xla.py`) composites every surfel over every pixel.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    width = int(os.environ.get("PAR_WIDTH", 1280))
    height = int(os.environ.get("PAR_HEIGHT", 704))
    n_min = int(os.environ.get("PAR_SURFELS", 100_000))
    cap = int(os.environ.get("PAR_CAP", 0))  # 0 = the shipped config default

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion
    from eggfusion_tpu.core import surfels as sf
    from eggfusion_tpu.ops.raster_pallas import render_pallas
    from eggfusion_tpu.ops.raster_xla import render_xla

    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "n_frames": 64,
            "unique_frames": 16,
            "device_frames": True,
            "preload": False,
            "Calibration": {
                "fx": 600.0, "fy": 600.0, "cx": width / 2 - 0.5, "cy": height / 2 - 0.5,
                "width": width, "height": height, "depth_scale": 1.0,
            },
        },
        Viewer={"max_surfels_num": max(2 * n_min, 200_000)},
        Surfel={"max_sh_degree": 0, "active_sh_degree": 0},
        System={"save_dir": "results/parity_large", "final_global_opt": False,
                "capacity_bucketing": False},
    )
    if not cap:
        cap = int(cfg.System.get("raster_cap", 2048))
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()

    t0 = time.perf_counter()
    fid = 0
    frame = None
    while int(ef.mapper.surfels.num_active()) < n_min and fid < 64:
        frame = ef.reconstruct(build_frame(dataset, fid, False)) or frame
        fid += 1
    n_act = int(ef.mapper.surfels.num_active())
    print(f"[parity] {n_act} active surfels after {fid} frames "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)

    s = ef.mapper.surfels
    params = sf.render_params(s)
    # render from the last tracked camera (traj["est"] stores w2c handles)
    w2c = jnp.asarray(ef.traj["est"][-1])
    intr = jnp.asarray([600.0, 600.0, width / 2 - 0.5, height / 2 - 0.5])

    # warm both programs first so the timings below are execution, not compile
    out_p = jax.block_until_ready(
        render_pallas(params, w2c, intr, width, height, sh_degree=0, cap=cap))
    t0 = time.perf_counter()
    out_p = jax.block_until_ready(
        render_pallas(params, w2c, intr, width, height, sh_degree=0, cap=cap))
    t_pallas = time.perf_counter() - t0
    out_x = jax.block_until_ready(
        render_xla(params, w2c, intr, width, height, sh_degree=0))
    t0 = time.perf_counter()
    out_x = jax.block_until_ready(
        render_xla(params, w2c, intr, width, height, sh_degree=0))
    t_xla = time.perf_counter() - t0
    print(f"[parity] pallas {t_pallas*1e3:.1f}ms, xla oracle {t_xla:.1f}s",
          file=sys.stderr, flush=True)

    cp, cx_ = np.asarray(out_p["color"]), np.asarray(out_x["color"])
    op, ox = np.asarray(out_p["opacity"][..., 0]), np.asarray(out_x["opacity"][..., 0])
    dp, dx = np.asarray(out_p["depth"][..., 0]), np.asarray(out_x["depth"][..., 0])
    np_, nx = np.asarray(out_p["normal"]), np.asarray(out_x["normal"])

    cdiff = np.abs(cp - cx_)
    cover = ox > 0.05
    ddiff = np.abs(dp - dx)[cover]
    ndiff = np.abs(np_ - nx)[cover]
    mse = float(np.mean((cp - cx_) ** 2))
    psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
    rep = {
        "surfels": n_act,
        "resolution": f"{width}x{height}",
        "cap": cap,
        "color_max": round(float(cdiff.max()), 6),
        "color_mean": round(float(cdiff.mean()), 8),
        "color_frac_gt_1_255": round(float((cdiff.max(-1) > 1 / 255).mean()), 6),
        "psnr_between_backends": round(psnr, 2),
        "opacity_max": round(float(np.abs(op - ox).max()), 6),
        "depth_max_covered": round(float(ddiff.max()), 6),
        "depth_mean_covered": round(float(ddiff.mean()), 8),
        "normal_max_covered": round(float(ndiff.max()), 6),
        "t_pallas_ms": round(t_pallas * 1e3, 1),
        "t_xla_s": round(t_xla, 1),
    }
    print(json.dumps(rep))
    os.makedirs("results/parity_large", exist_ok=True)
    with open("results/parity_large/parity.json", "w") as f:
        json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
