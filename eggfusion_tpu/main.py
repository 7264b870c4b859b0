"""CLI driver (reference `/root/reference/main.py`).

Usage:
    python -m eggfusion_tpu.main --config configs/replica/office0.yaml
    python -m eggfusion_tpu.main --synthetic --frames 30   # no dataset needed
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_frame(dataset, fid: int, preload: bool, nlevel: int = 3):
    import jax

    from eggfusion_tpu.core.frame import Frame

    # `load_dataset` stamps the pyramid depth the tracker needs (extra
    # levels when Tracking.model_view_down > 1) so every caller inherits it
    nlevel = getattr(dataset, "frame_nlevel", nlevel)
    bilateral = getattr(dataset, "bilateral_mode", "exact")

    ts, color, depth, mask, gt_pose = dataset.get_buffer_frame() if preload else dataset[fid]
    if isinstance(mask, np.ndarray):
        # the validity mask is dataset-constant (the undistortion validity
        # map, `datasets.py`): upload once, reuse the device handle
        if getattr(dataset, "_mask_dev", None) is None:
            import jax.numpy as jnp

            dataset._mask_dev = jnp.asarray(mask, jnp.float32)
        mask = dataset._mask_dev
    if isinstance(color, jax.Array):
        # device-resident feed (float color/metric depth already on device)
        return Frame(
            uid=fid, ts=ts, color_u8=color, depth_raw=depth, mask=mask,
            gt_pose_w2c=gt_pose, intr=dataset.intrinsics, depth_scale=dataset.depth_scale,
            projmat=dataset.projmat, prefiltered=True, filter_depth=True,
            nlevel=nlevel, bilateral=bilateral,
        )
    return Frame(
        uid=fid, ts=ts, color_u8=color, depth_raw=depth, mask=mask,
        gt_pose_w2c=gt_pose, intr=dataset.intrinsics, depth_scale=dataset.depth_scale,
        projmat=dataset.projmat, nlevel=nlevel, bilateral=bilateral,
    )


def run(cfg, max_frames: int | None = None, verbose: bool = False, resume: str | None = None):
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.system import EGGFusion

    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    start = 0
    if resume:
        ef.resume(resume)
        start = ef.mapper.time

    n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
    # the prefetch stream starts at frame 0; resumed runs index directly
    preload = bool(cfg.Dataset.get("preload", True)) and start == 0
    t_start = time.perf_counter()
    for fid in range(start, n):
        frame = build_frame(dataset, fid, preload, nlevel=ef.nlevel_frame)
        ef.reconstruct(frame)
        if verbose or fid % 25 == 0:
            m = ef.metrics[-1]
            print(
                f"frame {fid}/{n}  track {m['track_ms']:.1f}ms  map {m['map_ms']:.1f}ms  "
                f"post {m['post_ms']:.1f}ms  surfels {int(m['surfels'])}"
            )
    wall = time.perf_counter() - t_start
    done = n - start
    print(f"Processed {done} frames in {wall:.2f}s ({done / max(wall, 1e-9):.2f} FPS)")

    ef.finish()
    if cfg.System.eval_tracking:
        ef.evaluate_trajectory()
    if cfg.System.get("eval_render", False):
        ef.evaluate_render()
    if cfg.System.get("eval_recon", False):
        ef.evaluate_recon()
    return ef


def main(argv=None):
    parser = argparse.ArgumentParser(description="EggFusion-TPU RGB-D dense SLAM")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true", help="run the built-in synthetic sequence")
    parser.add_argument("--frames", type=int, default=None, help="limit number of frames")
    parser.add_argument("--resume", type=str, default=None, help="resume from a checkpoint.npz")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a JAX platform (e.g. 'cpu'). Needed where a site pin "
        "overrides the JAX_PLATFORMS env var (the env-attached TPU tunnel "
        "pins 'axon'); applied via jax.config before backend init.",
    )
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.config:
        cfg = cfglib.load_config(args.config)
    elif args.synthetic:
        cfg = cfglib.default_config()
        cfg.System.save_dir = "results/synthetic_run"
    else:
        parser.error("either --config or --synthetic is required")

    run(cfg, max_frames=args.frames, verbose=args.verbose, resume=args.resume)


if __name__ == "__main__":
    main(sys.argv[1:])
