"""Probe evaluate_render plausibility: run N synthetic frames, then compare
the model render against the keyframe maps and against a fresh frame."""
import sys

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np
    import jax.numpy as jnp

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.data.datasets import load_dataset
    from eggfusion_tpu.main import build_frame
    from eggfusion_tpu.system import EGGFusion
    from eggfusion_tpu.utils import eval as evalu

    cfg = cfglib.default_config(
        Dataset={"n_frames": n},
        System={"save_dir": "results/probe_rq"},
    )
    dataset = load_dataset(cfg)
    ef = EGGFusion(cfg)
    ef.warmup()
    for fid in range(n):
        ef.reconstruct(build_frame(dataset, fid, True))

    for uid, kf in ef.mapper.keyframe_manager.keyframes.items():
        out = ef.mapper._render_model(
            ef.mapper.surfels, jnp.asarray(kf.w2c), jnp.asarray(kf.intr), kf.width, kf.height
        )
        r = evalu.eval_render(
            kf.maps["color"], kf.maps["depth"], np.asarray(out["color"]), np.asarray(out["depth"])
        )
        opa = np.asarray(out["opacity"]).squeeze()
        dref = np.asarray(kf.maps["depth"]).squeeze()
        dest = np.asarray(out["depth"]).squeeze()
        m = dref > 0
        cov = float((opa[m] > 0.5).mean())
        med = float(np.median(np.abs(dest - dref)[m & (opa > 0.5)])) if (m & (opa > 0.5)).any() else -1
        print(f"kf {uid}: {r}  opa>0.5 coverage {cov:.3f}  median |dz| covered {med:.4f}")
        cm = np.asarray(kf.maps["color"])
        ce = np.asarray(out["color"])
        print(f"   color ref mean {cm.mean():.3f}  est mean {ce.mean():.3f}  est max {ce.max():.3f}")


if __name__ == "__main__":
    main()
