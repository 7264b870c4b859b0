"""A/B quality run: synthetic e2e ATE + render metrics vs Mapping overrides.

Usage: python tools/quality_ab.py key=value [key=value ...]
Keys are Mapping section floats (e.g. opt_tile_fraction=0.5).
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    overrides = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        overrides[k] = float(v)

    from eggfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run

    tag = "_".join(f"{k}{v}" for k, v in overrides.items()) or "control"
    cfg = cfglib.default_config(
        Dataset={"n_frames": 60},
        Mapping=overrides,
        System={"save_dir": f"results/ab_{tag}"},
    )
    print(f"=== A/B run: {overrides} ===", flush=True)
    run(cfg)


if __name__ == "__main__":
    main()
