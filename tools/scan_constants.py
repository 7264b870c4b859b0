"""Enumerate jax.Array constants embedded into jitted programs at lowering
time (VERDICT r2 #3 root cause: on a tunnel-attached TPU, every such
constant forces a device->host readback DURING .lower(); a degraded link
turns a (4,4) eye into a 700 s stall — observed in round-3 session logs).

Runs the real pipeline for a few frames on CPU with `mlir.ir_constant`
patched to log every jax.Array (device-array) constant it materializes,
grouped by the jit program being lowered. Anything listed here should be
converted to numpy at closure-capture time or passed as an argument.

    JAX_PLATFORMS=cpu python tools/scan_constants.py
"""
from __future__ import annotations

import collections
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    from jax._src.interpreters import mlir

    hits = collections.Counter()
    examples = {}

    orig = mlir.ir_constant

    def patched(val, *a, **kw):
        if isinstance(val, jax.Array):
            key = (tuple(val.shape), str(val.dtype))
            hits[key] += 1
            if key not in examples:
                import traceback

                examples[key] = "".join(traceback.format_stack(limit=18))
        return orig(val, *a, **kw)

    mlir.ir_constant = patched

    from eggfusion_tpu import config as cfglib
    from eggfusion_tpu.main import run

    cfg = cfglib.default_config(
        Dataset={
            "type": "synthetic",
            "width": 192,
            "height": 96,
            "n_frames": 8,
            "unique_frames": 4,
        },
        Surfel={"max_surfels_num": 8192, "max_sh_degree": 0, "active_sh_degree": 0},
        Mapping={"spawn_budget": 1024},
        System={"save_dir": "results/scan_constants", "eval_render": False,
                "eval_tracking": False, "capacity_bucketing": False},
    )
    run(cfg)

    print("\n=== jax.Array constants embedded at lowering time ===")
    for key, n in hits.most_common():
        print(f"  shape={key[0]} dtype={key[1]}  x{n}")
    print("\n=== first-capture stacks (trimmed) ===")
    for key, stack in examples.items():
        frames = [
            ln
            for ln in stack.splitlines()
            if "/root/repo/" in ln and "scan_constants" not in ln
        ]
        print(f"--- shape={key[0]} dtype={key[1]}")
        print("\n".join(frames[-6:]))


if __name__ == "__main__":
    main()
