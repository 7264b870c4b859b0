"""Full-state checkpointing for mid-run resume.

The reference can only export the final PLY (3DGS fields) — fusion state
(eta/sigma2/counters) is lost and mid-run resume is impossible (SURVEY.md §5).
Here the COMPLETE surfel SoA plus trajectory is serialized to a single .npz,
so a run can resume exactly (the failure-recovery subsystem the reference
lacks).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from eggfusion_tpu.core.surfels import SurfelMap


def save_checkpoint(path: str, surfels: SurfelMap, extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {f"surfel__{k}": np.asarray(v) for k, v in vars_of(surfels).items()}
    if extra:
        for k, v in extra.items():
            flat[f"extra__{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str) -> tuple[SurfelMap, dict]:
    data = np.load(path, allow_pickle=False)
    fields = {}
    extra = {}
    known = set(SurfelMap.__dataclass_fields__)
    for k in data.files:
        if k.startswith("surfel__"):
            name = k[len("surfel__"):]
            if name in known:  # tolerate checkpoints from older SoA layouts
                fields[name] = jax.numpy.asarray(data[k])
        elif k.startswith("extra__"):
            extra[k[len("extra__"):]] = data[k]
    return SurfelMap(**fields), extra


def vars_of(s: SurfelMap) -> dict:
    return {f: getattr(s, f) for f in s.__dataclass_fields__}
