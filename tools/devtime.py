"""Trace-based device timing: wall clocks lie on remote-attached (axon) TPUs
because ready-futures can resolve before device execution finishes. This
helper runs a callable under jax.profiler.trace and returns per-program
DEVICE totals parsed from the chrome trace.

    from tools.devtime import device_time_ms
    ms = device_time_ms(lambda: fn(x), n=5)          # total device ms / call
    ms = device_time_ms(lambda: fn(x), n=5, by_op=True)  # dict per op
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax


def _parse(trace_dir):
    files = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and pids.get(e["pid"], "").startswith("/device"):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return agg, cnt


def device_time_ms(fn, n: int = 5, by_op: bool = False, top: int = 20):
    out = fn()
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
        agg, cnt = _parse(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # top-level program rows are the jit_* entries; everything else is nested
    total = sum(d for name, d in agg.items() if name.startswith(("jit_", "jit(")))
    if by_op:
        rows = [(d / 1000 / n, cnt[name], name) for name, d in agg.most_common(top)]
        return total / 1000 / n, rows
    return total / 1000 / n
