"""Native (C++) runtime components, loaded via ctypes.

The reference ships two native subsystems: the CUDA kernels (whose TPU
equivalents are the Pallas/XLA programs in `ops/`) and the ORB-SLAM2 C++
frontend (`/root/reference/.gitmodules:1-3`). This package holds the
first-party C++ replacements for the CPU-side native code:

  sparse_frontend — FAST + steered-binary-descriptor + 3D-3D RANSAC visual
                    odometer (`native/sparse_frontend.cpp`).
  frame_loader    — threaded undistortion/conversion prefetcher
                    (`native/frame_loader.cpp`).

Shared objects are compiled on demand with g++ into `native/build/` and
cached by source hash — no pybind11, no pip, no cmake required at runtime.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL] = {}


class NativeBuildError(RuntimeError):
    pass


def load(name: str) -> ctypes.CDLL:
    """Compile (if needed) and dlopen `native/<name>.cpp`."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.abspath(os.path.join(_ROOT, f"{name}.cpp"))
        if not os.path.exists(src):
            raise NativeBuildError(f"missing native source {src}")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(os.path.dirname(src), "build")
        os.makedirs(build_dir, exist_ok=True)
        so_path = os.path.join(build_dir, f"{name}-{digest}.so")
        if not os.path.exists(so_path):
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                "-o", so_path, src, "-pthread",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except subprocess.CalledProcessError as e:  # pragma: no cover
                raise NativeBuildError(f"g++ failed for {name}:\n{e.stderr}") from e
        lib = ctypes.CDLL(so_path)
        _LIBS[name] = lib
        return lib
