"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; these are the host-runtime
pieces where the reference also drops to native code (its whole data
path is C++). Each component compiles lazily with g++ on first use and
caches the .so next to its source; every caller has a pure-numpy
fallback, so a missing toolchain degrades performance, never behavior.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build(name: str) -> str | None:
    src = os.path.join(_HERE, f"{name}.cpp")
    so = os.path.join(_HERE, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so, src],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        try:  # -march=native can be unavailable in odd sandboxes
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    return so


def load(name: str):
    """Return the ctypes CDLL for native/<name>.cpp, or None."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                lib = None
        _LIBS[name] = lib
        return lib
