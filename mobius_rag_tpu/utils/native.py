"""Shared loader for the native helper library (cpp/libmrag_native.so)
plus numpy-friendly wrappers for its kernels.

The library is built on demand (`make -C cpp`) and holds every C++
helper in one .so: the Aho-Corasick automaton (ingest tagging,
cpp/ahocorasick.cc) and the fused gather+dequant+dot used by the host
exact re-rank under codes-only residency (cpp/rerank.cc). Loading is
attempted once per process; on any failure callers fall back to their
pure-numpy/Python paths (same results, slower — equivalence is pinned
by tests).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_NAME = "libmrag_native.so"

_LIB: ctypes.CDLL | None | bool = False  # False = not yet attempted


def get_lib() -> ctypes.CDLL | None:
    """The process-wide native library handle, or None if unavailable."""
    global _LIB
    if _LIB is not False:
        return _LIB
    path = os.path.join(_CPP_DIR, _LIB_NAME)
    lib = None
    try:
        # Rebuild when missing OR stale: a checked-in .so predating a
        # source change would otherwise load fine but lack the newer
        # symbols, silently degrading callers to their numpy paths.
        stale = not os.path.exists(path)
        if not stale:
            so_mtime = os.path.getmtime(path)
            for name in os.listdir(_CPP_DIR):
                if name.endswith((".cc", ".h")) and (
                        os.path.getmtime(os.path.join(_CPP_DIR, name))
                        > so_mtime):
                    stale = True
                    break
        if stale:
            subprocess.run(["make", "-B", "-C", _CPP_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(path)
        if not hasattr(lib, "mrag_gather_cos"):
            # A checkout can write .cc and .so with identical mtimes, so
            # the staleness probe misses it; the symbol set is the truth.
            subprocess.run(["make", "-B", "-C", _CPP_DIR], check=True,
                           capture_output=True, timeout=120)
            lib = ctypes.CDLL(path)
    except Exception:
        lib = None
    if lib is not None and hasattr(lib, "mrag_gather_cos"):
        lib.mrag_gather_cos.restype = ctypes.c_int
        lib.mrag_gather_cos.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    _LIB = lib
    return _LIB


def gather_cos(hv: np.ndarray, hs: np.ndarray, idx: np.ndarray,
               qv: np.ndarray) -> np.ndarray | None:
    """cos[b, w] = hs[r] * dot(hv[r], qv[b]) with r = clip(idx[b, w]).

    hv: [N, D] int8 host rows; hs: [N] f32 scales; idx: [B, W] int; qv:
    [B, D] f32. Returns None when the native library is unavailable or
    an rerank-less build of the .so is cached (caller uses numpy).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "mrag_gather_cos"):
        return None
    hv = np.ascontiguousarray(hv, np.int8)
    hs = np.ascontiguousarray(hs, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    qv = np.ascontiguousarray(qv, np.float32)
    b, w = idx.shape
    out = np.empty((b, w), np.float32)
    rc = lib.mrag_gather_cos(
        hv.ctypes.data, hs.ctypes.data, hv.shape[0], hv.shape[1],
        idx.ctypes.data, b, w, qv.ctypes.data, out.ctypes.data)
    if rc != 0:
        return None
    return out
