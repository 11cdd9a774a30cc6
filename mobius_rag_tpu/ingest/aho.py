"""Aho-Corasick matcher: ctypes binding to the C++ automaton
(cpp/ahocorasick.cc) with a pure-Python fallback.

Replaces the reference's Python automaton (app/services/
policy_path_b.py:335-410; duplicate at app/main.py:3355) for bulk
ingest tagging and retag sweeps. The shared library is built on demand
(`make -C cpp`) and cached; if no toolchain is available the Python
fallback keeps everything working (slower, same results — tested
equivalent in tests/test_aho.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterable

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_NAME = "libmrag_native.so"


def _load_lib() -> ctypes.CDLL | None:
    path = os.path.join(_CPP_DIR, _LIB_NAME)
    if not os.path.exists(path):
        try:
            subprocess.run(["make", "-C", _CPP_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ac_create.restype = ctypes.c_void_p
    lib.ac_add_pattern.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_int]
    lib.ac_build.argtypes = [ctypes.c_void_p]
    lib.ac_match.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                             ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.ac_match_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_int]
    lib.ac_free.argtypes = [ctypes.c_void_p]
    return lib


_LIB: ctypes.CDLL | None | bool = False  # False = not yet attempted


def _lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is False:
        _LIB = _load_lib()
    return _LIB


class AhoCorasick:
    """Case-insensitive multi-pattern matcher with word boundaries.

    >>> ac = AhoCorasick(["prior authorization", "dme"])
    >>> ac.match_set("DME needs prior authorization")
    {0, 1}
    """

    def __init__(self, patterns: Iterable[str], *, word_boundary: bool = True):
        self.patterns = [p.lower() for p in patterns]
        self.word_boundary = word_boundary
        self._handle = None
        self._native = False
        lib = _lib()
        if lib is not None and self.patterns:
            handle = lib.ac_create()
            ok = True
            for i, p in enumerate(self.patterns):
                if lib.ac_add_pattern(handle, p.encode("utf-8"), len(p.encode("utf-8")), i) != 0:
                    ok = False
                    break
            if ok and lib.ac_build(handle) == 0:
                self._handle = handle
                self._native = True
            else:
                lib.ac_free(handle)
        if not self._native:
            self._build_python()

    # -- python fallback -----------------------------------------------------

    def _build_python(self) -> None:
        import re

        self._py_patterns = []
        for i, p in enumerate(self.patterns):
            if self.word_boundary:
                pat = re.compile(r"(?<![a-z0-9])" + re.escape(p) + r"(?![a-z0-9])")
            else:
                pat = re.compile(re.escape(p))
            self._py_patterns.append((pat, i))

    @property
    def is_native(self) -> bool:
        return self._native

    # -- matching ------------------------------------------------------------

    def match_set(self, text: str) -> set[int]:
        """Distinct pattern ids present in text."""
        t = text.lower()
        if self._native:
            lib = _lib()
            data = t.encode("utf-8")
            flags = (ctypes.c_uint8 * len(self.patterns))()
            lib.ac_match_set(self._handle, data, len(data),
                             1 if self.word_boundary else 0, flags,
                             len(self.patterns))
            return {i for i in range(len(self.patterns)) if flags[i]}
        return {i for pat, i in self._py_patterns if pat.search(t)}

    def match_positions(self, text: str, max_out: int = 4096) -> list[tuple[int, int]]:
        """All (pattern id, end offset in utf-8 bytes) matches."""
        t = text.lower()
        if self._native:
            lib = _lib()
            data = t.encode("utf-8")
            ids = (ctypes.c_int32 * max_out)()
            ends = (ctypes.c_int32 * max_out)()
            n = lib.ac_match(self._handle, data, len(data),
                             1 if self.word_boundary else 0, ids, ends, max_out)
            n = min(n, max_out)
            return [(ids[i], ends[i]) for i in range(n)]
        out = []
        for pat, i in self._py_patterns:
            for m in pat.finditer(t):
                out.append((i, m.end()))
        return sorted(out, key=lambda x: (x[1], x[0]))

    def __del__(self):
        if self._native and self._handle:
            lib = _lib()
            if lib is not None:
                lib.ac_free(self._handle)
            self._handle = None
