"""Persistent XLA compilation cache wiring.

The serving hosts this framework targets are small (often 1 vCPU);
XLA compiles of the wide fused serving programs dominate cold-start
wall time there (the pipeline_merge=4 hybrid program takes minutes to
build). JAX ships a persistent compilation cache that serializes
compiled executables to disk keyed on (HLO, compile options, backend);
enabling it turns every process restart after the first into a cache
hit, the same role the reference's long-lived uvicorn workers play for
its per-process prepared-statement caches (reference: app/database.py
pool reuse — there the "compile" being amortized is Postgres planning).

Opt-out via ``MRAG_JIT_CACHE=0``; relocate via ``MRAG_JIT_CACHE_DIR``;
bound on-disk size via ``MRAG_JIT_CACHE_MAX_SIZE`` bytes (JAX
LRU-evicts past the bound; default 4 GiB so long-lived hosts don't
grow the cache without limit across shape/config/JAX-version churn).
Idempotent and safe to call from multiple entry points (engine
construction, encoder construction, bench/CLI mains, test conftest).

The enabled/disabled decision is memoized for the life of the process:
a first-call failure (e.g. unwritable HOME) latches the cache off, and
later changes to the MRAG_JIT_CACHE* env vars are ignored. That is by
design — flipping jax_compilation_cache_dir mid-process would split
compiled state across directories. Tests use :func:`_reset`.
"""
from __future__ import annotations

import logging
import os

_log = logging.getLogger("mobius_rag_tpu.jit_cache")
_enabled: bool | None = None

_DEFAULT_MAX_SIZE = 4 * 1024**3


def _reset() -> None:
    """Clear the process memo (tests only; see module docstring)."""
    global _enabled
    _enabled = None


def enable_persistent_cache() -> bool:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns True when the cache is active (now or from an earlier
    call), False when disabled by env or unsupported by this JAX.
    """
    global _enabled
    if _enabled is not None:
        return _enabled
    if os.getenv("MRAG_JIT_CACHE", "1").strip().lower() in ("0", "false", "no", "off"):
        _enabled = False
        return False
    cache_dir = os.getenv("MRAG_JIT_CACHE_DIR", "").strip() or os.path.join(
        os.path.expanduser("~"), ".cache", "mobius_rag_tpu", "jit"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took >=1s to compile (the default 1s
        # floor skips trivial programs whose disk round-trip would cost
        # more than recompiling); no size floor.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        try:
            jax.config.update(
                "jax_compilation_cache_max_size",
                int(os.getenv("MRAG_JIT_CACHE_MAX_SIZE",
                              str(_DEFAULT_MAX_SIZE))))
        except Exception:  # older JAX without the LRU bound
            pass
        _enabled = True
        _log.info("persistent XLA compilation cache at %s", cache_dir)
    except Exception as exc:  # pragma: no cover - depends on jax build
        # Never let cache plumbing break serving; fall back to in-memory.
        _log.warning("persistent compilation cache unavailable: %s", exc)
        _enabled = False
    return _enabled
