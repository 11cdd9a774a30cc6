"""Persistent-compilation-cache wiring: idempotent, env-gated, and
actually pointed at the configured directory."""
import os

import jax

from mobius_rag_tpu.utils import jit_cache


def test_enable_is_idempotent_and_sets_dir():
    # conftest already enabled it (first caller in-process wins).
    assert jit_cache.enable_persistent_cache() is jit_cache.enable_persistent_cache()
    if jit_cache._enabled:
        d = jax.config.jax_compilation_cache_dir
        assert d and os.path.isdir(d)


def test_engine_construction_invokes_cache(monkeypatch):
    # SearchEngine.__init__ calls enable_persistent_cache(); the module
    # memo means this is just "doesn't raise and stays consistent".
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import SearchEngine
    from mobius_rag_tpu.testing import sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex)[:4])
    eng = SearchEngine(store, lex)
    assert eng is not None
    assert jit_cache._enabled is not None
