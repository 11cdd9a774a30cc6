"""int8 storage mode for the hybrid engine: 4× memory, recall parity."""
import dataclasses

import numpy as np
import pytest

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def engines():
    lex = sample_lexicon()
    cfg32 = get_config()
    cfg8 = dataclasses.replace(cfg32, vector_dtype="int8")
    recs = toy_corpus(lex, pad_docs=60)
    s32 = ChunkStore(cfg32)
    s32.add_chunks(recs)
    s8 = ChunkStore(cfg8)
    s8.add_chunks(toy_corpus(lex, pad_docs=60))
    return (SearchEngine(s32, lex, cfg32, embed_fn=hash_embed),
            SearchEngine(s8, lex, cfg8, embed_fn=hash_embed))


def test_int8_store_dtype(engines):
    _, e8 = engines
    assert str(e8.store.index.vectors.dtype) == "int8"
    scales = np.asarray(e8.store.index.vec_scales)
    live = np.asarray(e8.store.index.valid) > 0
    assert (scales[live] > 0).all() and (scales[live] < 1).all()


def test_int8_hybrid_matches_f32(engines):
    e32, e8 = engines
    queries = [
        "timely filing deadline for sunshine health claims",
        "prior authorization for durable medical equipment",
        "molina eligibility verification",
    ]
    for q in queries:
        r32 = e32.search(QueryRequest(query=q), k=5)[0]
        r8 = e8.search(QueryRequest(query=q), k=5)[0]
        a = [h.chunk_id for h in r32.hits]
        b = [h.chunk_id for h in r8.hits]
        overlap = len(set(a) & set(b)) / max(len(a), 1)
        assert overlap >= 0.8, (q, a, b)
        assert a[0] == b[0], f"top-1 must agree for {q!r}"


def test_int8_snapshot_roundtrip(engines, tmp_path):
    _, e8 = engines
    e8.store.snapshot(str(tmp_path / "snap8"))
    loaded = ChunkStore.restore(str(tmp_path / "snap8"), cfg=e8.cfg)
    assert str(loaded.index.vectors.dtype) == "int8"
    np.testing.assert_array_equal(
        np.asarray(loaded.index.vec_scales), np.asarray(e8.store.index.vec_scales))
    eng = SearchEngine(loaded, e8.lexicon, e8.cfg, embed_fn=hash_embed)
    r = eng.search(QueryRequest(query="timely filing deadline",
                                payer="sunshine_health"), k=3)[0]
    assert r.hits and r.hits[0].doc_id == "sunshine_provider_manual"
