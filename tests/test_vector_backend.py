"""Vector-arm backend selection (MRAG_VECTOR_BACKEND=exact|ivf|packed):
the ANN backends must plug into the FULL hybrid pipeline (filter gate,
RRF, rerank unchanged) — parity with exact at nprobe=nlist, high recall
at realistic nprobe, and live rebuild after publishes."""
import dataclasses

import numpy as np
import pytest

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

QUERIES = [
    QueryRequest(query="What is the timely filing deadline for Sunshine Health "
                       "FL Medicaid claims?"),
    QueryRequest(query="prior authorization for durable medical equipment"),
    QueryRequest(query="molina eligibility verification", payer="molina"),
]


@pytest.fixture(scope="module")
def corpus():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=200))
    return lex, store


def test_ivf_full_coverage_matches_exact(corpus):
    """nprobe >= nlist ⇒ the probed scan covers every cluster ⇒ the full
    hybrid results are identical to the exact backend."""
    lex, store = corpus
    cfg = dataclasses.replace(get_config(), vector_backend="ivf",
                              ivf_nprobe=10 ** 6)
    exact = SearchEngine(store, lex, embed_fn=hash_embed)
    ivf = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    for q in QUERIES:
        a = exact.search(q, k=8)[0]
        b = ivf.search(q, k=8)[0]
        assert [h.chunk_id for h in a.hits] == [h.chunk_id for h in b.hits], q.query
        for ha, hb in zip(a.hits, b.hits):
            assert ha.score == pytest.approx(hb.score, abs=1e-4)


def test_packed_backend_high_recall(corpus):
    lex, store = corpus
    cfg = dataclasses.replace(get_config(), vector_backend="packed",
                              ivf_nprobe=10 ** 6)
    exact = SearchEngine(store, lex, embed_fn=hash_embed)
    packed = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    for q in QUERIES:
        a = {h.chunk_id for h in exact.search(q, k=8)[0].hits}
        b = {h.chunk_id for h in packed.search(q, k=8)[0].hits}
        # int8 quantization may flip near-ties; require ≥75% set overlap
        assert len(a & b) >= int(0.75 * len(a)), (q.query, a, b)


def test_ivf_backend_respects_filters(corpus):
    lex, store = corpus
    cfg = dataclasses.replace(get_config(), vector_backend="ivf",
                              ivf_nprobe=10 ** 6)
    ivf = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    out = ivf.search(QueryRequest(query="timely filing",
                                  payer="not_a_payer"), k=5)[0]
    assert out.hits == []


def test_ann_rebuilds_after_publish(corpus):
    """Store mutations bump the write generation; the ANN tables rebuild
    on the next search so fresh publishes are findable."""
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk

    lex, _ = corpus
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=50))
    cfg = dataclasses.replace(get_config(), vector_backend="ivf",
                              ivf_nprobe=10 ** 6)
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    eng.search(QueryRequest(query="warm"), k=3)
    gen0 = eng._ann_generation

    text = "Quokka Plan covers quokka chiropractic adjustments with prior approval."
    store.publish_document("quokka_doc", [featurize_chunk(ChunkRecord(
        chunk_id="quokka-c0", doc_id="quokka_doc", text=text,
        embedding=hash_embed([text])[0]), lex)])
    res = eng.search(QueryRequest(query="quokka chiropractic adjustments"), k=3)[0]
    assert eng._ann_generation != gen0
    assert any(h.doc_id == "quokka_doc" for h in res.hits)


def test_set_vector_backend_validation(corpus):
    lex, store = corpus
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    with pytest.raises(ValueError):
        eng.set_vector_backend("hnsw")
    eng.set_vector_backend("ivf")
    assert eng.vector_backend == "ivf"


def test_pq_backend_serves_hybrid(corpus):
    """backend=pq (config-5 regime): residual-PQ ADC candidate
    generation + the engine's exact-cosine candidate re-rank. At full
    probe on a small corpus the hybrid top-k must match exact closely
    (codebooks nearly memorize a few hundred rows)."""
    lex, store = corpus
    cfg = dataclasses.replace(get_config(), vector_backend="pq",
                              ivf_nprobe=10 ** 6)
    exact = SearchEngine(store, lex, embed_fn=hash_embed)
    pq = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    from mobius_rag_tpu.ops.pq import PackedPQ
    recalls = []
    for q in QUERIES:
        a = exact.search(q, k=8)[0]
        b = pq.search(q, k=8)[0]
        ids_a = {h.chunk_id for h in a.hits}
        ids_b = {h.chunk_id for h in b.hits}
        if ids_a:
            recalls.append(len(ids_a & ids_b) / len(ids_a))
    assert isinstance(pq._ann, PackedPQ)
    assert recalls and float(np.mean(recalls)) >= 0.85, recalls


def test_pq_backend_rebuilds_after_publish(corpus):
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk

    lex, _ = corpus
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    cfg = dataclasses.replace(get_config(), vector_backend="pq",
                              ivf_nprobe=10 ** 6)
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    eng.search(QueryRequest(query="timely filing"), k=5)
    text = "Umiak rental coverage requires arctic navigation certification."
    rec = featurize_chunk(ChunkRecord(
        chunk_id="u-c0", doc_id="u_doc", text=text,
        embedding=hash_embed([text])[0]), lex)
    store.publish_document("u_doc", [rec])
    res = eng.search(QueryRequest(query="umiak arctic navigation"), k=5)[0]
    assert any(h.doc_id == "u_doc" for h in res.hits)
