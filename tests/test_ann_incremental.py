"""Incremental ANN maintenance (proj backend): store publishes/deletes
absorb into the live PackedProj tables as device scatters into reserved
slabs — no k-means rebuild on the republish steady state (the
reference's pgvector HNSW likewise inserts incrementally; DELETE+INSERT
republish is its steady state, publish.py:27-481)."""
import dataclasses

import numpy as np
import pytest

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
from mobius_rag_tpu.ingest.featurize import featurize_chunk
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _proj_cfg(**kw):
    return dataclasses.replace(
        get_config(), vector_backend="proj", ivf_nprobe=10 ** 6,
        ann_reserve_slabs=kw.pop("ann_reserve_slabs", 2), **kw)


def _mk(text, cid, doc):
    return ChunkRecord(chunk_id=cid, doc_id=doc, text=text,
                       embedding=hash_embed([text])[0])


@pytest.fixture(scope="module")
def base():
    lex = sample_lexicon()
    cfg = _proj_cfg()
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex, pad_docs=96))
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    eng.search(QueryRequest(query="timely filing"), k=5)  # builds ANN
    return lex, store, eng


def test_reserved_slabs_present(base):
    lex, store, eng = base
    ann = eng.ensure_ann()
    assert ann.reserve_start == ann.nlist - 2
    assert ann.build_rowids is not None
    # reserved slabs start empty
    assert np.asarray(ann.build_valid)[ann.reserve_start:].sum() == 0


def test_publish_is_incremental_and_searchable(base):
    lex, store, eng = base
    ann_before = eng.ensure_ann()
    gen = store.generation
    text = "Xylophone rider reimburses mallet recalibration within 30 days."
    rec = featurize_chunk(_mk(text, "x-c0", "x_doc"), lex)
    store.publish_document("x_doc", [rec])
    assert store.generation > gen
    ann_after = eng.ensure_ann()
    assert ann_after is ann_before  # same object: no rebuild
    assert eng._ann_generation == store.generation
    r = eng.search(QueryRequest(query="xylophone mallet recalibration"),
                   k=5)[0]
    assert r.hits and r.hits[0].doc_id == "x_doc"
    # vector-only retrieval also sees it (the reserved slab is probed)
    r2 = eng.search(QueryRequest(
        query="", embedding=rec.embedding / np.linalg.norm(rec.embedding),
        tag_mode="none", mode="recall"), k=5)[0]
    assert any(h.doc_id == "x_doc" for h in r2.hits)


def test_republish_invalidates_old_rows(base):
    lex, store, eng = base
    t1 = "Quine benefit covers self-referential paperwork audits."
    store.publish_document("q_doc", [featurize_chunk(_mk(t1, "q-c0", "q_doc"), lex)])
    ann = eng.ensure_ann()
    t2 = "Quine benefit now excludes paradox adjudication entirely."
    store.publish_document("q_doc", [featurize_chunk(_mk(t2, "q-c1", "q_doc"), lex)])
    assert eng.ensure_ann() is ann
    r = eng.search(QueryRequest(query="quine self-referential paperwork"),
                   k=8)[0]
    assert not any(h.chunk_id == "q-c0" for h in r.hits)
    assert any(h.chunk_id == "q-c1" for h in r.hits)


def test_incremental_matches_full_rebuild(base):
    """After churn, a fresh engine (full rebuild on the same store) and
    the incrementally-maintained one retrieve the same top-k for
    embedding-only queries."""
    lex, store, eng = base
    for i in range(8):
        t = f"Churn bulletin {i} on modular arithmetic coverage limits."
        store.publish_document(
            f"churn{i % 3}", [featurize_chunk(
                _mk(t, f"ch{i}-c0", f"churn{i % 3}"), lex)])
    eng.ensure_ann()
    fresh = SearchEngine(store, lex, cfg=store.cfg, embed_fn=hash_embed)
    fresh.ensure_ann()
    qs = [QueryRequest(query="", tag_mode="none", mode="recall",
                       embedding=hash_embed([f"churn bulletin {i}"])[0])
          for i in range(4)]
    a = eng.search(qs, k=8)
    b = fresh.search(qs, k=8)
    for ra, rb in zip(a, b):
        ia = [h.row for h in ra.hits]
        ib = [h.row for h in rb.hits]
        overlap = len(set(ia) & set(ib)) / max(len(ib), 1)
        assert overlap >= 0.7, (ia, ib)


def test_headroom_exhaustion_falls_back_to_rebuild():
    lex = sample_lexicon()
    cfg = _proj_cfg(ann_reserve_slabs=1)
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex, pad_docs=24))
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    ann0 = eng.ensure_ann()
    cap = (ann0.nlist - ann0.reserve_start) * ann0.pad
    texts = [f"overflow doc {i} about syzygy claims" for i in range(cap + 4)]
    store.add_chunks([featurize_chunk(_mk(t, f"of-{i}", f"of{i}"), lex)
                      for i, t in enumerate(texts)])
    ann1 = eng.ensure_ann()
    assert ann1 is not ann0  # rebuilt
    assert eng._ann_generation == store.generation
    r = eng.search(QueryRequest(query="syzygy claims overflow"), k=5)[0]
    assert any(h.doc_id.startswith("of") for h in r.hits)


def test_bulk_event_forces_rebuild(base):
    """A 'bulk' mutation (whole-corpus rewrite — what bulk_load emits)
    must mark the tables hard-stale: the next ensure_ann re-runs the
    full build instead of patching."""
    lex, _, _ = base
    cfg = _proj_cfg()
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex, pad_docs=24))
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    ann0 = eng.ensure_ann()
    store._notify("bulk", list(range(store.size)))
    assert eng._ann_stale_hard
    ann1 = eng.ensure_ann()
    assert ann1 is not ann0
    assert not eng._ann_stale_hard


def test_incremental_survives_save_load(base, tmp_path):
    """load_ann rehydrates the host slot-layout mirrors, so a restored
    engine still absorbs publishes incrementally."""
    lex = sample_lexicon()
    cfg = _proj_cfg()
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex, pad_docs=48))
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    eng.ensure_ann()
    path = str(tmp_path / "ann.npz")
    eng.save_ann(path)

    eng2 = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    eng2.load_ann(path)
    ann0 = eng2._ann
    assert ann0.build_rowids is not None
    t = "Palindrome rider covers racecar repairs both ways."
    store.publish_document("p_doc", [featurize_chunk(_mk(t, "p-c0", "p_doc"), lex)])
    assert eng2.ensure_ann() is ann0
    r = eng2.search(QueryRequest(query="palindrome racecar repairs"), k=5)[0]
    assert any(h.doc_id == "p_doc" for h in r.hits)


def test_host_residency_incremental():
    """Config-5 shape: host int8 rows + proj codes; streaming publish
    goes through the incremental path and the new rows serve."""
    lex = sample_lexicon()
    cfg = dataclasses.replace(
        get_config(), vector_residency="host", vector_dtype="int8",
        vector_backend="proj", ivf_nprobe=10 ** 6, over_fetch=8,
        ann_reserve_slabs=2)
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    ann0 = eng.ensure_ann()
    t = "Isogram policy insures heterogram typewriters quarterly."
    rec = featurize_chunk(_mk(t, "i-c0", "i_doc"), lex)
    store.publish_document("i_doc", [rec])
    assert eng.ensure_ann() is ann0
    r = eng.search(QueryRequest(query="isogram heterogram typewriters"),
                   k=5)[0]
    assert r.hits and r.hits[0].doc_id == "i_doc"
    # and the host re-rank serves a REAL cosine for the fresh row
    assert -1.01 <= r.hits[0].signals["cosine"] <= 1.01
