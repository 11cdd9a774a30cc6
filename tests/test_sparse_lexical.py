"""Sparse lexical postings layout (MRAG_LEXICAL_FORMAT=sparse): exact
score parity with the dense [H, C] matrix, overflow growth/pruning,
delete scrubbing, and snapshot round-trip."""
import dataclasses

import numpy as np
import pytest

from mobius_rag_tpu.config import Config
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _cfg(**kw) -> Config:
    base = Config()
    return dataclasses.replace(base, **kw)


def _engines():
    lex = sample_lexicon()
    recs = toy_corpus(lex)
    dense = ChunkStore(_cfg(lexical_format="dense"))
    sparse = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    dense.add_chunks(recs)
    sparse.add_chunks(toy_corpus(lex))
    return (SearchEngine(dense, lex, embed_fn=hash_embed),
            SearchEngine(sparse, lex, embed_fn=hash_embed))


def test_sparse_matches_dense_end_to_end():
    e_dense, e_sparse = _engines()
    for q in ("timely filing deadline for sunshine health",
              "prior authorization for H0019",
              "molina payer id for electronic claims"):
        rd = e_dense.search(QueryRequest(query=q), k=5)[0]
        rs = e_sparse.search(QueryRequest(query=q), k=5)[0]
        assert [h.chunk_id for h in rd.hits] == [h.chunk_id for h in rs.hits]
        for hd, hs in zip(rd.hits, rs.hits):
            assert hd.score == pytest.approx(hs.score, abs=1e-4)
        # the lexical arm traces themselves must agree
        ld = [t["row"] for t in rd.telemetry["arms"]["lexical"][:5]]
        ls = [t["row"] for t in rs.telemetry["arms"]["lexical"][:5]]
        assert ld == ls


def test_postings_grow_on_overflow():
    lex = sample_lexicon()
    store = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    # 30 chunks all hitting the same buckets → forces P to double past 8
    recs = []
    base = toy_corpus(lex)[0]
    for i in range(30):
        recs.append(dataclasses.replace(
            base, chunk_id=f"c{i}", doc_id=f"d{i}",
            embedding=hash_embed([f"text {i}"])[0]))
    store.add_chunks(recs)
    assert store._lex_cols_np.shape[1] >= 30
    b = next(iter(base.lexical_weights))
    bucket = b % store.cfg.lexical_buckets
    assert int(store._lex_fill[bucket]) == 30


def test_postings_prune_at_cap():
    lex = sample_lexicon()
    store = ChunkStore(_cfg(lexical_format="sparse",
                            lexical_postings_init=8,
                            lexical_postings_max=8))
    base = toy_corpus(lex)[0]
    recs = []
    for i in range(20):
        r = dataclasses.replace(
            base, chunk_id=f"c{i}", doc_id=f"d{i}",
            embedding=hash_embed([f"text {i}"])[0])
        # strictly increasing weights so the survivors are the last 8 rows
        r.lexical_weights = {b: w + i for b, w in base.lexical_weights.items()}
        recs.append(r)
    store.add_chunks(recs)
    assert store._lex_cols_np.shape[1] == 8
    bucket = next(iter(base.lexical_weights)) % store.cfg.lexical_buckets
    kept = set(store._lex_cols_np[bucket].tolist())
    assert kept == set(range(12, 20))  # heaviest 8 of 20


def test_delete_scrubs_on_compaction():
    lex = sample_lexicon()
    store = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    recs = toy_corpus(lex)
    store.add_chunks(recs)
    doc = recs[0].doc_id
    store.delete_by_document(doc)
    # deleted rows stay in postings (masked by valid) until a bucket
    # overflows; searches must not surface them
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    res = eng.search(QueryRequest(query="timely filing deadline"), k=10)[0]
    assert all(h.doc_id != doc for h in res.hits)
    # compaction drops them from the mirrors
    bucket = next(iter(recs[0].lexical_weights)) % store.cfg.lexical_buckets
    store._sparse_compact(bucket)
    dead = {r for r, rec in enumerate(store.records) if rec is None}
    live_cols = store._lex_cols_np[bucket][store._lex_cols_np[bucket] >= 0]
    assert not dead.intersection(live_cols.tolist())


def test_snapshot_roundtrip(tmp_path):
    lex = sample_lexicon()
    cfg = _cfg(lexical_format="sparse", lexical_postings_init=8)
    store = ChunkStore(cfg)
    store.add_chunks(toy_corpus(lex))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    before = eng.search(QueryRequest(query="prior authorization H0019"), k=5)[0]

    path = str(tmp_path / "snap")
    store.snapshot(path)
    restored = ChunkStore.restore(path, cfg)
    assert np.array_equal(store._lex_cols_np, restored._lex_cols_np)
    assert np.array_equal(store._lex_fill, restored._lex_fill)
    eng2 = SearchEngine(restored, lex, embed_fn=hash_embed)
    after = eng2.search(QueryRequest(query="prior authorization H0019"), k=5)[0]
    assert [h.chunk_id for h in before.hits] == [h.chunk_id for h in after.hits]


def test_snapshot_format_mismatch_rejected(tmp_path):
    lex = sample_lexicon()
    store = ChunkStore(_cfg(lexical_format="sparse"))
    store.add_chunks(toy_corpus(lex))
    path = str(tmp_path / "snap")
    store.snapshot(path)
    with pytest.raises(ValueError, match="lexical_format"):
        ChunkStore.restore(path, _cfg(lexical_format="dense"))


def test_sharded_sparse_matches_dense_engine():
    """8-shard sparse search must reproduce the single-device DENSE
    engine's results — postings are re-keyed to local row ids per shard
    and the merge path is untouched."""
    from mobius_rag_tpu.parallel.mesh import make_mesh
    from mobius_rag_tpu.parallel.sharded import ShardedEngine

    lex = sample_lexicon()
    dense = ChunkStore(_cfg(lexical_format="dense"))
    dense.add_chunks(toy_corpus(lex, pad_docs=300))
    sparse = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    sparse.add_chunks(toy_corpus(lex, pad_docs=300))

    e_dense = SearchEngine(dense, lex, embed_fn=hash_embed)
    e_sparse = SearchEngine(sparse, lex, embed_fn=hash_embed)
    sharded = ShardedEngine(sparse, mesh=make_mesh(8))
    # each device's local table must carry only local row ids
    c_local = sharded.index.valid.shape[0] // 8
    cols = np.asarray(sharded.index.lex_cols)
    assert cols.max() < c_local

    for q in ("timely filing deadline for sunshine health claims",
              "prior authorization for durable medical equipment"):
        rd = e_dense.search(QueryRequest(query=q), k=5)[0]
        rs = sharded.search(e_sparse, QueryRequest(query=q), k=5)[0]
        assert [h.chunk_id for h in rd.hits] == [h.chunk_id for h in rs.hits]
        for hd, hs in zip(rd.hits, rs.hits):
            assert hd.score == pytest.approx(hs.score, abs=1e-4)


def test_bulk_load_sparse_matches_incremental():
    lex = sample_lexicon()
    recs = toy_corpus(lex)
    inc = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    inc.add_chunks(recs)
    bulk = ChunkStore(_cfg(lexical_format="sparse", lexical_postings_init=8))
    bulk.bulk_load(toy_corpus(lex))
    e1 = SearchEngine(inc, lex, embed_fn=hash_embed)
    e2 = SearchEngine(bulk, lex, embed_fn=hash_embed)
    q = QueryRequest(query="timely filing deadline for sunshine health")
    r1, r2 = e1.search(q, k=5)[0], e2.search(q, k=5)[0]
    assert [h.chunk_id for h in r1.hits] == [h.chunk_id for h in r2.hits]
