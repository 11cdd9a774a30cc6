"""Multi-slice hierarchical merge (parallel/slices.py): two half-corpus
engines + k-results merge must reproduce the whole-corpus engine for
embedding-only queries (every score slice-independent), and the merge
obeys the k/dedup/label contracts."""
import numpy as np

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.parallel.slices import merge_slice_results
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _engines():
    lex = sample_lexicon()
    recs = toy_corpus(lex, pad_docs=60)
    mid = len(recs) // 2
    parts = []
    for rs in (recs[:mid], recs[mid:]):
        st = ChunkStore()
        st.add_chunks(rs)
        parts.append(SearchEngine(st, lex, embed_fn=hash_embed))
    full_store = ChunkStore()
    full_store.add_chunks(recs)
    return parts, SearchEngine(full_store, lex, embed_fn=hash_embed)


def test_hierarchical_merge_matches_full_engine():
    parts, full = _engines()
    qs = [QueryRequest(query="", tag_mode="none",
                       embedding=hash_embed([t])[0])
          for t in ("timely filing deadline for sunshine health claims",
                    "prior authorization durable medical equipment",
                    "molina eligibility verification")]
    per_slice = [e.search(qs, k=5) for e in parts]
    merged = merge_slice_results(per_slice, k=5)
    want = full.search(qs, k=5)
    for m, w in zip(merged, want):
        assert [h.chunk_id for h in m.hits] == [h.chunk_id for h in w.hits]
        np.testing.assert_allclose([h.score for h in m.hits],
                                   [h.score for h in w.hits], atol=1e-6)
        assert m.telemetry["multi_slice"]["slices"] == 2


def test_merge_dedupes_and_caps():
    parts, _ = _engines()
    q = QueryRequest(query="", tag_mode="none",
                     embedding=hash_embed(["claims"])[0])
    a = parts[0].search([q], k=5)
    merged = merge_slice_results([a, a], k=5)  # same slice twice: dupes
    ids = [h.chunk_id for h in merged[0].hits]
    assert len(ids) == len(set(ids)) <= 5
