"""End-to-end compiled-pipeline tests over the toy corpus: hybrid arms,
filters with auto-relax, RRF fusion, coverage-weighted rerank, and
confidence labels (behavioral parity with corpus_search semantics)."""
import numpy as np
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def engine():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=50))
    return SearchEngine(store, lex, embed_fn=hash_embed)


def test_timely_filing_query_hits_sunshine(engine):
    res = engine.search(QueryRequest(
        query="What is the timely filing deadline for Sunshine Health FL Medicaid claims?"
    ), k=5)[0]
    assert res.hits, "no hits"
    top = res.hits[0]
    assert top.doc_id == "sunshine_provider_manual"
    assert "180 days" in top.text
    assert res.confidence_label in ("high", "medium")
    assert "j:payor.sunshine_health" in res.expansion.matched_codes


def test_payer_filter_excludes_other_payers(engine):
    res = engine.search(QueryRequest(
        query="timely filing deadline for claims", payer="aetna"
    ), k=5)[0]
    assert res.hits
    assert all(h.metadata["payer"] == "aetna" for h in res.hits)
    assert res.hits[0].doc_id == "aetna_provider_manual"


def test_h0019_prior_auth(engine):
    res = engine.search(QueryRequest(
        query="Does Sunshine Health require prior authorization for residential "
              "substance use treatment under code H0019?"
    ), k=3)[0]
    assert res.hits[0].doc_id == "sunshine_provider_manual"
    assert "H0019" in res.hits[0].text


def test_rerank_prefers_tagged_doc_over_distractor(engine):
    # The AHCA quarterly report mentions "claims" but carries no payer tag;
    # a Sunshine-specific query must prefer the Sunshine manual (the
    # selectivity-weighted coverage fix, corpus_search.py:1966-1977).
    res = engine.search(QueryRequest(
        query="sunshine health claim filing window"
    ), k=5)[0]
    docs = [h.doc_id for h in res.hits]
    assert docs[0] == "sunshine_provider_manual"
    if "ahca_quarterly_report" in docs:
        assert docs.index("ahca_quarterly_report") > 0


def test_batched_queries_match_single(engine):
    reqs = [
        QueryRequest(query="molina eligibility verification"),
        QueryRequest(query="preferred drug list formulary updates"),
    ]
    batched = engine.search(reqs, k=3)
    singles = [engine.search(r, k=3)[0] for r in reqs]
    for b, s in zip(batched, singles):
        assert [h.chunk_id for h in b.hits] == [h.chunk_id for h in s.hits]
    assert batched[0].hits[0].doc_id == "molina_quick_reference"
    assert batched[1].hits[0].doc_id == "aetna_provider_manual"


def test_tag_mode_none_widens(engine):
    strict = engine.search(QueryRequest(
        query="telehealth utilization behavioral health", tag_mode="strict"
    ), k=5)[0]
    wide = engine.search(QueryRequest(
        query="telehealth utilization behavioral health", tag_mode="none",
        mode="recall",
    ), k=5)[0]
    assert len(wide.hits) >= len(strict.hits)


def test_min_similarity_gates_vector_arm(engine):
    # min_similarity is a VECTOR-arm post-filter (corpus_search.py:1427);
    # lexical-arm hits may still surface — assert the arm trace is empty
    # for an off-domain query with a high floor.
    res = engine.search(QueryRequest(
        query="completely unrelated quantum chromodynamics lattice",
        min_similarity=0.9,
    ), k=5)[0]
    assert res.telemetry["arms"]["vector"] == []


def test_inherited_authority(engine):
    # the AHCA quarterly report has authority_level 1 (not a regulator) —
    # build a regulator doc to exercise inheritance
    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.testing import hash_embed as he, sample_lexicon

    lex = sample_lexicon()
    store = ChunkStore()
    from mobius_rag_tpu.testing import toy_corpus

    recs = toy_corpus(lex)
    reg = ChunkRecord(
        chunk_id="ahca_rule-c0", doc_id="ahca_rule", source_id="ahca-s0",
        text="AHCA rule: statewide Medicaid timely filing may not exceed "
             "365 days for any managed care plan.",
        embedding=he(["statewide medicaid timely filing rule 365 days"])[0],
        payer="", state="FL", authority_level=4, filename="ahca_rule.pdf",
    )
    store.add_chunks(recs + [featurize_chunk(reg, lex)])
    eng = SearchEngine(store, lex, embed_fn=he)

    q = "statewide timely filing rule for medicaid plans"
    with_inherit = eng.search(QueryRequest(query=q, payer="sunshine_health"),
                              k=10)[0]
    docs = {h.doc_id for h in with_inherit.hits}
    assert "ahca_rule" in docs, "regulator doc must pass the payer filter"
    without = eng.search(QueryRequest(query=q, payer="sunshine_health",
                                      inherit_authority=False), k=10)[0]
    assert all(h.doc_id != "ahca_rule" for h in without.hits)
    # non-regulator other-payer docs still excluded either way
    assert all(h.metadata["payer"] in ("sunshine_health", "")
               for h in with_inherit.hits)


def test_telemetry_shape(engine):
    res = engine.search(QueryRequest(query="dme prior auth"), k=3)[0]
    t = res.telemetry
    assert set(t["arms"]) == {"vector", "lexical", "dtag"}
    assert t["timings_ms"]["device"] > 0
    assert any("matched" in line for line in t["expansion_log"])


def test_neighbor_expansion(engine):
    # k=1 so the sibling chunks are NOT hits themselves and must arrive
    # as neighbors
    res = engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims"), k=1)[0]
    top = res.hits[0]
    assert top.doc_id == "sunshine_provider_manual"
    assert top.neighbors, "expected neighbor expansion on a multi-chunk doc"
    assert all(n["chunk_id"] != top.chunk_id for n in top.neighbors)
    assert all(n["position"] in ("before", "after") for n in top.neighbors)
    # caps respected
    assert len(top.neighbors) <= engine.MAX_NEIGHBORS_PER_HIT
    # neighbors never duplicate other hits in the result
    hit_ids = {h.chunk_id for h in res.hits}
    for h in res.hits:
        assert all(n["chunk_id"] not in hit_ids for n in h.neighbors)


def test_mode_confidence_floor(engine):
    # an off-topic query returns junk-grade hits: corpus mode drops them
    # (floor = confidence_low), recall mode keeps everything (_MODE_MIN)
    q = "miscellaneous committee schedule annual review"
    corpus = engine.search(QueryRequest(query=q, mode="corpus",
                                        tag_mode="none"), k=10)[0]
    recall = engine.search(QueryRequest(query=q, mode="recall",
                                        tag_mode="none"), k=10)[0]
    assert len(recall.hits) >= len(corpus.hits)
    floor = engine.cfg.confidence_low
    assert all(h.score >= floor for h in corpus.hits)


def test_deleted_doc_never_surfaces(engine):
    # fresh store so we don't poison the module fixture
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    q = QueryRequest(query="timely filing sunshine health")
    before = eng.search(q, k=5)[0]
    assert before.hits[0].doc_id == "sunshine_provider_manual"
    store.delete_by_document("sunshine_provider_manual")
    after = eng.search(q, k=5)[0]
    assert all(h.doc_id != "sunshine_provider_manual" for h in after.hits)


def test_rrf_sums_duplicate_arm_contributions(engine):
    """A chunk surfacing in multiple arms must accumulate RRF from each
    (union fusion's pairwise duplicate-sum): its fused score has to beat
    the max a single arm can contribute (w=1, rank 0 → 1/(rrf_k+1))."""
    res = engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims"), k=5)[0]
    top = res.hits[0]
    arms = res.telemetry["arms"]
    in_arms = [a for a in ("vector", "lexical", "dtag")
               if any(t["row"] == top.row for t in arms[a])]
    assert len(in_arms) >= 2
    assert top.signals["rrf"] > 1.0 / (engine.cfg.rrf_k + 1) + 1e-6


def test_search_program_keeps_arm_outputs_materialized():
    """The compiled program must carry an optimization barrier on the
    arm-candidate outputs: without it XLA rematerializes the full [B, C]
    arm scans once per output consumer (measured 189 -> 44 ms/batch32 at
    1M rows on the real chip when the barrier was added)."""
    import jax

    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import _search_compiled
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=10))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    q, _ = eng.prepare_batch([QueryRequest(query="timely filing")])
    lowered = jax.jit(
        _search_compiled.__wrapped__,
        static_argnames=("k", "over_fetch", "rrf_k", "nprobe"),
    ).lower(store.index, q, 10, 4, 60, None, 32)
    assert "optimization_barrier" in lowered.as_text()


def test_pipelined_merge_parity(engine):
    """pipeline_merge fuses same-size batches into one wider program;
    every score is per-query, so results must be IDENTICAL to the
    unmerged path (hit order, scores, telemetry row sets)."""
    import dataclasses

    qs = ["timely filing deadline for sunshine health claims",
          "prior authorization for residential treatment H0019",
          "aetna corrected claim submission window",
          "telehealth modifier for behavioral analysis"]
    batches = [[QueryRequest(query=q) for q in qs[i:i + 2]]
               for i in range(0, len(qs), 2)] * 2   # 4 batches of 2
    base = engine.search_pipelined(batches, k=5)
    merged_cfg = dataclasses.replace(engine.cfg, pipeline_merge=4)
    old = engine.cfg
    try:
        engine.cfg = merged_cfg
        fused = engine.search_pipelined(batches, k=5)
    finally:
        engine.cfg = old
    assert len(fused) == len(base)
    for rb, rf in zip(base, fused):
        assert [h.row for r in rb for h in r.hits] == \
               [h.row for r in rf for h in r.hits]
        for a, b in zip(rb, rf):
            for ha, hb in zip(a.hits, b.hits):
                assert abs(ha.score - hb.score) < 1e-6


def test_pipelined_merge_uneven_batches_fall_through(engine):
    """Batches of differing sizes must bypass the merge path untouched."""
    import dataclasses

    batches = [[QueryRequest(query="timely filing")],
               [QueryRequest(query="prior auth"),
                QueryRequest(query="corrected claims")]]
    old = engine.cfg
    try:
        engine.cfg = dataclasses.replace(engine.cfg, pipeline_merge=8)
        res = engine.search_pipelined(batches, k=3)
    finally:
        engine.cfg = old
    assert [len(r) for r in res] == [1, 2]
    assert all(r.hits for batch in res for r in batch)
