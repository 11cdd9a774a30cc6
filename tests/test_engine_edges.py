"""Engine edge configurations: empty store, lexicon-less operation,
store growth mid-serving."""
import numpy as np

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.agent import AgentRequest, CorpusSearchAgent
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def test_search_empty_store():
    engine = SearchEngine(ChunkStore(), sample_lexicon(), embed_fn=hash_embed)
    res = engine.search(QueryRequest(query="timely filing deadline"), k=5)[0]
    assert res.hits == []
    assert res.confidence_label == "abstain"


def test_engine_without_lexicon():
    store = ChunkStore()
    store.add_chunks(toy_corpus(None, pad_docs=5))  # no lexicon featurization
    engine = SearchEngine(store, lexicon=None, embed_fn=hash_embed)
    res = engine.search(QueryRequest(query="timely filing deadline for claims"),
                        k=5)[0]
    # pure vector+lexical retrieval still works without any tag machinery
    assert res.hits
    assert res.expansion.matched_codes == []


def test_agent_on_empty_store():
    agent = CorpusSearchAgent(
        SearchEngine(ChunkStore(), sample_lexicon(), embed_fn=hash_embed))
    res = agent.run(AgentRequest(query="sunshine health timely filing deadline"))
    # gates to CORPUS_GAP (tags matched, no docs carry them) → refusal-free
    # abstain with a hint, never a crash
    assert res.confidence_label == "abstain"
    assert res.gate["contour"] in ("CORPUS_GAP", "UNDERSPECIFIED", "EXACT",
                                   "VICINITY")


def test_growth_mid_serving():
    lex = sample_lexicon()
    store = ChunkStore(capacity=256)
    engine = SearchEngine(store, lex, embed_fn=hash_embed)
    store.add_chunks(toy_corpus(lex))
    r1 = engine.search(QueryRequest(query="timely filing sunshine"), k=3)[0]
    assert r1.hits
    # grow past capacity (256 → 512+) while the engine object lives
    store.add_chunks(toy_corpus(lex, pad_docs=300)[10:])
    r2 = engine.search(QueryRequest(query="timely filing sunshine"), k=3)[0]
    assert r2.hits and r2.hits[0].doc_id == r1.hits[0].doc_id
    assert store.capacity >= 300


def test_meta_only_coverage_credit():
    """The folded coverage weight (W_COV = tag_coverage .40 + meta_boost
    .15) must credit a phrase found only in a chunk's METADATA (the
    reference's meta_boost behavior) — and not credit a chunk carrying
    the phrase nowhere."""
    import numpy as np

    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon

    lex = sample_lexicon()
    base = hash_embed(["benefit limits and coverage rules"])[0]
    recs = []
    # identical body/embedding; phrase surface differs: body vs meta vs none
    for cid, body, filename in [
        ("body", "Durable medical equipment rentals are capped.", "notes.pdf"),
        ("meta", "Equipment rentals are capped at purchase price.",
         "Durable Medical Equipment Policy.pdf"),
        ("none", "Equipment rentals are capped at purchase price.", "notes.pdf"),
    ]:
        recs.append(featurize_chunk(ChunkRecord(
            chunk_id=f"{cid}-c0", doc_id=f"{cid}_doc", text=body,
            embedding=base.copy(), filename=filename), lex))
    store = ChunkStore()
    store.add_chunks(recs)
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    res = eng.search(QueryRequest(query="durable medical equipment",
                                  tag_mode="none", mode="recall"), k=3)[0]
    cov = {h.doc_id: h.signals["coverage"] for h in res.hits}
    assert cov["body_doc"] > 0 and cov["meta_doc"] > 0
    assert cov["meta_doc"] == cov["body_doc"]  # meta credit == body credit
    assert cov["none_doc"] == 0.0


def test_mode_semantics():
    """Pin the mode contract: precision = lexical-dominant, recall =
    vector-dominant + keeps abstain-grade hits, corpus = balanced."""
    import numpy as np

    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query.engine import (_MODE_ARM_WEIGHTS, MODE_MIN_LABEL,
                                             QueryRequest, SearchEngine)
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=30))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)

    # arm-weight shape: precision leans lexical, recall leans vector
    assert _MODE_ARM_WEIGHTS["precision"][1] > _MODE_ARM_WEIGHTS["precision"][0]
    assert _MODE_ARM_WEIGHTS["recall"][0] > _MODE_ARM_WEIGHTS["recall"][1]
    assert MODE_MIN_LABEL["recall"] == "abstain"

    # recall mode keeps low-grade hits that corpus mode floors away
    q = QueryRequest(query="annual committee budget survey", tag_mode="none")
    import dataclasses

    corpus_hits = eng.search(dataclasses.replace(q, mode="corpus"), k=10)[0].hits
    recall_hits = eng.search(dataclasses.replace(q, mode="recall"), k=10)[0].hits
    assert len(recall_hits) >= len(corpus_hits)
    floor = eng.cfg.confidence_low
    assert all(h.score >= floor for h in corpus_hits)
