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
