"""Agent escalation budget + signature fast-exit tests."""
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.agent import AgentRequest, CorpusSearchAgent
from mobius_rag_tpu.query.engine import SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture()
def agent():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=10))
    return CorpusSearchAgent(SearchEngine(store, lex, embed_fn=hash_embed))


def test_signature_fast_exit(agent):
    q = "what's the best chocolate cake recipe"
    r1 = agent.run(AgentRequest(query=q))
    assert r1.refused and r1.decision["reason"].startswith("gate:")
    r2 = agent.run(AgentRequest(query=q))
    assert r2.refused and r2.decision["reason"] == "signature fast-exit"
    # different query shape does NOT fast-exit
    r3 = agent.run(AgentRequest(query="sunshine health timely filing"))
    assert not r3.refused


def test_forced_mode_bypasses_signature_cache(agent):
    q = "completely novel off domain question about astrophysics"
    agent.run(AgentRequest(query=q))  # populates cache (refused)
    r = agent.run(AgentRequest(query=q, mode="a"))
    # forced mode still refused by the gate, but NOT via the cache
    assert r.decision["reason"] != "signature fast-exit"


def test_escalation_budget_counts(agent):
    # telemetry attempts carry per-strategy detail; budget caps total cost
    r = agent.run(AgentRequest(query="sunshine health timely filing"))
    total_cost = sum(
        {"a": 1.0, "b": 2.0, "c": 4.0, "d": 4.0, "s": 0.5}.get(a["strategy"], 1.0)
        for a in r.telemetry["attempts"])
    assert total_cost <= 8.0 + 4.0  # budget + at most one overshoot attempt
