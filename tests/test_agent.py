"""Agent orchestration tests over the toy corpus: routing, fail-fast,
strategies, multi-invoke union, fact-store pre-route, synthesis."""
import pytest

from mobius_rag_tpu.clients import StaticFactStore
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.agent import AgentRequest, CorpusSearchAgent
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.query.strategies import run_strategy_b
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def agent():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=30))
    engine = SearchEngine(store, lex, embed_fn=hash_embed)
    facts = StaticFactStore([{
        "id": "f1", "payer": "molina", "patterns": ["payer id"],
        "fact": "Molina electronic claims use payer ID 51062.",
        "source": "payor_fact_store",
    }])
    return CorpusSearchAgent(engine, fact_store=facts)


def test_happy_path_routes_and_answers(agent):
    res = agent.run(AgentRequest(
        query="What is the timely filing deadline for Sunshine Health FL Medicaid claims?"))
    assert not res.refused
    assert res.chunks and res.chunks[0].doc_id == "sunshine_provider_manual"
    assert res.strategy_chain and res.strategy_chain[0] in "abcd"
    assert "[passage" in res.answer or "180" in res.answer
    assert res.profile["query_class"] in ("tight_pool", "literal_anchor", "conceptual")
    assert res.decision["priors_version"]


def test_fail_fast_phi(agent):
    res = agent.run(AgentRequest(query="sunshine claim for patient ssn 123-45-6789"))
    assert res.refused and res.strategy_chain == ["e"]
    assert res.confidence_label == "abstain"
    assert res.telemetry["attempts"] == []


def test_out_of_scope_refusal(agent):
    res = agent.run(AgentRequest(query="what's a good chocolate cake recipe"))
    assert res.refused
    assert res.gate["contour"] == "OUT_OF_SCOPE"


def test_fact_store_preroute(agent):
    res = agent.run(AgentRequest(query="what is the payer id for molina electronic claims",
                                 payer="molina"))
    assert res.strategy_chain == ["s"]
    assert "51062" in res.answer
    assert res.confidence_label == "high"


def test_conceptual_guard_skips_fact_store(agent):
    res = agent.run(AgentRequest(
        query="why does molina use a payer id for electronic claims"))
    assert res.strategy_chain[:1] != ["s"]


def test_forced_mode(agent):
    res = agent.run(AgentRequest(query="sunshine health timely filing", mode="b"))
    assert res.strategy_chain == ["b"]
    assert res.decision["strategy"] == "b"


def test_forced_s_without_hit_abstains(agent):
    res = agent.run(AgentRequest(query="sunshine health timely filing", mode="s"))
    assert res.confidence_label == "abstain"


def test_strategy_b_wide_themes_narrow(agent):
    out = run_strategy_b(agent.engine,
                         QueryRequest(query="prior authorization requirements"), k=5)
    assert out.detail["themes"] >= 1
    assert out.hits


def test_improvement_hint_on_underspecified(agent):
    res = agent.run(AgentRequest(query="what are the prior authorization rules"))
    # no payer → missing J over a broad-ish corpus; hint should guide
    if res.gate["contour"] == "UNDERSPECIFIED":
        assert "specify" in res.improvement_hint


def test_observer_called(agent):
    seen = []
    agent.observers.append(seen.append)
    agent.run(AgentRequest(query="sunshine health timely filing"))
    agent.observers.clear()
    assert len(seen) == 1
    assert seen[0].telemetry["attempts"]


def test_router_v2_multi_invoke_union():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=10))
    engine = SearchEngine(store, lex, embed_fn=hash_embed)
    agent = CorpusSearchAgent(engine, router_version="v2")
    res = agent.run(AgentRequest(
        query="sunshine health prior authorization policy for residential "
              "treatment services overall"))
    assert not res.refused
    # whether or not multi-invoke fired, the result must be coherent
    assert len(res.strategy_chain) >= 1
    assert res.decision["multi_invoke"]
