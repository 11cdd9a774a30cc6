"""Agent inner machinery (corpus_search_agent.py parity): selectivity
term partitioning (:1343), cascading candidate pools with inherited-
authority augmentation (:1762/:1970), internal recall self-estimate
feeding the router (:1503), multi-literal short-circuit (:2091), and the
v2 linear-feature blend."""
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.agent import (AgentRequest, CorpusSearchAgent,
                                        partition_terms)
from mobius_rag_tpu.query.classify import classify_query
from mobius_rag_tpu.query.engine import SearchEngine
from mobius_rag_tpu.query.router import Router, linear_features, linear_score
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def agent():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=40))
    return CorpusSearchAgent(SearchEngine(store, lex, embed_fn=hash_embed))


def test_partition_splits_by_selectivity(agent):
    lex = agent.engine.lexicon
    profile = classify_query(
        "sunshine health prior authorization for residential substance use "
        "treatment", lex)
    part = partition_terms(profile, lex)
    # payor (0.93) and residential-SUD (0.92) anchor; prior-auth (0.79) is context
    assert "j:payor.sunshine_health" in part["anchors"]
    assert "d:behavioral_health.sud_residential" in part["anchors"]
    assert "d:utilization_management.prior_authorization" in part["context"]


def test_pool_levels_and_inherited_authority(agent):
    lex = agent.engine.lexicon
    profile = classify_query("sunshine health timely filing deadline", lex)
    part = partition_terms(profile, lex)
    pool = agent.build_candidate_pool(part, "sunshine_health")
    assert pool["docs"] >= 1 and pool["level"] in (0, 1, 2)
    assert "sunshine_provider_manual" in pool["doc_ids"]
    # an unknown payer relaxes through the cascade instead of zeroing out
    pool2 = agent.build_candidate_pool(part, "no_such_payer")
    assert pool2["docs"] >= 1 and pool2["level"] >= pool["level"]


def test_multi_literal_short_circuit(agent):
    res = agent.run(AgentRequest(
        query="Is H0019 covered like code 51062 somewhere?"))
    # no single chunk carries both literals → no short-circuit, normal route
    assert res.decision.get("reason") != "multi-literal short-circuit"
    res2 = agent.run(AgentRequest(
        query="prior authorization H0019 asam level of care"))
    # single-literal query: short-circuit requires >= 2 literals
    assert "short_circuit" not in (res2.telemetry["attempts"][0].get("detail") or {})


def test_multi_literal_short_circuit_fires():
    lex = sample_lexicon()
    store = ChunkStore()
    recs = toy_corpus(lex)
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk

    text = ("Bill H2019 with modifier HM and cross-reference code 96110 "
            "for the developmental screen add-on.")
    recs.append(featurize_chunk(ChunkRecord(
        chunk_id="combo-c0", doc_id="combo_doc", text=text,
        embedding=hash_embed([text])[0]), lex))
    store.add_chunks(recs)
    agent = CorpusSearchAgent(SearchEngine(store, lex, embed_fn=hash_embed))
    res = agent.run(AgentRequest(query="How do H2019 and 96110 bill together?"))
    assert res.decision["reason"] == "multi-literal short-circuit"
    assert res.chunks and res.chunks[0].doc_id == "combo_doc"
    assert res.confidence_label == "high"


def test_self_estimate_recorded(agent):
    res = agent.run(AgentRequest(
        query="What is the timely filing deadline for Sunshine Health FL "
              "Medicaid claims?"))
    att = res.telemetry["attempts"][0]
    assert "recall_self_estimate" in att["detail"]
    assert att["detail"]["recall_self_estimate"] > 0.5


def test_router_v2_blends_linear_features():
    feats = {"query_class": "tight_pool", "canonicality": 0.0,
             "has_literal": True, "pool_size": 40,
             "has_j_payor_tag": True, "thematic_policy": False}
    v1 = Router(version="v1").decide(feats)
    v2 = Router(version="v2").decide(feats)
    lin_a = linear_score("a", linear_features(feats))
    # v2's score for the same arm includes the linear blend
    assert v2.scores["a"] == pytest.approx(v1.scores["a"] + 0.30 * lin_a, abs=1e-6)


def test_low_self_estimate_boosts_recall_demand():
    r = Router(version="v1")
    feats = {"query_class": "tight_pool", "canonicality": 0.0}
    base = r.decide(feats)
    boosted = r.decide({**feats, "recall_self_estimate": 0.1})
    # the boost raises recall_demand, so recall-heavy arms gain score
    assert any(boosted.scores[s] > base.scores[s] for s in boosted.scores)


# ---------------------------------------------------------------------------
# Round-3 agent depth: caller-mode presets, per-strategy rewrite,
# forced-override sets, strategy-chain narrative.
# ---------------------------------------------------------------------------

def test_caller_mode_presets_resolve():
    from mobius_rag_tpu.query.router import (CALLER_MODE_PRESETS,
                                             resolve_preferences)

    hs = resolve_preferences("high_stakes")
    assert hs.accuracy_need == 0.9 and hs.speed_budget == "interactive"
    # explicit fields override the preset
    custom = resolve_preferences("high_stakes", recall_demand=0.2)
    assert custom.accuracy_need == 0.9 and custom.recall_demand == 0.2
    # default when nothing given
    assert resolve_preferences() == CALLER_MODE_PRESETS["default"]
    with pytest.raises(ValueError):
        resolve_preferences("no_such_mode")


def test_caller_mode_changes_routing(agent):
    """quick_lookup (real_time, low recall) vs research (batch, high
    recall) must produce different preference-driven scores."""
    res_quick = agent.run(AgentRequest(
        query="what are the prior authorization rules for sunshine health",
        caller_mode="quick_lookup"))
    res_research = agent.run(AgentRequest(
        query="what are the prior authorization rules for sunshine health",
        caller_mode="research"))
    assert res_quick.decision["scores"] != res_research.decision["scores"]


def test_rewrite_appends_payer_context_for_c_d():
    from mobius_rag_tpu.query.strategies import rewrite_for_strategy

    q = "timely filing deadline"
    rc = rewrite_for_strategy(q, "c", payer="sunshine_health", state="FL")
    assert "sunshine health" in rc and "FL" in rc
    rd = rewrite_for_strategy(q, "d", payer="molina")
    assert "molina" in rd
    # a/b keep the query clean (no web context needed)
    assert rewrite_for_strategy(q, "a", payer="molina") == q
    # no duplicate append when the payer is already in the query
    rq = rewrite_for_strategy("molina timely filing", "d", payer="molina")
    assert rq.lower().count("molina") == 1


def test_rewrite_strips_persona_and_leads_with_literals():
    from mobius_rag_tpu.query.strategies import rewrite_for_strategy

    r = rewrite_for_strategy(
        "as a billing manager, when do claims deny?", "a")
    assert not r.lower().startswith("as a billing")
    r2 = rewrite_for_strategy("how do I bill code for therapy?", "a",
                              literals=("H2019",))
    assert r2.split()[0] == "H2019"


def test_forced_mode_set_restricts_cascade(agent):
    res = agent.run(AgentRequest(
        query="sunshine health timely filing", mode="a+b"))
    used = [s for s in res.strategy_chain if s not in ("e", "s")]
    assert used and set(used) <= {"a", "b"}
    assert "forced_set=" in res.decision["reason"]
    # invalid strategy in the set fails loudly
    with pytest.raises(ValueError):
        agent.run(AgentRequest(query="x", mode="a+zz"))


def test_single_forced_mode_still_single_attempt(agent):
    res = agent.run(AgentRequest(query="sunshine health timely filing",
                                 mode="b"))
    assert res.strategy_chain == ["b"]


def test_narrative_present_and_ordered(agent):
    res = agent.run(AgentRequest(
        query="what are the prior authorization rules for sunshine health"))
    n = res.narrative
    assert "classified as" in n and "candidate pool" in n
    assert ("routed to" in n) or ("short-circuit" in n)
    # narrative reaches the persisted trace via record_decision
    from mobius_rag_tpu.query.agent import AgentResult
    assert isinstance(res, AgentResult) and n.count("→") >= 2


def test_refusal_narrative(agent):
    res = agent.run(AgentRequest(
        query="sunshine claim for patient ssn 123-45-6789"))
    assert res.refused and "refused by gate e" in res.narrative
