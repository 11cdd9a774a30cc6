"""Strategy C citation locator: the full 6-outcome matrix
(validated_correct / validated_hallucinated / located_unverified /
unverified_robots / needs_scrape / needs_external — reference
strategy_c.py:273-699 docstring) via documents → discovered_sources →
web chain."""
import pytest

from mobius_rag_tpu.curator import Curator
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.query.strategies import locate_citation, run_strategy_c
from mobius_rag_tpu.testing import (ScriptedLLM, ScriptedWeb, hash_embed,
                                    sample_lexicon, toy_corpus)


@pytest.fixture(scope="module")
def engine():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=30))
    return SearchEngine(store, lex, embed_fn=hash_embed)


def _curator(tmp_path, probe=None):
    c = Curator(path=str(tmp_path / "curator.sqlite"), probe_fn=probe)
    c.upsert("https://www.sunshinehealth.com/providers/manual.pdf")
    c.curate("https://www.sunshinehealth.com/providers/manual.pdf", approve=True)
    return c


REQ = QueryRequest(query="sunshine timely filing", payer="sunshine_health")


def test_validated_correct_in_retrieved(engine):
    texts = ["Participating providers must submit initial claims within 180 days."]
    out = locate_citation("submit initial claims within 180 days",
                          texts, engine, REQ)
    assert out["outcome"] == "validated_correct" and out["where"] == "retrieved"


def test_validated_correct_via_corpus_locate(engine):
    # not in retrieved context, but verbatim in the corpus
    out = locate_citation(
        "participating providers must submit initial claims within 180 days",
        ["unrelated context"], engine, REQ)
    assert out["outcome"] == "validated_correct" and out["where"] == "corpus"


def test_validated_hallucinated(engine):
    # high-overlap but altered quote: corpus covers the location, quote is fake
    out = locate_citation(
        "participating providers must submit initial claims within 545 days "
        "from the date of service",
        ["unrelated"], engine, REQ)
    assert out["outcome"] == "validated_hallucinated"
    assert out.get("doc_id")


def test_located_unverified_offline(engine, tmp_path):
    out = locate_citation(
        "zymurgy fermentation consult windows are plan specific",
        ["unrelated"], engine, REQ, curator=_curator(tmp_path), web=None)
    assert out["outcome"] == "located_unverified"
    assert out["reason"] == "offline"


def test_unverified_robots(engine, tmp_path):
    cur = _curator(tmp_path, probe=lambda url: {"robots_disallowed": True})
    out = locate_citation(
        "zymurgy fermentation consult windows are plan specific",
        ["unrelated"], engine, REQ, curator=cur, web=ScriptedWeb())
    assert out["outcome"] == "unverified_robots"


def test_needs_scrape_empty_fetch(engine, tmp_path):
    out = locate_citation(
        "zymurgy fermentation consult windows are plan specific",
        ["unrelated"], engine, REQ, curator=_curator(tmp_path),
        web=ScriptedWeb(pages={}))
    assert out["outcome"] == "needs_scrape"


def test_validated_correct_external_fetch(engine, tmp_path):
    url = "https://www.sunshinehealth.com/providers/manual.pdf"
    web = ScriptedWeb(pages={
        url: "Manual text: zymurgy fermentation consult windows are "
             "plan specific for all members."})
    out = locate_citation(
        "zymurgy fermentation consult windows are plan specific",
        ["unrelated"], engine, REQ, curator=_curator(tmp_path), web=web)
    assert out["outcome"] == "validated_correct" and out["where"] == "external"


def test_needs_external_no_sources(engine):
    out = locate_citation(
        "xylophone calibration cadence for orbital launch vehicles",
        ["unrelated"], engine, REQ, curator=None, web=None)
    assert out["outcome"] == "needs_external"


def test_run_strategy_c_outcome_counts(engine, tmp_path):
    llm = ScriptedLLM({"strategy_c": (
        'The deadline is "within 180 days" per the manual, though some say '
        '"claims may be filed whenever convenient without any deadline".')})
    out = run_strategy_c(engine, REQ, 5, llm, curator=_curator(tmp_path))
    kinds = {o["outcome"] for o in out.detail["citations"]}
    assert "outcome_counts" in out.detail
    assert len(out.detail["citations"]) == 2
    # first quote verifies against the corpus; second is not verbatim
    assert "validated_correct" in kinds
    assert not out.success  # one unverified citation ⇒ not a clean success
