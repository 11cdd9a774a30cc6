"""Eval harness tests: bank loading (incl. reference banks when present),
judge scoring, chunk fact-checking, full runs + calibration + priors
derivation."""
import json
import os

import pytest

from mobius_rag_tpu.eval_harness.bank import load_bank
from mobius_rag_tpu.eval_harness.calibrate import calibrate
from mobius_rag_tpu.eval_harness.db import EvalDB
from mobius_rag_tpu.eval_harness.derive_priors import derive_priors
from mobius_rag_tpu.eval_harness.fact_checker import check_facts
from mobius_rag_tpu.eval_harness.judge import judge_answer
from mobius_rag_tpu.eval_harness.run import run_eval
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.agent import CorpusSearchAgent
from mobius_rag_tpu.query.engine import SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def agent():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=20))
    return CorpusSearchAgent(SearchEngine(store, lex, embed_fn=hash_embed))


def test_load_toy_bank():
    bank = load_bank("toy")
    assert bank.version == "toy_v1"
    assert len(bank.queries) == 5
    q = bank.queries[0]
    # rubric folding: must_facts reachable via expected
    assert q.must_facts and "180 days" in q.must_facts[0]
    assert q.expected["strategy"] == "a"
    assert bank.sha


@pytest.mark.skipif(not os.path.exists("/root/reference/eval/queries_cmhc_smoke.yaml"),
                    reason="reference banks not mounted")
def test_load_reference_smoke_bank():
    bank = load_bank("cmhc_smoke")
    assert bank.queries
    q = bank.queries[0]
    assert q.must_facts, "expected-key folding must surface rubric fields"
    assert q.expected.get("query_class")


def test_judge_correct_answer():
    r = judge_answer(
        "Participating providers must file within 180 days; non-participating "
        "providers have 365 days.",
        must_facts=["180 days for participating providers",
                    "365 days for non-participating providers"],
        bonus_facts=["disputes within 90 days"],
        forbidden_facts=["no timely filing limit applies"],
    )
    assert r.verdict == "correct"
    assert r.verdicts.must == [True, True]
    assert not any(r.verdicts.forbidden)


def test_judge_number_mismatch_fails():
    r = judge_answer(
        "Participating providers must file within 190 days.",
        must_facts=["180 days for participating providers"],
    )
    assert r.verdicts.must == [False]
    assert r.verdict in ("incorrect", "abstain")


def test_judge_forbidden_caps_score():
    r = judge_answer(
        "There is no timely filing limit; claims can be filed within 180 days "
        "for participating providers anyway.",
        must_facts=["180 days for participating providers"],
        forbidden_facts=["no timely filing limit"],
    )
    assert r.score <= 0.2
    assert r.verdict == "incorrect"


def test_judge_honest_abstain():
    r = judge_answer("UNKNOWN — cannot answer from the corpus.",
                     must_facts=["180 days"])
    assert r.verdict == "abstain"


def test_fact_checker_recall_and_hallucination():
    chunks = ["Timely filing: participating providers must submit initial "
              "claims within 180 days from the date of service."]
    r = check_facts(["180 days for participating providers",
                     "365 days for non-participating providers"],
                    chunks,
                    answer="Participating: 180 days. Non-participating: 365 days.",
                    mode="grounding")
    assert r.recall == 0.5
    assert r.hallucinated and "365" in r.hallucinated[0]
    assert r.grounding == 0.5


def test_run_eval_toy_bank(agent, tmp_path):
    db = EvalDB(str(tmp_path / "eval.sqlite"))
    out = run_eval(agent, "toy", db=db)
    agg = out.aggregates
    assert agg["n"] == 5
    # retrieval works on the toy corpus: the 4 answerable queries must be
    # judged correct with full chunk recall
    assert agg["accuracy"] >= 0.6
    assert agg["citation_rate"] >= 0.75
    assert agg["mean_chunk_recall"] >= 0.6
    assert agg["latency_ms_median"] > 0
    # persistence roundtrip
    assert db.run(out.run_id)["aggregates"]["n"] == 5
    assert len(db.results(out.run_id)) == 5
    # out-of-scope query refused with matching contour
    toy5 = [r for r in out.results if r["query_id"] == "toy005"][0]
    assert toy5["refused"] and toy5["checks"]["contour"]["ok"]


def test_calibrate_and_derive_priors(agent, tmp_path):
    db = EvalDB(str(tmp_path / "eval.sqlite"))
    result = calibrate(agent, "toy", db=db)
    assert set(result["per_run"]) == {"a", "b", "c", "d", "s", "natural"}
    assert result["oracle_recall"] >= result["natural_recall"] - 1e-9
    assert "matrix" in result and result["matrix"].get("a")

    out_path = str(tmp_path / "priors.json")
    info = derive_priors(result["matrix"], result["calib_id"], out_path=out_path,
                         min_n=1)
    assert info["updated_cells"] > 0
    regenerated = json.load(open(out_path))
    assert regenerated["priors_version"].startswith("calib-")
    # regenerated priors still load into a Router
    from mobius_rag_tpu.query.router import Router
    r = Router(priors_path=out_path)
    assert r.decide({"query_class": "tight_pool", "canonicality": 0.0}).strategy


def test_derive_priors_reports_deltas_and_skips(tmp_path):
    """The r4 artifact bug: the caller read a key that didn't exist and
    reported 0 cells as success. derive_priors now returns explicit
    deltas (before/after per cell) and skip reasons."""
    import json

    from mobius_rag_tpu.eval_harness.derive_priors import derive_priors
    from mobius_rag_tpu.query.router import _default_priors_path

    src = json.load(open(_default_priors_path()))
    p = tmp_path / "priors.json"
    p.write_text(json.dumps(src))
    sid = next(iter(src["priors"]))
    qc = next(iter(src["priors"][sid]))
    matrix = {
        sid: {qc: {"n": 5, "accuracy": 0.77, "accuracy_std": 0.1,
                   "recall": 0.66},
              "zz_missing": {"n": 5, "accuracy": 0.5,
                             "accuracy_std": 0.0, "recall": 0.5}},
        "natural": {qc: {"n": 5, "accuracy": 0.9, "accuracy_std": 0.0,
                         "recall": 0.9}},
    }
    out = derive_priors(matrix, "cafebabe", priors_path=str(p),
                        out_path=str(p), min_n=3)
    assert out["updated_cells"] == 1
    assert out["deltas"][0]["sid"] == sid
    assert out["deltas"][0]["after"]["accuracy"] == 0.77
    assert out["deltas"][0]["before"]["accuracy"] is not None
    assert any(s.get("reason") == "no prior cell" for s in out["skipped"])
    got = json.loads(p.read_text())
    assert got["priors"][sid][qc]["accuracy"] == 0.77
    assert got["priors_version"] == "calib-cafebabe"
    # min_n gate produces a skip entry, not silence
    out2 = derive_priors(
        {sid: {qc: {"n": 1, "accuracy": 0.1, "accuracy_std": 0.0,
                    "recall": 0.1}}},
        "deadbeef", priors_path=str(p), out_path=str(p), min_n=3)
    assert out2["updated_cells"] == 0
    assert any("min_n" in s.get("reason", "") for s in out2["skipped"])


def test_merge_matrices_pools_n_and_stats():
    from mobius_rag_tpu.eval_harness.derive_priors import merge_matrices

    m1 = {"a": {"factual": {"n": 2, "accuracy": 1.0, "accuracy_std": 0.0,
                            "recall": 0.8, "recall_std": 0.0,
                            "answer_rate": 1.0, "latency_ms_median": 10}}}
    m2 = {"a": {"factual": {"n": 2, "accuracy": 0.0, "accuracy_std": 0.0,
                            "recall": 0.4, "recall_std": 0.0,
                            "answer_rate": 0.5, "latency_ms_median": 30}}}
    merged = merge_matrices([m1, m2])
    cell = merged["a"]["factual"]
    assert cell["n"] == 4
    assert cell["accuracy"] == 0.5
    assert cell["recall"] == 0.6
    # between-run variance shows up in the pooled std
    assert cell["accuracy_std"] == 0.5
