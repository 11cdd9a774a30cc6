"""Nightly orchestrator, curator, eval-matrix analyzer tests."""
import time

import pytest

from mobius_rag_tpu.api.server import AppContext
from mobius_rag_tpu.curator import Curator, classify_url
from mobius_rag_tpu.eval_harness.db import EvalDB
from mobius_rag_tpu.eval_harness.matrix import (analyze_matrix, run_gate_on_bank,
                                                run_matrix, time_queries)
from mobius_rag_tpu.nightly import NightlyOrchestrator
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    ctx.store.add_chunks(toy_corpus(ctx.engine.lexicon))
    return ctx


def test_nightly_full_run(ctx, tmp_path):
    orch = NightlyOrchestrator(ctx, bank="toy",
                               snapshot_path=str(tmp_path / "snap"))
    run_id = orch.start()
    orch.wait(timeout_s=300)
    st = orch.status()
    assert not st["running"]
    statuses = {s: v["status"] for s, v in st["steps"].items()}
    assert statuses["baseline_eval"] == "done"
    assert statuses["retag"] == "done"
    assert statuses["freeze"] == "done"
    assert statuses["final_eval"] == "done"
    assert statuses["lift"] == "done"
    lift = st["steps"]["lift"]["detail"]
    assert set(lift) == {"accuracy", "mean_chunk_recall", "answer_rate"}
    # retag + freeze actually happened
    assert st["steps"]["retag"]["detail"]["retagged"] >= ctx.store.size
    assert st["steps"]["freeze"]["detail"]["chunks"] == ctx.store.size
    # double-start guard after completion works (new run allowed)
    run2 = orch.start()
    assert run2 != run_id
    orch.wait(timeout_s=300)


def test_nightly_rejects_concurrent_start(ctx, tmp_path):
    orch = NightlyOrchestrator(ctx, bank="toy",
                               snapshot_path=str(tmp_path / "snap2"))
    orch.start()
    with pytest.raises(RuntimeError, match="in progress"):
        orch.start()
    orch.wait(timeout_s=300)


def test_classify_url():
    c = classify_url("https://www.sunshinehealth.com/providers/provider-manual.pdf")
    assert c["payer"] == "sunshine_health" and c["authority_level"] == 3
    assert c["looks_like_manual"] and c["kind"] == "manual"
    c = classify_url("https://ahca.myflorida.com/medicaid/policy")
    assert c["authority_level"] == 4
    c = classify_url("https://randomblog.example.com/post")
    assert c["authority_level"] == 1 and c["kind"] == "unknown"


def test_curator_lifecycle(tmp_path):
    cur = Curator(str(tmp_path / "c.sqlite"))
    s = cur.upsert("https://www.sunshinehealth.com/providers/provider-manual.pdf")
    assert s.status == "discovered" and s.payer == "sunshine_health"
    cur.bulk_upsert(["https://aetnabetterhealth.com/florida/providers/manual",
                     "https://example.com/blog"])
    assert cur.stats()["by_status"]["discovered"] == 3
    cur.curate(s.url, approve=True, notes="official manual")
    cur.mark_ingested(s.url, "sunshine_manual")
    got = cur.search(payer="sunshine_health")[0]
    assert got.status == "ingested" and got.meta["doc_id"] == "sunshine_manual"
    assert cur.probe(s.url)["probed"] is False  # offline hook
    # upsert same url is an update, not a duplicate
    cur.upsert(s.url, title="Sunshine Provider Manual")
    assert cur.stats()["by_status"].get("discovered", 0) == 2


def test_run_matrix_and_analyze(ctx, tmp_path):
    db = EvalDB(str(tmp_path / "eval.sqlite"))
    matrix = run_matrix(ctx.agent, "toy", strategies=("a", "b"), repeats=2, db=db)
    assert len(matrix["cells"]["a"]) == 2
    analysis = analyze_matrix(matrix)
    assert 0.0 <= analysis["oracle_recall"] <= 1.0
    assert set(analysis["arm_stats"]) == {"a", "b"}
    assert sum(analysis["winner_distribution"].values()) == len(analysis["winners"])
    # oracle >= each arm's mean
    for s in ("a", "b"):
        assert analysis["oracle_recall"] >= analysis["arm_stats"][s]["mean_recall"] - 1e-9


def test_time_queries(ctx):
    t = time_queries(ctx.agent, "toy", k=5)
    assert len(t["per_query"]) == 5
    assert t["wall_ms_median"] > 0
    assert t["device_ms_median"] >= 0


def test_run_gate_on_bank(ctx):
    out = run_gate_on_bank(ctx.agent, "toy")
    assert len(out["per_query"]) == 5
    # toy005 carries expected_contour OUT_OF_SCOPE
    scored = [r for r in out["per_query"] if r["expected"]]
    assert scored and out["match_rate"] == 1.0
