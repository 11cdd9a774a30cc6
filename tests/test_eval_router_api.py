"""Eval-router surface parity (routers/eval.py): PR curve, grade rollup,
human-verdict patch, prod rollup, bank editor."""
import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.testing import hash_embed, sample_lexicon

_MANUAL = (b"SUNSHINE HEALTH MANUAL\n\nTIMELY FILING\n"
           b"Participating providers must submit claims within 180 days.\n\n"
           b"PRIOR AUTHORIZATION\nH0019 requires prior authorization.")


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def ctx():
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    return ctx


def test_eval_router_surface(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.post(
                "/upload?filename=sunshine_manual.txt&payer=Sunshine%20Health"
                "&state=FL&authority_level=4&instant=1", data=_MANUAL)
            assert r.status == 200

            # run an eval so there's a run to analyze
            r = await client.post("/api/eval/run", json={"bank": "toy"})
            body = await r.json()
            assert r.status == 200, body
            run_id = body["run_id"]

            # PR curve
            r = await client.get(f"/api/eval/runs/{run_id}/pr_curve")
            pr = await r.json()
            assert r.status == 200, pr
            assert pr["curves"]
            for pts in pr["curves"].values():
                assert pts[0]["tau"] == 0.0 and pts[-1]["tau"] == 1.0
                # recall is monotone non-increasing in tau
                recalls = [p["recall"] for p in pts]
                assert all(a >= b for a, b in zip(recalls, recalls[1:]))

            # grade rollup
            r = await client.get(f"/api/eval/runs/{run_id}/grade_rollup")
            roll = await r.json()
            assert r.status == 200 and roll["sigma_noise"] == 0.2
            assert all("retrieval_mean" in s for s in roll["strategies"].values())

            # human verdict patch + effective verdict
            r = await client.get(f"/api/eval/runs/{run_id}")
            qid = (await r.json())["results"][0]["query_id"]
            r = await client.patch(
                f"/api/eval/results/{run_id}/{qid}/verdict",
                json={"verdict": "correct", "reasoning": "human check",
                      "by": "qa"})
            patched = await r.json()
            assert r.status == 200 and patched["effective_verdict"] == "correct"
            r = await client.patch(
                f"/api/eval/results/{run_id}/{qid}/verdict",
                json={"verdict": None})
            cleared = await r.json()
            assert cleared["effective_verdict"] == cleared["judge_verdict"]
            r = await client.patch(
                f"/api/eval/results/{run_id}/{qid}/verdict",
                json={"verdict": "bogus"})
            assert r.status == 400

            # prod rollup over the decisions the eval run just produced
            r = await client.get("/api/observe/prod_rollup?window_hours=1")
            roll = await r.json()
            assert r.status == 200 and roll["strategies"]

            # bank editor: write, read back, backup on overwrite
            bank = {"rel_path": "custom.yaml", "bank_version": "t1",
                    "queries": [{"id": "q1", "query": "what is timely filing",
                                 "must_facts": ["180 days"]}]}
            r = await client.put("/api/eval/bank", json=bank)
            assert r.status == 200, await r.json()
            r = await client.get("/api/eval/bank?path=custom.yaml")
            got = await r.json()
            assert got["n_queries"] == 1 and got["queries"][0]["id"] == "q1"
            bank["queries"].append({"id": "q2", "query": "appeals window"})
            r = await client.put("/api/eval/bank", json=bank)
            assert r.status == 200
            # invalid payloads rejected
            r = await client.put("/api/eval/bank", json={
                "queries": [{"id": "q1", "query": "x"}, {"id": "q1", "query": "y"}]})
            assert r.status == 400
            # path escape rejected
            r = await client.put("/api/eval/bank", json={
                "rel_path": "../../etc/passwd", "queries": [{"id": "a", "query": "b"}]})
            assert r.status == 403
        finally:
            await client.close()

    _run(scenario())
