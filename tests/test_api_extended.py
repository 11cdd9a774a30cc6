"""Extended API surface: batch query, namespaces (org-docs), curator,
integrity, nightly endpoints."""
import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def ctx():
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    ctx.store.add_chunks(toy_corpus(ctx.engine.lexicon))
    return ctx


def test_extended_api(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # batch query
            r = await client.post("/api/query_batch", json={"queries": [
                {"query": "timely filing deadline", "payer": "sunshine_health"},
                {"query": "molina eligibility verification"},
            ], "k": 3})
            body = await r.json()
            assert len(body["results"]) == 2
            assert body["results"][0]["hits"][0]["doc_id"] == "sunshine_provider_manual"
            r = await client.post("/api/query_batch", json={"queries": []})
            assert r.status == 400

            # namespaces
            r = await client.post("/admin/org-docs", json={"name": "org-a"})
            assert r.status == 200
            r = await client.post("/admin/org-docs", json={"name": "org-a"})
            assert r.status == 409
            r = await client.post("/admin/org-docs", json={"name": "BAD NAME!"})
            assert r.status == 400
            r = await client.post("/admin/org-docs/org-a/chunks", json={
                "chunks": [{"doc_id": "d1", "text": "org A private policy "
                                                    "about telehealth coverage"}]})
            assert (await r.json())["added"] == 1
            r = await client.post("/admin/org-docs/org-a/query",
                                  json={"query": "telehealth coverage"})
            hits = (await r.json())["results"]
            assert hits and hits[0]["doc_id"] == "d1"
            # isolation: main index unaffected, other org empty
            r = await client.post("/admin/org-docs", json={"name": "org-b"})
            r = await client.post("/admin/org-docs/org-b/query",
                                  json={"query": "telehealth coverage"})
            assert (await r.json())["results"] == []
            r = await client.get("/admin/org-docs")
            names = {n["name"] for n in (await r.json())["namespaces"]}
            assert names == {"org-a", "org-b"}

            # curator
            r = await client.post("/api/curator/sources", json={
                "url": "https://www.sunshinehealth.com/providers/manual.pdf"})
            src = await r.json()
            assert src["payer"] == "sunshine_health"
            r = await client.post("/api/curator/curate", json={
                "url": src["url"], "approve": True})
            assert (await r.json())["status"] == "curated"
            r = await client.get("/api/curator/stats")
            assert (await r.json())["by_status"]["curated"] == 1

            # integrity
            r = await client.get("/admin/integrity")
            rep = await r.json()
            assert rep["ok"] and rep["counts"]["host_records"] == rep["counts"]["device_valid"]

            # nightly
            r = await client.post("/admin/nightly/run", json={})
            assert r.status == 200
            run_id = (await r.json())["run_id"]
            for _ in range(600):
                r = await client.get("/admin/nightly/status")
                st = await r.json()
                if not st["running"]:
                    break
                await asyncio.sleep(0.2)
            assert st["run_id"] == run_id
            assert st["steps"]["final_eval"]["status"] == "done"
        finally:
            await client.close()

    _run(scenario())


def test_integrity_detects_and_remediates(ctx):
    from mobius_rag_tpu.integrity import integrity_remediate, integrity_report

    # manufacture drift: kill a host record while its device row stays live
    row = next(i for i, r in enumerate(ctx.store.records) if r is not None)
    saved = ctx.store.records[row]
    ctx.store.records[row] = None
    rep = integrity_report(ctx)
    assert not rep["ok"] and row in rep["device_live_host_dead"]

    out = integrity_remediate(ctx)
    assert out["after"]["ok"], out["after"]
    ctx.store.records.append(saved)  # restore-ish for other tests (new row)


def test_worker_liveness_freeze_503(ctx):
    """Worker-fleet liveness (worker_server_chunking.py:8-35 parity): a
    frozen worker's stale tick flips /health/deep and /admin/workers to
    503; deregistering (clean shutdown) restores 200."""
    import time

    queue = ctx.pipeline.queue

    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # live worker → healthy
            queue.worker_tick("w-chunk-1", "chunking")
            r = await client.get("/health/deep")
            body = await r.json()
            assert body["checks"]["workers"]["ok"] is True
            assert "w-chunk-1" in body["checks"]["workers"]["fleet"]

            # freeze: backdate the tick past the 120 s staleness bar
            with queue._lock:
                queue.conn.execute(
                    "UPDATE worker_ticks SET last_tick=? WHERE worker_id=?",
                    (time.time() - 300.0, "w-chunk-1"))
                queue.conn.commit()
            r = await client.get("/health/deep")
            assert r.status == 503
            body = await r.json()
            assert body["checks"]["workers"]["fleet"]["w-chunk-1"]["stale"]
            r = await client.get("/admin/workers")
            assert r.status == 503

            # worker silent past expiry = decommissioned, not stale
            with queue._lock:
                queue.conn.execute(
                    "UPDATE worker_ticks SET last_tick=? WHERE worker_id=?",
                    (time.time() - 7200.0, "w-chunk-1"))
                queue.conn.commit()
            r = await client.get("/admin/workers")
            assert r.status == 200

            # clean shutdown deregisters
            queue.worker_tick("w-embed-1", "embedding")
            queue.deregister_worker("w-embed-1")
            r = await client.get("/admin/workers")
            body = await r.json()
            assert "w-embed-1" not in body["workers"]
        finally:
            await client.close()

    _run(scenario())
