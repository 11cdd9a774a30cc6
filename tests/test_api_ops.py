"""Operator-API breadth (api/ops.py): routing observability + grading,
eval depth, document lifecycle controls, admin hygiene sweeps, drive
router, HTML imports, config registry depth, policy lines/candidates."""
import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.drive import InMemoryDrive
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def ctx():
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    ctx.store.add_chunks(toy_corpus(ctx.engine.lexicon))
    return ctx


def test_routing_and_grading(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # decisions are persisted by the AGENT path (engine.search
            # records search_events only, not query_decisions)
            r = await client.post("/api/skills/v1/corpus_search_agent", json={
                "query": "timely filing deadline", "payer": "sunshine_health"})
            assert r.status == 200
            agent_id = (await r.json())["agent_id"]
            ctx.telemetry.flush()

            r = await client.get("/routing/decisions")
            decisions = (await r.json())["decisions"]
            assert any(d["agent_id"] == agent_id for d in decisions)
            assert "grade" in decisions[0]

            r = await client.get(f"/routing/decisions/{agent_id}")
            body = await r.json()
            assert body["agent_id"] == agent_id and "trace" in body

            r = await client.get("/routing/stats")
            assert "strategies" in await r.json()

            # grade it, read the grade back
            r = await client.patch(f"/observe/decisions/{agent_id}/grade",
                                   json={"grade": "good", "notes": "solid"})
            assert (await r.json())["ok"] is True
            r = await client.get(f"/routing/decisions/{agent_id}")
            assert (await r.json())["grade"] == "good"
            r = await client.patch("/observe/decisions/nope/grade",
                                   json={"grade": "bad"})
            assert r.status == 404
            r = await client.patch(f"/observe/decisions/{agent_id}/grade",
                                   json={"grade": "excellent"})
            assert r.status == 400
        finally:
            await client.close()

    _run(scenario())


def test_eval_depth(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/api/eval/active")
            assert (await r.json())["active"] is None
            r = await client.post("/api/eval/run", json={"bank": "toy"})
            run_id = (await r.json())["run_id"]
            r = await client.get("/api/eval/active")
            assert (await r.json())["active"] is None  # cleared after run

            r = await client.get(f"/api/eval/runs/{run_id}/progress")
            prog = await r.json()
            assert prog["finalized"] is True and prog["results"] > 0

            r = await client.get("/api/eval/drift?bank=toy")
            drift = await r.json()
            assert drift["runs"] and drift["runs"][0]["accuracy"] is not None

            qid = (await (await client.get(
                f"/api/eval/runs/{run_id}")).json())["results"][0]["query_id"]
            r = await client.get(f"/api/eval/results/{run_id}/{qid}")
            assert (await r.json())["query_id"] == qid

            r = await client.post("/api/eval/fact_compare", json={
                "answer_a": "Timely filing is 180 days for participating "
                            "providers.",
                "answer_b": "Timely filing is 90 days.",
                "must_facts": ["180 day timely filing limit"],
            })
            cmp_ = await r.json()
            assert cmp_["winner"] == "a"
        finally:
            await client.close()

    _run(scenario())


def test_document_lifecycle(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # upload a real doc so blob + queue machinery exist
            r = await client.post(
                "/upload?filename=ops_lifecycle_test.txt&payer=sunshine_health",
                data=("policy text about prior authorization for "
                      "behavioral health services " * 20).encode())
            doc_id = (await r.json())["doc_id"]

            r = await client.get(f"/documents/{doc_id}/detail")
            detail = await r.json()
            assert detail["has_blob"] and detail["chunks"] > 0

            r = await client.get(f"/documents/{doc_id}/publish-status")
            ps = await r.json()
            assert ps["published"] is True

            r = await client.get(f"/api/uploads/{doc_id}/progress")
            assert (await r.json())["published_chunks"] > 0

            r = await client.post(f"/documents/{doc_id}/retag")
            assert (await r.json())["retagged"] > 0

            r = await client.post(f"/documents/{doc_id}/embedding/start")
            assert (await r.json())["re_embedded"] > 0

            r = await client.post(f"/documents/{doc_id}/publish")
            assert (await r.json())["published"] > 0

            # metadata patch canonicalizes + republishes
            r = await client.patch(f"/documents/{doc_id}",
                                   json={"payer": "Molina Healthcare"})
            body = await r.json()
            assert body["updated"]["payer"] == "molina"
            r = await client.get(f"/documents/{doc_id}/detail")
            assert (await r.json())["payer"] == "molina"

            # chunking start → a queued job exists → stop kills it
            r = await client.post(f"/documents/{doc_id}/chunking/start")
            assert "job_id" in await r.json()
            r = await client.post(f"/documents/{doc_id}/chunking/stop")
            assert (await r.json())["stopped"] >= 1
            r = await client.post(f"/documents/{doc_id}/chunking/kill-and-reset")
            assert "job_id" in await r.json()
            # drain the re-enqueued job so later tests see a clean queue
            ctx.pipeline.drain()

            r = await client.get("/documents/nope/detail")
            assert r.status == 404

            # bulk retag runs to completion and reports via BOTH aliases
            r = await client.post("/documents/retag")
            assert (await r.json())["started"] is True
            for _ in range(100):
                st = await (await client.get("/documents/retag/status")).json()
                if st["status"] in ("done", "stopped"):
                    break
                await asyncio.sleep(0.1)
            assert st["status"] == "done" and st["done"] == st["total"] > 0
            st2 = await (await client.get("/admin/retag-in-place/status")).json()
            assert st2["status"] == "done"
        finally:
            await client.close()

    _run(scenario())


def test_admin_hygiene(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/admin/repository_audit")
            audit = await r.json()
            assert audit["n"] > 0 and audit["total_chunks"] > 0
            assert all("tagged_fraction" in d for d in audit["documents"])

            # junk blocking: enqueue a chunking job with no blob behind it
            ctx.pipeline.queue.enqueue("chunking", {"doc_id": "ghost_doc"},
                                       dedupe_key="chunk-ghost")
            r = await client.post("/admin/block_junk_pending", json={})
            blocked = await r.json()
            assert any(b["doc_id"] == "ghost_doc" for b in blocked["blocked"])
            r = await client.get("/admin/list_blocked_docs")
            assert any(b["doc_id"] == "ghost_doc"
                       for b in (await r.json())["blocked"])

            r = await client.post("/admin/block_old_pending",
                                  json={"days": 9999})
            assert (await r.json())["n"] == 0

            # duplicate chunks within one doc get deduped + republished
            from mobius_rag_tpu.index.store import ChunkRecord

            dup = "Exact duplicate paragraph for the dedupe sweep."
            recs = [ChunkRecord(chunk_id=f"dupdoc-c{i}", doc_id="dupdoc",
                                text=dup, embedding=hash_embed([dup])[0])
                    for i in range(3)]
            ctx.store.publish_document("dupdoc", recs)
            r = await client.post("/admin/dedupe_policy_paragraphs")
            body = await r.json()
            assert body["by_doc"].get("dupdoc") == 2
            assert len(ctx.store.rows_for_document("dupdoc")) == 1

            r = await client.post("/admin/normalize-payer")
            assert "documents_changed" in await r.json()
            r = await client.post("/admin/backfill_chunk_tags")
            assert "chunks_backfilled" in await r.json()
            r = await client.post("/admin/reset_bloated_docs",
                                  json={"max_chunks": 100000})
            assert (await r.json())["reset"] == []

            r = await client.get("/admin/vector_search?q=timely+filing&k=3")
            hits = (await r.json())["hits"]
            assert hits and all("similarity" in h for h in hits)

            # nightly history + stop surface
            r = await client.get("/admin/nightly/runs")
            assert "runs" in await r.json()
            r = await client.post("/admin/nightly/stop")
            assert (await r.json())["stopping"] is False
            r = await client.get("/admin/nightly/runs/nope")
            assert r.status == 404
        finally:
            await client.close()

    _run(scenario())


def test_drive_router_and_imports(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/drive/status")
            assert (await r.json())["connected"] is False
            r = await client.post("/drive/scan-folder",
                                  json={"folder_id": "f"})
            assert r.status == 503

            ctx.extra_state["drive_client"] = InMemoryDrive({
                "payer-folder": [
                    ("FL_Sunshine_Provider_Manual.txt",
                     b"Sunshine Health timely filing manual content " * 10),
                    ("random_photo.jpg", b"not a manual"),
                ]})
            r = await client.get("/drive/status")
            body = await r.json()
            assert body["connected"] and body["client"] == "InMemoryDrive"

            r = await client.get("/drive/folders/payer-folder/files")
            assert len((await r.json())["files"]) == 2

            r = await client.post("/drive/scan-folder",
                                  json={"folder_id": "payer-folder"})
            scan = (await r.json())["files"]
            manual = next(f for f in scan if "Manual" in f["name"])
            assert manual["payer"] == "sunshine_health"
            assert manual["looks_like_manual"] is True

            r = await client.post("/drive/import-folder",
                                  json={"folder_id": "payer-folder"})
            imp = await r.json()
            assert imp["scanned"] == 2 and len(imp["imported"]) == 1
            r = await client.get("/drive/status")
            assert (await r.json())["last_import"]["scanned"] == 2

            r = await client.delete("/drive/disconnect")
            assert r.status == 200
            assert ctx.extra_state.get("drive_client") is None

            # HTML + scraped-page imports ride the normal ingest path
            html = ("<html><body><h1>Aetna GA prior auth</h1><p>" +
                    "Authorization rules for H2019 services. " * 15 +
                    "</p></body></html>")
            r = await client.post("/documents/import-from-html", json={
                "html": html, "filename": "aetna_ga_pa",
                "payer": "aetna", "state": "GA"})
            body = await r.json()
            assert body["doc_id"] and not body["deduped"]

            r = await client.post("/documents/import-scraped-pages", json={
                "pages": [{"url": "https://www.sunshinehealth.com/manual/page1",
                           "html": "<p>" + "Claims dispute window details. "
                           * 12 + "</p>"}]})
            out = (await r.json())["imported"]
            assert out[0]["doc_id"]
        finally:
            await client.close()

    _run(scenario())


def test_config_depth(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/config/llm/providers")
            assert "offline" in (await r.json())["builtin"]

            r = await client.put("/config/llm/prod-v1", json={
                "provider": "http", "model": "big-model",
                "params": {"url": "http://llm.internal/generate"},
                "secrets": {"api_key": "sekrit"}})
            body = await r.json()
            assert body["name"] == "prod-v1"
            assert "sekrit" not in str(body)  # redacted

            r = await client.get("/config/llm/prod-v1")
            assert (await r.json())["provider"] == "http"
            r = await client.get("/config/llm/nope")
            assert r.status == 404

            # offline provider test ping succeeds without a network
            await client.put("/config/llm/off", json={"provider": "offline"})
            r = await client.post("/config/llm/off/test")
            assert (await r.json())["ok"] is True

            # prompt version CRUD
            r = await client.put("/config/prompts/synthesis/v2",
                                 json={"text": "Synthesize tersely."})
            sha = (await r.json())["sha"]
            r = await client.get("/config/prompts/synthesis/v2")
            got = await r.json()
            assert got["text"] == "Synthesize tersely." and got["sha"] == sha
            r = await client.post("/config/prompts/names")
            assert "synthesis" in (await r.json())["names"]
            r = await client.delete("/config/prompts/synthesis/v2")
            assert (await r.json())["deleted"] is True
            r = await client.get("/config/prompts/synthesis/v2")
            assert r.status == 404
        finally:
            await client.close()

    _run(scenario())


def test_policy_depth(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/policy/lines?limit=20")
            lines = await r.json()
            assert lines["total"] > 0 and lines["lines"][0]["tags"] is not None
            some_doc = lines["lines"][0]["doc_id"]

            r = await client.get(f"/documents/{some_doc}/policy/lines")
            assert (await r.json())["lines"]
            r = await client.get(f"/documents/{some_doc}/policy-line-tags")
            assert "tag_counts" in await r.json()

            # candidates: record a couple, aggregate, review one
            ctx.candidates.record(
                [{"phrase": "concurrent review cadence", "count": 3}], "docA")
            ctx.candidates.record(
                [{"phrase": "concurrent review cadence", "count": 2}], "docB")
            r = await client.get("/policy/candidates/aggregate")
            agg = (await r.json())["candidates"]
            mine = next(c for c in agg if c["phrase"] == "concurrent review cadence")
            assert mine["n_docs"] == 2 and mine["occurrences"] == 5

            r = await client.get("/documents/docA/policy/candidates")
            assert any(c["phrase"] == "concurrent review cadence"
                       for c in (await r.json())["candidates"])

            r = await client.post(
                "/policy/candidates/concurrent%20review%20cadence/review",
                json={"approve": False})
            assert (await r.json())["status"] == "rejected"

            r = await client.post("/policy/candidates/aggregate/review-bulk",
                                  json={"phrases": ["concurrent review cadence"],
                                        "approve": True})
            assert (await r.json())["reviewed"][0]["status"] == "approved"

            # lexicon entry tuning
            ent = ctx.engine.lexicon.entries[0]
            r = await client.patch(
                f"/policy/lexicon/tags/{ent.kind}/{ent.code}",
                json={"selectivity": 0.42})
            assert (await r.json())["selectivity"] == 0.42
            assert ent.selectivity == 0.42
            r = await client.get(
                f"/policy/lexicon/tag-details?kind={ent.kind}&code={ent.code}")
            det = await r.json()
            assert det["selectivity"] == 0.42 and "chunks" in det
            r = await client.patch(f"/policy/lexicon/tags/{ent.kind}/nope",
                                   json={"selectivity": 0.5})
            assert r.status == 404
        finally:
            await client.close()

    _run(scenario())
