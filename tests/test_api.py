"""API surface tests (FastAPI TestClient parity — SURVEY §4 tier 3):
endpoint smoke over a real in-process app with the hash provider."""
import asyncio
import json

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
def ctx(tmp_path_factory):
    import mobius_rag_tpu.config as cfgmod

    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    return ctx


def test_api_end_to_end(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # health
            r = await client.get("/health")
            assert r.status == 200 and (await r.json())["status"] == "ok"

            # upload (instant)
            r = await client.post(
                "/upload?filename=sunshine_manual.txt&payer=Sunshine%20Health"
                "&state=FL&authority_level=4&instant=1", data=_MANUAL)
            body = await r.json()
            assert r.status == 200, body
            doc_id = body["doc_id"]
            assert not body["deduped"] and body["instant"]

            # documents
            r = await client.get("/documents")
            docs = (await r.json())["documents"]
            assert any(d["doc_id"] == doc_id and d["chunks"] >= 2 for d in docs)

            r = await client.get(f"/documents/{doc_id}")
            assert r.status == 200
            assert len((await r.json())["chunks"]) >= 2

            # direct query
            r = await client.post("/api/query", json={
                "query": "timely filing deadline", "payer": "sunshine_health"})
            body = await r.json()
            assert body["results"] and "180 days" in body["results"][0]["text"]

            # agent skill
            r = await client.post("/api/skills/v1/corpus_search_agent", json={
                "query": "Does Sunshine Health require prior authorization for H0019?"})
            body = await r.json()
            assert not body["refused"]
            assert body["strategy_chain"]
            agent_id = body["agent_id"]

            # decision trace persisted
            r = await client.get(f"/api/decisions/{agent_id}/trace")
            assert r.status == 200
            trace = await r.json()
            assert trace["decision"]["strategy"] in "abcds"

            # search events recorded
            ctx.telemetry.flush()
            r = await client.get("/api/search_events")
            assert (await r.json())["events"]

            # pipeline health
            r = await client.get("/pipeline_health")
            body = await r.json()
            assert body["index"]["chunks"] >= 2

            # lexicon admin: add an entry, retag, then it matches
            r = await client.post("/api/lexicon/entries", json={
                "kind": "d", "code": "claims.participating",
                "phrases": ["participating providers"]})
            assert r.status == 200
            r = await client.post("/admin/retag", json={})
            assert (await r.json())["retagged_chunks"] >= 2

            # eval run through the API
            r = await client.post("/api/eval/run", json={"bank": "toy"})
            body = await r.json()
            assert body["aggregates"]["n"] == 5
            r = await client.get(f"/api/eval/runs/{body['run_id']}")
            assert len((await r.json())["results"]) == 5

            # config registries
            r = await client.post("/config/prompts", json={
                "stage": "synthesis", "version": "v1", "text": "Synthesize {q}"})
            sha = (await r.json())["sha"]
            assert sha
            r = await client.post("/config/llm", json={
                "name": "default", "provider": "offline",
                "secrets": {"api_key": "sekrit"}})
            r = await client.get("/config/llm")
            cfgs = (await r.json())["configs"]
            assert cfgs[0]["secrets"]["api_key"] == "***"  # redaction

            # delete document → gone from index
            r = await client.delete(f"/documents/{doc_id}")
            assert (await r.json())["deleted_chunks"] >= 2
            r = await client.post("/api/query", json={
                "query": "timely filing deadline", "payer": "sunshine_health"})
            assert not (await r.json())["results"]

            # error paths
            r = await client.post("/api/query", json={})
            assert r.status == 400
            r = await client.post("/api/query", json={"query": "x", "mode": "bogus"})
            assert r.status == 400
            r = await client.get("/documents/nope")
            assert r.status == 404
        finally:
            await client.close()

    _run(scenario())


def test_admin_auth(ctx, monkeypatch):
    monkeypatch.setenv("MRAG_ADMIN_KEY", "s3cret")

    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.post("/admin/cleanup-stale-jobs", json={})
            assert r.status == 401
            r = await client.post("/admin/cleanup-stale-jobs", json={},
                                  headers={"X-Admin-Key": "s3cret"})
            assert r.status == 200
            # non-admin endpoints stay open
            r = await client.get("/health")
            assert r.status == 200
        finally:
            await client.close()

    _run(scenario())
