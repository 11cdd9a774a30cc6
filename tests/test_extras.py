"""PDF export, drive import, lexicon-candidate curation, eval
timeline/compare, admin SQL console."""
import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.candidates import CandidateStore
from mobius_rag_tpu.drive import InMemoryDrive, classify_file, import_folder
from mobius_rag_tpu.export_pdf import markdown_to_pdf
from mobius_rag_tpu.testing import hash_embed, sample_lexicon


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


_MANUAL = (b"SUNSHINE HEALTH PROVIDER MANUAL\n\nTIMELY FILING\n"
           b"Claims within 180 days. Disputes use form CMS-1500 routinely; "
           b"submit CMS-1500 forms via the provider portal promptly.\n\n"
           b"PRIOR AUTH\nH0019 requires prior authorization.")


def test_markdown_to_pdf_structure():
    pdf = markdown_to_pdf("# Title\n\nBody paragraph with words.\n\n- item one\n- item two")
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"/Type /Page" in pdf and b"Helvetica" in pdf
    # long docs paginate
    long_pdf = markdown_to_pdf("\n\n".join(f"paragraph {i} " * 10 for i in range(200)))
    assert long_pdf.count(b"/Type /Page ") >= 2


def test_classify_file_and_import(tmp_path):
    cls = classify_file("FL_SunshineHealth_Provider_Manual.txt")
    assert cls["payer"] == "sunshine_health" and cls["state"] == "FL"
    assert cls["looks_like_manual"]

    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.ingest.pipeline import IngestPipeline
    from mobius_rag_tpu.ingest.queue import JobQueue

    lex = sample_lexicon()
    store = ChunkStore()
    pipe = IngestPipeline(store, lex, hash_embed,
                          queue=JobQueue(str(tmp_path / "q.sqlite")))
    drive = InMemoryDrive({"folder1": [
        ("FL_Sunshine_provider_manual.txt", _MANUAL),
        ("random_notes.txt", b"unrelated scratch notes"),
    ]})
    out = import_folder(pipe, drive, "folder1")
    assert out.scanned == 2
    assert len(out.imported) == 1
    assert out.skipped[0]["reason"] == "not manual-like"
    # dedupe on re-import
    out2 = import_folder(pipe, drive, "folder1")
    assert out2.skipped and any(s["reason"] == "duplicate" for s in out2.skipped)


def test_candidate_store_lifecycle(tmp_path):
    cs = CandidateStore(str(tmp_path / "c.sqlite"))
    cs.record([{"phrase": "corrected claim", "kind_hint": "ngram", "count": 2}],
              doc_id="d1")
    cs.record([{"phrase": "corrected claim", "count": 1},
               {"phrase": "edi", "kind_hint": "abbreviation"}], doc_id="d2")
    pending = cs.pending(min_occurrences=2)
    assert pending and pending[0]["phrase"] == "corrected claim"
    assert set(pending[0]["docs"]) == {"d1", "d2"}

    lex = sample_lexicon()
    out = cs.review("corrected claim", approve=True, lexicon=lex, kind="d")
    assert out["promoted_code"].startswith("d:curated.")
    assert lex.expand("submit a corrected claim").matched_codes
    assert cs.review("edi", approve=False)["status"] == "rejected"
    assert cs.review("never seen", approve=False)["found"] is False


def test_extras_api(tmp_path):
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())

    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.post(
                "/upload?filename=sunshine_manual.txt&payer=sunshine&instant=1",
                data=_MANUAL)
            doc_id = (await r.json())["doc_id"]

            # pdf + original file downloads
            r = await client.get(f"/documents/{doc_id}/pdf")
            assert r.status == 200
            body = await r.read()
            assert body.startswith(b"%PDF-1.4")
            r = await client.get(f"/documents/{doc_id}/file")
            assert (await r.read()) == _MANUAL

            # candidates were mined during chunking (CMS-1500 repeats)
            r = await client.get("/api/lexicon/candidates?min_occurrences=1")
            cands = (await r.json())["candidates"]
            assert cands, "Path B should have mined candidates"
            r = await client.post("/api/lexicon/candidates/review", json={
                "phrase": cands[0]["phrase"], "approve": True})
            assert (await r.json())["promoted_code"]

            # eval timeline + compare
            for _ in range(2):
                r = await client.post("/api/eval/run", json={"bank": "toy"})
            r = await client.get("/api/eval/timeline")
            tl = (await r.json())["timeline"]
            assert len(tl) >= 2 and tl[-1]["drift"] is not None
            a, b = tl[-2]["run_id"], tl[-1]["run_id"]
            r = await client.get(f"/api/eval/compare?run_a={a}&run_b={b}")
            cmp_ = await r.json()
            assert len(cmp_["diffs"]) == 5

            # admin sql console: read-only works, writes blocked
            ctx.telemetry.flush()
            r = await client.post("/admin/sql", json={
                "db": "telemetry",
                "sql": "SELECT COUNT(*) FROM search_events"})
            body = await r.json()
            assert r.status == 200 and body["rows"][0][0] >= 0
            r = await client.post("/admin/sql", json={
                "db": "telemetry", "sql": "DELETE FROM search_events"})
            assert r.status == 400
            assert "sql error" in (await r.json())["error"]

            # drive import without a client → 501 gated
            r = await client.post("/admin/drive/import",
                                  json={"folder_id": "x"})
            assert r.status == 501
        finally:
            await client.close()

    _run(scenario())
