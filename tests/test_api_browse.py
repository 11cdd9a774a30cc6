"""Extended operator-API tests: DB browser, vacuum, per-document job
control, facts CRUD, policy/lexicon browse, manual text-tags, candidate
bulk review, errors ops (reference app/main.py browse surface)."""
import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.index.store import ChunkRecord
from mobius_rag_tpu.ingest.featurize import featurize_chunk
from mobius_rag_tpu.testing import hash_embed, sample_lexicon

_DOC = (b"SUNSHINE HEALTH MANUAL\n\nTIMELY FILING\n"
        b"Participating providers must submit claims within 180 days.\n\n"
        b"PRIOR AUTHORIZATION\nH0019 requires prior authorization for "
        b"residential treatment.")


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def ctx():
    return AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())


def _fact_record(doc_id: str, i: int, text: str, lexicon) -> ChunkRecord:
    rec = ChunkRecord(
        chunk_id=f"{doc_id}-f{i}", doc_id=doc_id, source_id=f"{doc_id}-f{i}",
        text=text, embedding=hash_embed([text])[0].astype(np.float32),
        filename=f"{doc_id}.txt",
        extra={"kind": "fact", "critique_score": 0.9},
    )
    return featurize_chunk(rec, lexicon)


def test_browse_surface_end_to_end(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            # ---- version / deep health / recent queries -------------------
            r = await client.get("/version")
            assert r.status == 200
            assert (await r.json())["version"]

            r = await client.get("/health/deep")
            body = await r.json()
            assert r.status == 200 and body["status"] == "ok"
            assert body["checks"]["device"]["ok"]
            assert body["checks"]["queue"]["ok"]

            # ---- upload + per-document job control -------------------------
            r = await client.post(
                "/upload?filename=browse_manual.txt&payer=Sunshine%20Health"
                "&state=FL&instant=1", data=_DOC)
            doc_id = (await r.json())["doc_id"]

            r = await client.get(f"/documents/{doc_id}/status")
            body = await r.json()
            assert r.status == 200, body
            assert body["uploaded"] and body["published_chunks"] >= 2
            kinds = {j["kind"] for j in body["jobs"]}
            assert "chunking" in kinds and "embedding" in kinds

            r = await client.get(f"/documents/{doc_id}/chunking/events")
            events = (await r.json())["events"]
            assert any(e["stage"] == "enqueued" for e in events)

            # reset embeddings, then restart chunking with inline drain
            r = await client.post(f"/documents/{doc_id}/embedding/reset")
            assert (await r.json())["deleted_rows"] >= 2
            r = await client.get(f"/documents/{doc_id}/status")
            assert (await r.json())["published_chunks"] == 0

            r = await client.post(f"/documents/{doc_id}/chunking/restart",
                                  json={"drain": True})
            body = await r.json()
            assert body["chunking_job"] and body["drained"]
            r = await client.get(f"/documents/{doc_id}/status")
            assert (await r.json())["published_chunks"] >= 2

            # retry with nothing failed is a no-op
            r = await client.post(f"/documents/{doc_id}/retry")
            assert (await r.json())["retried_jobs"] == []

            # unknown doc 404s
            r = await client.get("/documents/not-a-doc/status")
            assert r.status == 404

            # ---- facts CRUD -------------------------------------------------
            fact_doc = "facts_doc"
            lex = ctx.engine.lexicon
            recs = [
                _fact_record(fact_doc, 0,
                             "Claims must be submitted within 180 days.", lex),
                _fact_record(fact_doc, 1,
                             "H0019 requires prior authorization.", lex),
            ]
            ctx.store.publish_document(fact_doc, recs)

            r = await client.get(f"/documents/{fact_doc}/facts")
            facts = (await r.json())["facts"]
            assert len(facts) == 2
            assert facts[0]["critique_score"] == 0.9

            # edit a fact → device row re-embedded and searchable
            fid = facts[0]["fact_id"]
            r = await client.put(
                f"/documents/{fact_doc}/facts/{fid}",
                json={"text": "Corrected: claims window is 365 days."})
            assert r.status == 200, await r.json()
            r = await client.post("/api/query", json={
                "query": "corrected claims window 365", "k": 3})
            texts = [x["text"] for x in (await r.json())["results"]]
            assert any("365 days" in t for t in texts)

            # delete the other fact
            r = await client.delete(f"/documents/{fact_doc}/facts/{fact_doc}-f1")
            assert r.status == 200
            r = await client.get(f"/documents/{fact_doc}/facts")
            assert len((await r.json())["facts"]) == 1

            r = await client.get("/facts")
            body = await r.json()
            assert body["total"] >= 1
            r = await client.get("/facts/sections")
            assert r.status == 200

            # ---- policy / lexicon browse ------------------------------------
            r = await client.get("/policy/lexicon/overview")
            body = await r.json()
            assert body["entries"] > 0 and body["by_kind"].get("j")

            r = await client.get("/policy/lexicon/stats")
            assert (await r.json())["selectivity"]["max"] <= 1.0

            r = await client.get("/policy/lexicon/doc-stats")
            body = await r.json()
            assert body["n_docs"] >= 1

            r = await client.get(
                "/policy/lexicon/tags/j/payor.sunshine_health")
            body = await r.json()
            assert r.status == 200, body
            assert body["doc_count"] >= 1 and body["phrases"]

            r = await client.get("/policy/lexicon/tags/j/no.such.code")
            assert r.status == 404

            r = await client.get(f"/documents/{doc_id}/policy/summary")
            body = await r.json()
            assert body["chunks"] >= 2 and body["tag_chunk_counts"]

            r = await client.get(f"/documents/{doc_id}/policy/paragraphs")
            paras = (await r.json())["paragraphs"]
            assert paras and "tags" in paras[0]

            # ---- manual text-tags --------------------------------------------
            r = await client.post(
                f"/documents/{fact_doc}/text-tags",
                json={"kind": "j", "code": "payor.molina"})
            assert r.status == 200, await r.json()
            r = await client.get(f"/documents/{fact_doc}/text-tags")
            assert "j:payor.molina" in (await r.json())["manual_tags"]
            r = await client.get("/policy/lexicon/tags/j/payor.molina")
            assert (await r.json())["doc_count"] >= 1

            r = await client.delete(
                f"/documents/{fact_doc}/text-tags/j:payor.molina")
            assert r.status == 200
            r = await client.get(f"/documents/{fact_doc}/text-tags")
            assert (await r.json())["manual_tags"] == []

            # ---- document browse extras ---------------------------------------
            r = await client.get("/documents/search?q=sunshine")
            body = await r.json()
            assert r.status == 200, body
            assert any(d["doc_id"] == doc_id for d in body["documents"])
            r = await client.get("/documents/search?q=prior%20authorization")
            assert any(d["matched"] == "text"
                       for d in (await r.json())["documents"])

            r = await client.get(f"/documents/{doc_id}/pages")
            body = await r.json()
            assert body["pages"] and "180 days" in body["pages"][0]["text"]

            r = await client.get(f"/documents/{doc_id}/download/markdown")
            assert r.status == 200
            assert "180 days" in (await r.text())

            # publish_unpublished: wipe the doc's rows, then sweep
            await client.post(f"/documents/{doc_id}/embedding/reset")
            r = await client.post("/admin/publish_unpublished",
                                  json={"drain": True})
            body = await r.json()
            assert any(e["doc_id"] == doc_id for e in body["enqueued"])
            r = await client.get(f"/documents/{doc_id}/status")
            assert (await r.json())["published_chunks"] >= 2

            # cleanup: huge TTL sweeps nothing; then age this doc's blob
            # explicitly (os.utime, 1h back) and sweep with a 30-min TTL —
            # deterministic regardless of how fast the test ran (a warm
            # jit cache once made the doc younger than a wall-clock TTL)
            r = await client.post("/admin/cleanup_expired_documents",
                                  json={"max_age_days": 3650})
            assert (await r.json())["removed"] == []
            import os as _os
            import time as _time
            blob_path = _os.path.join(ctx.pipeline.docs.root, doc_id + ".bin")
            old = _time.time() - 3600
            _os.utime(blob_path, (old, old))
            r = await client.post("/admin/cleanup_expired_documents",
                                  json={"max_age_days": 1 / 48})
            removed = (await r.json())["removed"]
            assert any(d["doc_id"] == doc_id for d in removed)
            r = await client.get(f"/documents/{doc_id}/status")
            assert (await r.json())["published_chunks"] == 0
            r = await client.post("/admin/cleanup_expired_documents", json={})
            assert r.status == 400

            # ---- metadata backfill --------------------------------------------
            # publish a doc with a non-canonical payer, then sweep
            raw = _fact_record("backfill_doc", 0, "Backfill probe text.",
                               ctx.engine.lexicon)
            raw.extra = {}
            raw.payer = "Sunshine  Health"  # non-canonical spacing/case
            ctx.store.publish_document("backfill_doc", [raw])
            ctx.pipeline.docs.put(__import__(
                "mobius_rag_tpu.ingest.worker", fromlist=["DocumentBlob"]
            ).DocumentBlob(doc_id="backfill_doc", filename="bf.txt",
                           data=b"x"))
            r = await client.post("/admin/backfill_metadata")
            body = await r.json()
            assert any(d["doc_id"] == "backfill_doc" and
                       d["payer"] == "sunshine_health"
                       for d in body["backfilled"]), body
            # idempotent: second sweep changes nothing
            r = await client.post("/admin/backfill_metadata")
            assert (await r.json())["backfilled"] == []

            # ---- blob store (fresh upload; TTL sweep removed the first) -------
            await client.post("/upload?filename=blob_probe.txt&instant=0",
                              data=b"blob store probe")
            r = await client.get("/admin/blobs")
            files = (await r.json())["files"]
            assert any(f["filename"] == "blob_probe.txt" and f["bytes"] > 0
                       for f in files)
            r = await client.get("/admin/blobs/check/blob_probe.txt")
            assert (await r.json())["exists"]
            r = await client.get("/admin/blobs/check/nope.txt")
            assert r.status == 404

            # ---- candidates bulk ---------------------------------------------
            ctx.candidates.record(
                [{"phrase": "step therapy protocol", "count": 3},
                 {"phrase": "junk phrase", "count": 2}], doc_id=doc_id)
            r = await client.get("/policy/candidates/catalog")
            pend = (await r.json())["pending"]
            assert any(c["phrase"] == "step therapy protocol" for c in pend)

            r = await client.post("/policy/candidates/review-bulk", json={
                "items": [{"phrase": "junk phrase", "approve": False}]})
            assert (await r.json())["reviewed"][0]["status"] == "rejected"

            r = await client.post(
                "/policy/candidates/aggregate/classify-bulk", json={
                    "items": [{"phrase": "step therapy protocol",
                               "kind": "p", "code": "process.step_therapy"}]})
            body = await r.json()
            assert body["classified"][0]["promoted_code"] == "p:process.step_therapy"
            assert ctx.engine.lexicon.entry_by_code("p:process.step_therapy")

            # ---- errors surface ----------------------------------------------
            ctx.telemetry.record_error(
                "chunking", RuntimeError("boom"), {"doc_id": doc_id})
            ctx.telemetry.flush()
            r = await client.get("/errors?unresolved=1")
            errs = (await r.json())["errors"]
            assert any(e["message"] == "boom" for e in errs)
            eid = next(e["error_id"] for e in errs if e["message"] == "boom")

            r = await client.get("/errors/stats")
            body = await r.json()
            assert body["unresolved"] >= 1 and "chunking" in body["by_service"]

            r = await client.post(f"/errors/{eid}/resolve")
            assert (await r.json())["resolved"]

            ctx.telemetry.record_error(
                "embedding", RuntimeError("doc scoped"), {"doc_id": doc_id})
            ctx.telemetry.flush()
            r = await client.get(f"/documents/{doc_id}/errors")
            assert (await r.json())["errors"]
            r = await client.post(f"/documents/{doc_id}/errors/resolve-all")
            assert (await r.json())["resolved"] >= 1

            # ---- DB browser ---------------------------------------------------
            r = await client.get("/admin/db/tables")
            tables = await r.json()
            assert "processing_errors" in tables["telemetry"]
            assert "jobs" in tables["jobs"]

            r = await client.get("/admin/db/telemetry/processing_errors/schema")
            cols = {c["name"] for c in (await r.json())["columns"]}
            assert {"error_id", "resolved"} <= cols

            r = await client.get(
                "/admin/db/telemetry/processing_errors/records?limit=10")
            body = await r.json()
            assert body["total"] >= 2 and body["rows"]
            rowid = body["rows"][0][0]

            r = await client.delete(
                f"/admin/db/telemetry/processing_errors/records/{rowid}")
            assert (await r.json())["deleted"] == 1

            # injection-shaped table names 404 cleanly
            r = await client.get(
                "/admin/db/telemetry/processing_errors;%20DROP/schema")
            assert r.status == 404

            # ---- vacuum -------------------------------------------------------
            r = await client.get("/admin/vacuum/status")
            assert (await r.json()) == {"ran": False}
            r = await client.post("/admin/vacuum")
            body = await r.json()
            assert "telemetry" in body["databases"]
            assert body["databases"]["telemetry"]["bytes_after"] > 0
            r = await client.get("/admin/vacuum/status")
            assert "databases" in (await r.json())
        finally:
            await client.close()

    _run(scenario())


def test_console_static_modules_exist():
    """The console shell's script tags must resolve to packaged files
    (modular JS views, round 3)."""
    import os
    import re

    api_dir = os.path.join(os.path.dirname(__file__), "..", "mobius_rag_tpu", "api")
    html = open(os.path.join(api_dir, "console.html")).read()
    srcs = re.findall(r'src="/static/([\w.]+)"', html)
    assert len(srcs) >= 5, srcs
    for s in srcs:
        path = os.path.join(api_dir, "static", s)
        assert os.path.exists(path), path
        # every referenced onclick handler must be defined somewhere
    all_js = "".join(open(os.path.join(api_dir, "static", s)).read() for s in srcs)
    defined = set(re.findall(r"(?:function|async function)\s+(\w+)", all_js))
    called = set(re.findall(r'onclick="(\w+)\(', all_js + html))
    assert called <= defined, called - defined
    # bracket balance with string/template/comment awareness — the
    # syntax-error class manual edits actually produce (no JS engine in
    # this image to do better)
    for s in srcs:
        _check_js_brackets(os.path.join(api_dir, "static", s))


def _check_js_brackets(path: str) -> None:
    src = open(path).read()
    stack: list[tuple[str, int]] = []   # (bracket-or-`, line)
    pairs = {")": "(", "]": "[", "}": "{"}
    line = 1
    i, n = 0, len(src)
    mode: list[str] = []  # nesting: "`" template; "${" template-expr
    prev_sig = ""  # last significant char — regex-vs-division heuristic
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
        in_tpl = bool(mode) and mode[-1] == "`"
        if in_tpl:
            if c == "\\":
                i += 2
                continue
            if c == "`":
                mode.pop()
            elif c == "$" and i + 1 < n and src[i + 1] == "{":
                mode.append("${")
                stack.append(("${", line))  # distinct opener: only ITS
                i += 1                      # closing } leaves expr mode
        else:
            if c in "'\"":
                q = c
                i += 1
                while i < n and src[i] != q:
                    if src[i] == "\\":
                        i += 1
                    elif src[i] == "\n":
                        line += 1
                    i += 1
            elif c == "/" and i + 1 < n and src[i + 1] == "/":
                while i < n and src[i] != "\n":
                    i += 1
                line += 1
            elif c == "/" and i + 1 < n and src[i + 1] == "*":
                i += 2
                while i + 1 < n and not (src[i] == "*" and src[i + 1] == "/"):
                    if src[i] == "\n":
                        line += 1
                    i += 1
                i += 1
            elif c == "/" and prev_sig in "(,=:[!&|?{};" + "\n":
                # regex literal (prev char can't end an operand) — skip
                # to the unescaped closing /, honouring [...] classes
                i += 1
                in_class = False
                while i < n and (src[i] != "/" or in_class):
                    if src[i] == "\\":
                        i += 1
                    elif src[i] == "[":
                        in_class = True
                    elif src[i] == "]":
                        in_class = False
                    i += 1
            elif c == "`":
                mode.append("`")
            elif c in "([{":
                stack.append((c, line))
            elif c in ")]}":
                assert stack, f"{path}:{line}: unmatched {c}"
                opener, oline = stack.pop()
                assert opener == pairs[c] or (c == "}" and opener == "${"), (
                    f"{path}:{line}: {c} closes {opener} from line {oline}")
                if opener == "${":
                    assert mode and mode[-1] == "${", (
                        f"{path}:{line}: stray template-expr close")
                    mode.pop()
        if not in_tpl and not c.isspace():
            prev_sig = c
        i += 1
    assert not stack, f"{path}: unclosed {stack[-3:]}"
    assert not mode, f"{path}: unterminated template literal"


def test_console_js_urls_resolve_to_routes(ctx):
    """Every URL literal the console JS fetches must match a registered
    route (method-aware) — the headless stand-in for a browser-driven
    click-through (no JS engine in this image). Template interpolations
    become single-segment wildcards; route `{vars}` likewise."""
    import os
    import re

    api_dir = os.path.join(os.path.dirname(__file__), "..",
                           "mobius_rag_tpu", "api")
    js = "".join(
        open(os.path.join(api_dir, "static", f)).read()
        for f in sorted(os.listdir(os.path.join(api_dir, "static"))))

    calls: list[tuple[str, str]] = []
    for m in re.finditer(r'UI\.get\(\s*[`"\']([^`"\']+)[`"\']', js):
        calls.append(("GET", m.group(1)))
    for m in re.finditer(r'UI\.post\(\s*[`"\']([^`"\']+)[`"\']', js):
        # explicit method rides as the LAST string arg before the close
        # (UI.post(url, body, "PUT")); bodies span lines, so look ahead
        # to the statement end
        tail = js[m.end():js.index(";", m.end())]
        mm = re.search(r'"(GET|PUT|PATCH|DELETE)"\s*\)\s*$', tail.strip())
        calls.append((mm.group(1) if mm else "POST", m.group(1)))
    for m in re.finditer(r'fetch\(\s*"([^"?]+)[^)]*?', js):
        tail = js[m.start():m.start() + 200]
        mm = re.search(r'method:\s*"(\w+)"', tail)
        calls.append((mm.group(1) if mm else "GET", m.group(1)))
    assert len(calls) > 40, f"extraction regressed: {len(calls)}"

    app = build_app(ctx)
    routes = set()
    for r in app.router.routes():
        info = r.resource.get_info() if r.resource else {}
        pattern = info.get("path") or info.get("formatter") or ""
        if pattern:
            routes.add((r.method, pattern))

    def seg_norm(path: str) -> tuple[str, ...]:
        path = path.split("?")[0]
        return tuple("*" if ("${" in s or (s.startswith("{") and
                                           s.endswith("}"))) else s
                     for s in path.strip("/").split("/"))

    route_index: dict[str, set[tuple[str, ...]]] = {}
    for method, pattern in routes:
        route_index.setdefault(method, set()).add(seg_norm(pattern))

    def matches(method: str, path: str) -> bool:
        want = seg_norm(path)
        for have in route_index.get(method, ()):
            if len(have) == len(want) and all(
                    a == b or a == "*" or b == "*"
                    for a, b in zip(have, want)):
                return True
        return False

    missing = [(m, p) for m, p in calls
               if not p.startswith("http") and not matches(m, p)]
    assert not missing, f"console JS calls without routes: {missing}"


def test_fact_review_workflow(ctx):
    """Accept/reject/edit review loop (reference ReviewFactsTab)."""
    async def scenario():
        lex = ctx.engine.lexicon
        recs = [_fact_record("revdoc", i, t, lex) for i, t in enumerate([
            "Claims must be received within 180 days of service.",
            "Prior authorization is required for H0019.",
        ])]
        ctx.store.publish_document("revdoc", recs)
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            r = await client.get("/facts?needs_review=1")
            pool = [f for f in (await r.json())["facts"]
                    if f["doc_id"] == "revdoc"]
            assert len(pool) == 2
            fid = pool[0]["fact_id"]

            r = await client.post("/facts/review", json={
                "doc_id": "revdoc", "fact_id": fid, "verdict": "accepted",
                "note": "checked against the manual"})
            assert (await r.json())["verdict"] == "accepted"
            r = await client.get("/facts?needs_review=1")
            pool = [f for f in (await r.json())["facts"]
                    if f["doc_id"] == "revdoc"]
            assert len(pool) == 1  # accepted one left the queue

            # reject + remove unpublishes the fact
            fid2 = pool[0]["fact_id"]
            r = await client.post("/facts/review", json={
                "doc_id": "revdoc", "fact_id": fid2, "verdict": "rejected",
                "remove": True})
            body = await r.json()
            assert body["removed"] is True
            r = await client.get("/documents/revdoc/facts")
            left = (await r.json())["facts"]
            assert [f["fact_id"] for f in left] == [fid]

            # bad verdict refused
            r = await client.post("/facts/review", json={
                "doc_id": "revdoc", "fact_id": fid, "verdict": "maybe"})
            assert r.status == 400
        finally:
            await client.close()

    _run(scenario())


def test_curator_probe_classify_ingested(ctx):
    async def scenario():
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            url = "https://www.sunshinehealth.com/providers/manual.pdf"
            r = await client.post("/api/curator/sources", json={"url": url})
            assert (await r.json())["url"] == url
            r = await client.post("/api/curator/classify", json={"url": url})
            body = await r.json()
            assert body["payer"]
            r = await client.post("/api/curator/probe", json={"url": url})
            assert "probed" in (await r.json())
            r = await client.post("/api/curator/mark-ingested",
                                  json={"url": url, "doc_id": "d1"})
            assert (await r.json())["status"] == "ingested"
            for ep in ("probe", "classify", "mark-ingested"):
                r = await client.post(f"/api/curator/{ep}", json={})
                assert r.status == 400
        finally:
            await client.close()

    _run(scenario())
