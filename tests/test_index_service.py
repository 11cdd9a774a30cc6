"""Durable index serving: the embedding worker publishes into the
serving process's LIVE index over RPC (no snapshot hop) — ROUND1_NOTES
#5 / the reference's publish contract without a Postgres in the middle."""
import asyncio
import threading
import time

import pytest

from mobius_rag_tpu.api.server import AppContext, build_app
from mobius_rag_tpu.index.service import RemoteIndexClient, record_from_wire, record_to_wire
from mobius_rag_tpu.index.store import ChunkRecord
from mobius_rag_tpu.ingest.queue import JobQueue
from mobius_rag_tpu.ingest.worker import EMBEDDING_KIND, EmbeddingWorker
from mobius_rag_tpu.testing import hash_embed, sample_lexicon


@pytest.fixture(scope="module")
def serving():
    """Real-socket serving process (background thread + own loop) so the
    sync urllib client can hit it."""
    from aiohttp import web

    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())
    app = build_app(ctx)
    state = {}
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        runner = web.AppRunner(app)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 0)
        loop.run_until_complete(site.start())
        state["port"] = site._server.sockets[0].getsockname()[1]
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "port" in state:
            break
        time.sleep(0.05)
    return ctx, f"http://127.0.0.1:{state['port']}"


def test_record_wire_roundtrip(rng):
    from mobius_rag_tpu.config import get_config

    rec = ChunkRecord(
        chunk_id="c0", doc_id="d", text="body text",
        embedding=rng.standard_normal(get_config().embed_dim).astype("float32"),
        j_tags=[1], d_tags=[2, 3], phrase_ids=[7],
        lexical_weights={5: 1.5, 9: 0.25}, page=3)
    back = record_from_wire(record_to_wire(rec))
    assert back.chunk_id == rec.chunk_id and back.lexical_weights == rec.lexical_weights
    import numpy as np

    np.testing.assert_allclose(back.embedding, rec.embedding)


def test_remote_publish_reaches_live_index(serving, tmp_path):
    ctx, url = serving
    lex = sample_lexicon()
    queue = JobQueue(str(tmp_path / "jobs.sqlite"))
    units = [{"source_id": f"rdoc-p{i}", "kind": "paragraph",
              "text": t, "section_path": "Filing", "page": i + 1,
              "j_tags": [], "d_tags": [], "p_tags": []}
             for i, t in enumerate([
                 "Remote plan timely filing deadline is 198 days from the "
                 "date of service.",
                 "Remote plan prior authorization decisions arrive within "
                 "6 calendar days."])]
    queue.enqueue(EMBEDDING_KIND, {
        "doc_id": "remote_doc", "units": units,
        "meta": {"filename": "Remote Plan Manual.txt", "payer": "remote",
                 "state": "FL", "authority_level": 3}})
    client = RemoteIndexClient(url)
    worker = EmbeddingWorker(queue, client, lex, hash_embed)
    assert worker.run_loop(max_jobs=1) == 1

    # the SERVING process's live store has the rows — no snapshot hop
    assert any(r is not None and r.doc_id == "remote_doc"
               for r in ctx.store.records)
    from mobius_rag_tpu.query.engine import QueryRequest

    res = ctx.engine.search(QueryRequest(
        query="remote plan timely filing deadline 198 days"), k=3)[0]
    assert any(h.doc_id == "remote_doc" for h in res.hits)

    # incremental resume RPC: the worker sees what's already embedded
    assert client.embedded_source_ids("remote_doc") == {
        "rdoc-p0", "rdoc-p1"}

    # republish with one unit dropped → clean remote republish
    queue2 = JobQueue(str(tmp_path / "jobs2.sqlite"))
    queue2.enqueue(EMBEDDING_KIND, {
        "doc_id": "remote_doc", "units": units[:1],
        "meta": {"filename": "Remote Plan Manual.txt", "payer": "remote"}})
    EmbeddingWorker(queue2, client, lex, hash_embed).run_loop(max_jobs=1)
    assert client.embedded_source_ids("remote_doc") == {"rdoc-p0"}

    # remote delete
    assert client.delete_by_document("remote_doc") == 1
    assert client.embedded_source_ids("remote_doc") == set()
