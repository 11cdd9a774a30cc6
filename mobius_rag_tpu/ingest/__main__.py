"""Worker process entrypoints (reference: `python -m app.worker` and
`python -m app.embedding_worker`; worker_server_* supervision is the
deploy layer's restart loop).

    python -m mobius_rag_tpu.ingest --kind chunking
    python -m mobius_rag_tpu.ingest --kind embedding --snapshot ~/.mobius_rag_tpu/snapshot

Workers share the sqlite job queue across processes. The embedding
worker loads the index snapshot (if any), publishes into it, and
re-snapshots after each drained batch so the serving process can reload
(durable-progress parity with the reference's per-batch commits).
"""
from __future__ import annotations

import argparse
import os

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.ingest import shutdown
from mobius_rag_tpu.ingest.queue import JobQueue
from mobius_rag_tpu.blobstore import get_document_store
from mobius_rag_tpu.ingest.worker import ChunkingWorker, EmbeddingWorker
from mobius_rag_tpu.observability import setup_logging
from mobius_rag_tpu.providers import get_embedding_provider
from mobius_rag_tpu.query.lexicon import Lexicon


def _start_health_server(port: int, stale_after_s: float = 120.0):
    """Liveness shell (reference worker_server_*.py:8-35): /health
    returns 503 when the worker tick is stale so the supervisor replaces
    the instance. Returns a tick() callable the worker loop must call."""
    import json
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    last_tick = {"t": time.time()}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            age = time.time() - last_tick["t"]
            ok = age < stale_after_s
            body = json.dumps({"status": "ok" if ok else "stale",
                               "tick_age_s": round(age, 1)}).encode()
            self.send_response(200 if ok else 503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet access log
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def tick():
        last_tick["t"] = time.time()

    return tick, server


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["chunking", "embedding"], required=True)
    ap.add_argument("--queue", default=None, help="job queue sqlite path")
    ap.add_argument("--snapshot", default=None, help="index snapshot dir")
    ap.add_argument("--index-url", default=os.getenv("MRAG_INDEX_URL", ""),
                    help="serving process base URL: publish into the LIVE "
                         "index over RPC instead of snapshot+reload")
    ap.add_argument("--provider", default=None)
    ap.add_argument("--once", action="store_true", help="drain and exit")
    ap.add_argument("--health-port", type=int, default=0,
                    help="liveness endpoint port (503 when tick stale >120s)")
    args = ap.parse_args()

    log = setup_logging(f"mrag-{args.kind}-worker")
    shutdown.install_handlers()
    queue = JobQueue(args.queue)
    worker_id = f"{args.kind}-{os.getpid()}"
    # Production lexicon (MRAG_LEXICON_PATH; packaged full lexicon by
    # default) — workers must tag with the same lexicon the server
    # expands queries with, or coverage/gate signals drift.
    lexicon = Lexicon.from_yaml(get_config().lexicon_path)
    local_tick = lambda: None
    if args.health_port:
        local_tick, _ = _start_health_server(args.health_port)
        log.info("health endpoint on :%d", args.health_port)

    def tick():
        # both liveness surfaces: the per-process /health shell AND the
        # shared queue DB (the API's /health/deep watches the fleet)
        local_tick()
        queue.worker_tick(worker_id, args.kind)

    tick()

    import atexit

    # clean exits deregister (a deliberately stopped worker must not read
    # as stale); a crash/freeze leaves the tick to go stale — the signal
    atexit.register(queue.deregister_worker, worker_id)

    if args.kind == "chunking":
        # durable blob store: a chunking worker process must see blobs the
        # API process uploaded (the GCS-bucket role)
        worker = ChunkingWorker(queue, get_document_store(), lexicon)
        log.info("chunking worker up")
        n = 0
        while not shutdown.is_shutting_down():
            n += worker.run_loop(max_jobs=100)
            tick()
            if args.once or shutdown.sleep_or_shutdown(1.0):
                break
        log.info("chunking worker done, jobs=%d", n)
        return

    embed = get_embedding_provider(args.provider)
    if args.index_url:
        # durable index service: publishes go straight to the serving
        # process's live index — no snapshot hop (index/service.py)
        from mobius_rag_tpu.index.service import RemoteIndexClient

        store = RemoteIndexClient(args.index_url,
                                  admin_key=os.getenv("MRAG_ADMIN_KEY", ""))
        worker = EmbeddingWorker(queue, store, lexicon, embed.embed)
        log.info("embedding worker up (remote index %s)", args.index_url)
        while not shutdown.is_shutting_down():
            worker.run_loop(max_jobs=100)
            tick()
            if args.once or shutdown.sleep_or_shutdown(1.0):
                break
        return

    snap = args.snapshot or os.path.join(get_config().data_dir, "snapshot")
    store = (ChunkStore.restore(snap)
             if os.path.exists(os.path.join(snap, "store.json"))
             else ChunkStore())
    worker = EmbeddingWorker(queue, store, lexicon, embed.embed)
    log.info("embedding worker up (index %d chunks)", store.size)
    while not shutdown.is_shutting_down():
        n = worker.run_loop(max_jobs=100)
        tick()
        if n:
            store.snapshot(snap)
            log.info("snapshotted after %d jobs (index %d chunks)", n, store.size)
        if args.once:
            break
        if shutdown.sleep_or_shutdown(1.0):
            break


if __name__ == "__main__":
    main()
