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
from mobius_rag_tpu.ingest.worker import ChunkingWorker, DocumentStore, EmbeddingWorker
from mobius_rag_tpu.observability import setup_logging
from mobius_rag_tpu.providers import get_embedding_provider
from mobius_rag_tpu.testing import sample_lexicon


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["chunking", "embedding"], required=True)
    ap.add_argument("--queue", default=None, help="job queue sqlite path")
    ap.add_argument("--snapshot", default=None, help="index snapshot dir")
    ap.add_argument("--provider", default=None)
    ap.add_argument("--once", action="store_true", help="drain and exit")
    args = ap.parse_args()

    log = setup_logging(f"mrag-{args.kind}-worker")
    shutdown.install_handlers()
    queue = JobQueue(args.queue)
    lexicon = sample_lexicon()

    if args.kind == "chunking":
        worker = ChunkingWorker(queue, DocumentStore(), lexicon)
        log.info("chunking worker up")
        n = worker.run_loop(max_jobs=10_000 if args.once else None)
        log.info("chunking worker done, jobs=%d", n)
        return

    snap = args.snapshot or os.path.join(get_config().data_dir, "snapshot")
    store = (ChunkStore.restore(snap)
             if os.path.exists(os.path.join(snap, "store.json"))
             else ChunkStore())
    embed = get_embedding_provider(args.provider)
    worker = EmbeddingWorker(queue, store, lexicon, embed.embed)
    log.info("embedding worker up (index %d chunks)", store.size)
    while not shutdown.is_shutting_down():
        n = worker.run_loop(max_jobs=100)
        if n:
            store.snapshot(snap)
            log.info("snapshotted after %d jobs (index %d chunks)", n, store.size)
        if args.once:
            break
        if shutdown.sleep_or_shutdown(1.0):
            break


if __name__ == "__main__":
    main()
