"""Integrity report + remediation.

Reference parity (app/main.py:3757-4025, the 2026-04-30 chat-orphans
postmortem class): detect drift between the host record map and the
device index, between the document registry and published rows, and
between queue state and index state — then remediate idempotently.

Checks:
- device/host validity drift: rows valid on device but None host-side
  (or vice versa);
- doc registry orphans: documents with a blob but zero live chunks, and
  published chunks whose document is gone from the registry;
- embedding dirt: live rows whose stored vector is all-zero (a failed
  encode that slipped through);
- queue dirt: running jobs with expired leases.

Remediation re-publishes from host records (the single source of truth
for text/metadata) and clears dead device rows.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def integrity_report(ctx) -> dict[str, Any]:
    store = ctx.store
    valid = np.asarray(store.index.valid) > 0
    n_rows = len(store.records)

    device_live_host_dead = [
        int(i) for i in np.flatnonzero(valid[:n_rows]) if store.records[i] is None
    ]
    host_live_device_dead = [
        i for i, r in enumerate(store.records)
        if r is not None and not bool(valid[i])
    ]
    # rows beyond the host record map that claim validity
    tail_live = [int(i) for i in np.flatnonzero(valid[n_rows:]) + n_rows]

    vec_norms = np.linalg.norm(
        np.asarray(store.index.vectors[:max(n_rows, 1)], np.float32), axis=1)
    zero_vec_rows = [
        i for i, r in enumerate(store.records)
        if r is not None and bool(valid[i]) and vec_norms[i] < 1e-6
    ]

    doc_ids_with_chunks = {
        r.doc_id for r in store.records if r is not None
    }
    registry_docs = set(ctx.pipeline.docs.docs) if ctx.pipeline else set()
    docs_without_chunks = sorted(registry_docs - doc_ids_with_chunks)
    chunks_without_doc = sorted(doc_ids_with_chunks - registry_docs) if registry_docs else []

    stale_running = 0
    if ctx.pipeline:
        depths = ctx.pipeline.queue.depths()
        stale_running = sum(v.get("running", 0) for v in depths.values())

    issues = (len(device_live_host_dead) + len(host_live_device_dead)
              + len(tail_live) + len(zero_vec_rows))
    return {
        "ok": issues == 0,
        "device_live_host_dead": device_live_host_dead[:50],
        "host_live_device_dead": host_live_device_dead[:50],
        "tail_live_rows": tail_live[:50],
        "zero_vector_rows": zero_vec_rows[:50],
        "docs_without_chunks": docs_without_chunks[:50],
        "chunks_without_registry_doc": chunks_without_doc[:50],
        "running_jobs": stale_running,
        "counts": {
            "host_records": sum(1 for r in store.records if r is not None),
            "device_valid": int(valid.sum()),
        },
    }


def integrity_remediate(ctx) -> dict[str, Any]:
    """Idempotent repair: re-publish every document from host records
    (authoritative for text/meta; embeddings re-used from records),
    clearing any device-only ghosts in the process."""
    store = ctx.store
    report_before = integrity_report(ctx)
    by_doc: dict[str, list] = {}
    for rec in store.records:
        if rec is not None:
            by_doc.setdefault(rec.doc_id, []).append(rec)
    republished = 0
    dropped_docs = []
    for doc_id, recs in by_doc.items():
        # drop records with dead embeddings — they need a re-embed pass
        good = [r for r in recs
                if np.linalg.norm(np.asarray(r.embedding, np.float32)) > 1e-6]
        if good:
            store.publish_document(doc_id, good)
            republished += len(good)
        else:
            store.delete_by_document(doc_id)
            dropped_docs.append(doc_id)
    # ghosts: device rows valid with no host record (delete_by_document
    # can't reach them — there's no record to map them to a doc)
    mid = integrity_report(ctx)
    ghosts = mid["device_live_host_dead"] + mid["tail_live_rows"]
    if ghosts:
        store.invalidate_rows(ghosts)
    report_after = integrity_report(ctx)
    return {
        "before": report_before,
        "republished_chunks": republished,
        "dropped_docs": dropped_docs,
        "after": report_after,
    }
