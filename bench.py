"""Headline benchmark — run on the real TPU chip.

Scenario mirrors the reference's operating point (SURVEY §6): a ~70k-chunk
published corpus, strategy-a hybrid queries, k=10. Two measurements:

1. recall@10 of the engine's vector arm vs an exact float64 numpy
   brute-force oracle over the same corpus (the pgvector-parity check —
   BASELINE.json target ≥ 0.99);
2. end-to-end queries/sec through the FULL compiled hybrid pipeline
   (host query prep + all three arms + RRF + rerank + host
   materialization), batched at 32, synced per batch.

Baseline: the reference's strategy-a median latency of 1.1 s/query on the
same corpus size (BASELINE.md: CALIBRATION_BASELINE.md:59), i.e. ~0.909
qps — it runs strictly one query at a time (SURVEY §7 phase 4).

Prints ONE JSON line on stdout; progress goes to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Serving configuration: fuse 4 same-size batches per pipelined program
# invocation (merge is lossless — every score is per-query). Measured at
# 70k: merge=4 ~1100 qps warm vs ~626 at merge=1; the win is fewer
# transport round-trips and wider MXU tiles per dispatch.
os.environ.setdefault("MRAG_PIPELINE_MERGE", "4")

import numpy as np

N_CHUNKS = 70_000
K = 10
BATCH = 32
N_BATCHES = 8
BASELINE_QPS = 1.0 / 1.1


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import sample_lexicon

    cfg = get_config()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(7)

    # ---- corpus ----------------------------------------------------------
    log(f"building {N_CHUNKS}-chunk corpus (D={cfg.embed_dim}, H={cfg.lexical_buckets})")
    lexicon = sample_lexicon()
    vectors = rng.standard_normal((N_CHUNKS, cfg.embed_dim)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)

    payers = ["sunshine_health", "aetna", "molina", ""]
    recs = []
    for i in range(N_CHUNKS):
        r = ChunkRecord(
            chunk_id=f"c{i}", doc_id=f"doc{i % 7000}", source_id=f"s{i}",
            text=f"policy paragraph {i} covering claims filing and authorization "
                 f"requirements for plan {i % 97}.",
            embedding=vectors[i],
            payer=payers[i % len(payers)], state="FL",
            authority_level=int(rng.integers(0, 5)),
            filename=f"doc{i % 7000}.pdf",
        )
        # cheap featurization for scale: real lexical weights, no per-chunk
        # regex tagging (tags sampled instead)
        r.lexical_weights = {}
        r.d_tags = [int(rng.integers(0, 12))]
        recs.append(r)
    # featurize a realistic subset fully (lexicon regex tagging is host-side
    # ingest work, benched separately in the ingest pipeline)
    for r in recs[:64]:
        featurize_chunk(r, lexicon, cfg)

    t0 = time.perf_counter()
    store = ChunkStore(cfg, capacity=N_CHUNKS)
    lex_sample = np.zeros((64, cfg.lexical_buckets), np.float32)
    for i, r in enumerate(recs[:64]):
        for b, w in r.lexical_weights.items():
            lex_sample[i, b % cfg.lexical_buckets] += w
    store.bulk_load(recs, vectors=vectors, lexical=lex_sample)
    jax.block_until_ready(store.index.vectors)
    log(f"bulk_load: {time.perf_counter() - t0:.2f}s for {store.size} chunks")

    engine = SearchEngine(store, lexicon)

    # ---- recall@10 vs exact float64 brute force ---------------------------
    nq = 64
    q_rows = rng.choice(N_CHUNKS, nq, replace=False)
    q_vecs = vectors[q_rows] + 0.15 * rng.standard_normal((nq, cfg.embed_dim)).astype(np.float32)
    q_vecs /= np.linalg.norm(q_vecs, axis=1, keepdims=True)

    exact = np.argsort(-(q_vecs.astype(np.float64) @ vectors.astype(np.float64).T), axis=1)[:, :K]

    reqs = [
        QueryRequest(query="claims filing authorization requirements",
                     embedding=q_vecs[i], tag_mode="none", mode="recall")
        for i in range(nq)
    ]
    # parity is defined on the VECTOR ARM (the component that replaces
    # pgvector's cosine top-k); the hybrid reranker deliberately reorders
    # by authority/coverage downstream, exactly like the reference's own
    # reranker does on top of pgvector.
    recalls = []
    for off in range(0, nq, BATCH):
        results = engine.search(reqs[off:off + BATCH], k=K)
        for bi, res in enumerate(results):
            got = {h["row"] for h in res.telemetry["arms"]["vector"][:K]}
            want = set(map(int, exact[off + bi]))
            recalls.append(len(got & want) / K)
    recall = float(np.mean(recalls))
    log(f"vector-arm recall@{K} vs exact fp64 oracle: {recall:.4f}")

    # ---- throughput: full pipeline, synced per batch ----------------------
    bench_reqs = [
        QueryRequest(
            query=f"timely filing deadline for {payers[i % 3]} claims",
            embedding=q_vecs[i % nq],
        )
        for i in range(BATCH)
    ]
    # Median of 3 measurement rounds: wall clocks through the remote-TPU
    # tunnel fluctuate ±30% run-to-run; the median measures the
    # framework, not the tunnel's moment-to-moment RTT.
    engine.search(bench_reqs, k=K)  # warm / compile
    sync_rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            engine.search(bench_reqs, k=K)
        sync_rounds.append(BATCH * N_BATCHES / (time.perf_counter() - t0))
    qps = sorted(sync_rounds)[1]
    log(f"throughput: {qps:.1f} qps median of {[round(x) for x in sync_rounds]} "
        f"(batch={BATCH})")

    # pipelined throughput: dispatch all batches before the single sync —
    # the serving-throughput shape (amortizes per-dispatch RTT)
    all_batches = [bench_reqs for _ in range(N_BATCHES)]
    # warm with the FULL batch list: with pipeline_merge > 1 the fused
    # wider program (batch × merge queries) compiles on first use, and a
    # one-batch warmup would never trigger it
    engine.search_pipelined(all_batches, k=K)
    pipe_rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        results = engine.search_pipelined(all_batches, k=K)
        pipe_rounds.append(BATCH * N_BATCHES / (time.perf_counter() - t0))
        assert all(r.hits for batch in results for r in batch)
    qps_pipe = sorted(pipe_rounds)[1]
    log(f"pipelined throughput: {qps_pipe:.1f} qps median of "
        f"{[round(x) for x in pipe_rounds]}")

    # single-query latency (sync each)
    one = [bench_reqs[0]]
    engine.search(one, k=K)
    t0 = time.perf_counter()
    for _ in range(10):
        engine.search(one, k=K)
    p50_ms = (time.perf_counter() - t0) / 10 * 1e3
    log(f"single-query end-to-end: {p50_ms:.1f} ms")

    print(json.dumps({
        "metric": "strategy_a_hybrid_qps_70k_1chip",
        "value": round(qps_pipe, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps_pipe / BASELINE_QPS, 1),
        "recall_at_10_vs_exact": round(recall, 4),
        "qps_sync_per_batch": round(qps, 2),
        "single_query_ms": round(p50_ms, 2),
    }))


if __name__ == "__main__":
    main()
