"""Stage-level diagnosis of the config-5 (host-residency) serving path.

The 10M e2e run measured 6.8 qps sync / 7.0 pipelined — and pipelining
buying nothing means ONE stage dominates. This script reproduces the
exact serving configuration at a smaller N (default 2M, sliced from the
cached 10M corpus) and times each stage independently:

- prep:     host query prep (prepare_batch)
- device:   the compiled program alone (dispatch + completion, no fetch)
- fetch:    device_get of the TWO packed output arrays (completed)
- rerank:   _host_rerank on the unpacked funnel
- assemble: result materialization
- full:     engine.search end-to-end (cross-check: ≈ sum of stages)

Usage: python scripts/diag_host_funnel.py [--n 2000000] [--batch 32]
Prints one JSON line; writes eval_artifacts/DIAG_host_funnel_<n>.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MRAG_VECTOR_RESIDENCY", "host")
os.environ.setdefault("MRAG_VECTOR_DTYPE", "int8")
os.environ.setdefault("MRAG_VECTOR_BACKEND", "proj")
os.environ.setdefault("MRAG_PROJ_P", "192")
os.environ.setdefault("MRAG_LEXICAL_FORMAT", "sparse")
os.environ.setdefault("MRAG_PHRASE_WORDS", "8")
os.environ.setdefault("MRAG_TAG_WORDS", "4")
os.environ.setdefault("MRAG_IVF_NLIST", "4096")
os.environ.setdefault("MRAG_IVF_NPROBE", "64")
os.environ.setdefault("MRAG_OVER_FETCH", "8")
os.environ.setdefault("MRAG_HOST_FUNNEL", "1024")
os.environ.setdefault("MRAG_DATA_DIR", "/tmp/mrag-diag")

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def median(f, iters=5):
    vals = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        vals.append(time.perf_counter() - t0)
    return sorted(vals)[len(vals) // 2] * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--stages", action="store_true",
                    help="also attribute device time across the ANN-mode "
                         "sub-programs (filters/vector/lexical/dtag/arms)")
    args = ap.parse_args()

    import jax

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query import engine as eng
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import sample_lexicon

    cfg = get_config()
    N, B, K = args.n, args.batch, args.k
    log(f"backend={jax.default_backend()} N={N}")

    cvec, csca = "/tmp/bench10m_vec_10000000.npy", "/tmp/bench10m_sca_10000000.npy"
    if not os.path.exists(cvec):
        log("FATAL: 10M corpus cache missing (run bench_10m.py first)")
        sys.exit(2)
    host_vec = np.array(np.load(cvec, mmap_mode="r")[:N])
    host_sca = np.array(np.load(csca, mmap_mode="r")[:N])

    qcache = "/tmp/ann_curve_queries.npy"
    qv = np.load(qcache)[:B].astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)

    t0 = time.perf_counter()
    payers = ["sunshine_health", "aetna", "molina", ""]
    Z = np.zeros(0, np.float32)
    recs = [ChunkRecord(chunk_id=f"c{i}", doc_id=f"doc{i % 100_000}",
                        source_id=f"s{i}",
                        text="policy paragraph on claims and authorization.",
                        embedding=Z, payer=payers[i & 3], state="FL",
                        authority_level=0, d_tags=[i % 12])
            for i in range(N)]
    lexicon = sample_lexicon()
    for r in recs[:64]:
        featurize_chunk(r, lexicon, cfg)
    store = ChunkStore(cfg, capacity=N)
    store.bulk_load(recs, vectors=host_vec)
    store.host_scales[:N] = host_sca
    jax.device_get(store.index.valid[:1])
    log(f"records+bulk_load: {time.perf_counter() - t0:.0f}s")

    engine = SearchEngine(store, lexicon)
    t0 = time.perf_counter()
    ann = engine.ensure_ann()
    log(f"ensure_ann: {time.perf_counter() - t0:.0f}s")

    reqs = [QueryRequest(query=f"timely filing for {payers[i % 3]} claims",
                         embedding=qv[i % len(qv)], tag_mode="none")
            for i in range(B)]
    engine.search(reqs, k=K)  # warm/compile everything

    kd = engine._device_k(K)
    fw = engine._device_funnel(K)
    q, exps = engine.prepare_batch(reqs)

    def run_program():
        return eng._search_compiled(store.index, q, kd, cfg.over_fetch,
                                    cfg.rrf_k, ann, engine.effective_nprobe,
                                    fw)

    # device-only: dispatch + completion forced by fetching ONE element
    out_fi = run_program()
    jax.device_get(out_fi[0][:1, :1])

    def t_device():
        o = run_program()
        jax.device_get(o[0][:1, :1])

    dev_ms = median(t_device)

    # fetch-only: device_get the completed packed arrays
    f_done, i_done = run_program()
    jax.device_get(f_done[:1, :1])
    fetch_ms = median(lambda: jax.device_get((f_done, i_done)))
    payload = (f_done.size * f_done.dtype.itemsize
               + i_done.size * i_done.dtype.itemsize)

    # host stages
    out = eng.unpack_out(jax.device_get((f_done, i_done)), kd, w=fw)
    rerank_ms = median(lambda: engine._host_rerank(reqs, exps, dict(out), K))
    reranked = engine._host_rerank(reqs, exps, dict(out), K)
    asm_ms = median(lambda: engine._assemble(list(reqs), exps, reranked, K))
    prep_ms = median(lambda: engine.prepare_batch(reqs))

    full_ms = median(lambda: engine.search(reqs, k=K), iters=3)
    pipe_ms = median(lambda: engine.search_pipelined([reqs] * 4, k=K),
                     iters=3) / 4

    stages = {}
    if args.stages:
        # Cumulative-prefix attribution inside the ANN-mode program: each
        # prefix is its own jitted program; differences approximate stage
        # costs (XLA fuses differently in the full program — report raw).
        import functools as ft

        import jax.numpy as jnp

        nprobe = engine.effective_nprobe
        m_oth = min(K * cfg.over_fetch, N)

        @ft.partial(jax.jit, static_argnames=("which",))
        def prefix(index, qq, ann_, which):
            qq = dict(qq, vec=qq["vec"].astype(jnp.float32))
            strict, relaxed, open_m, meta_ok = eng.filter_masks(index, qq)
            if which == "filters":
                return (strict.sum() + relaxed.sum() + open_m.sum()
                        + meta_ok.sum())
            strict_total = strict.sum(axis=1)[:, None]
            penalty = eng.gate_penalty(strict, relaxed, open_m, qq, K,
                                       strict_total)
            if which == "vector":
                from mobius_rag_tpu.ops.proj import proj_search_packed
                vals, idx = proj_search_packed(ann_, qq["vec"], penalty,
                                               fw, nprobe)
                return vals.sum() + idx.sum()
            if which == "lexical":
                lex = eng.lexical_raw(index, qq)
                sc = jnp.where(lex > 0, lex, eng.NEG_INF) + penalty
                vals, idx = jax.lax.top_k(sc, m_oth)
                return vals.sum() + idx.sum()
            if which == "dtag":
                sc = eng.dtag_raw(index, qq, meta_ok)
                vals, idx = jax.lax.top_k(sc, m_oth)
                return vals.sum() + idx.sum()
            vals, gidx, sigs, st = eng.arm_candidates(
                index, qq, K, fw, m_other=m_oth, ann=ann_, nprobe=nprobe)
            return vals.sum() + gidx.sum() + sigs.sum() + st.sum()

        for which in ("filters", "vector", "lexical", "dtag", "arms"):
            f = lambda w=which: jax.device_get(
                prefix(store.index, q, ann, w))
            f()  # compile
            stages[which] = round(median(f), 1)
        log(f"stages: {stages}")

    res = {
        "metric": f"diag_host_funnel_{N}",
        "n": N, "batch": B, "funnel": fw, "kd": kd,
        "prep_ms": round(prep_ms, 1),
        "device_ms": round(dev_ms, 1),
        "fetch_ms": round(fetch_ms, 1),
        "payload_bytes": int(payload),
        "fetch_mb_s": round(payload / 1e6 / (fetch_ms / 1e3), 2),
        "rerank_ms": round(rerank_ms, 1),
        "assemble_ms": round(asm_ms, 1),
        "full_search_ms": round(full_ms, 1),
        "pipelined_ms_per_batch": round(pipe_ms, 1),
        "sync_qps": round(B / (full_ms / 1e3), 1),
        "pipelined_qps": round(B / (pipe_ms / 1e3), 1),
    }
    if stages:
        res["device_stages_ms"] = stages
    print(json.dumps(res))
    os.makedirs("/root/repo/eval_artifacts", exist_ok=True)
    with open(f"/root/repo/eval_artifacts/DIAG_host_funnel_{N}.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
