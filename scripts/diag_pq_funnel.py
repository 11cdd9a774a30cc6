"""Diagnose the config-5 (PQ + host re-rank) recall/latency failure seen
at 10M (BENCH chain: engine recall@10 0.1969, 1.2 qps vs 0.9875 at the
20k methodology trial).

Isolates the VECTOR ARM: IVFIndex.build_host + PackedPQ.from_ivf +
pq_search_packed on an N-row slice of the cached 10M bench corpus
(graded near-duplicate copies of trained-encoder embeddings — the
structure that matters). Measures, against a blockwise exact oracle:

1. funnel recall: fraction of the oracle top-10 inside the ADC top-W
   for W in {80, 256, 1024} — the host re-rank can only repair ranking
   INSIDE the funnel, so this bounds end-to-end recall;
2. probe coverage: fraction of oracle rows whose OWNING cluster is
   probed at all (separates routing misses from ADC resolution);
3. wall time of the jitted ADC scan per batch (the 1.2 qps suspect);
4. M sensitivity: the same funnel with m=192 codebooks (8-dim
   subvectors, 2x code bytes).

Usage: python scripts/diag_pq_funnel.py [--n 1000000] [--m2 192]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--m2", type=int, default=0, help="second M to compare")
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cache", default="/tmp/bench10m_vec_10000000.npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mobius_rag_tpu.index.ivf import IVFIndex
    from mobius_rag_tpu.ops.pq import PackedPQ, pq_search_packed

    # ---- slice: nb bases x 10 amplitude copies from the 10M cache ----
    full = np.load(args.cache, mmap_mode="r")
    fsca = np.load(args.cache.replace("_vec_", "_sca_"), mmap_mode="r")
    NB_FULL = full.shape[0] // 10  # bases per copy block in the cache
    nb = args.n // 10
    vec = np.empty((args.n, full.shape[1]), np.int8)
    sca = np.empty((args.n,), np.float32)
    for t in range(10):
        vec[t * nb:(t + 1) * nb] = full[t * NB_FULL:t * NB_FULL + nb]
        sca[t * nb:(t + 1) * nb] = fsca[t * NB_FULL:t * NB_FULL + nb]
    del full, fsca
    N, D = vec.shape
    log(f"slice: {N}x{D} ({nb} bases x 10 copies) backend={jax.default_backend()}")

    # ---- queries: perturbed rows (same recipe as bench_10m) ----
    rng = np.random.default_rng(0)
    q_rows = rng.choice(N, args.queries, replace=False)
    qv = vec[q_rows].astype(np.float32) * sca[q_rows][:, None]
    qv += 0.02 * rng.standard_normal(qv.shape).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    qdev = jnp.asarray(qv)

    # ---- exact oracle (blockwise) ----
    @jax.jit
    def scan_block(qs, blk8, bsc, base):
        s = jnp.dot(qs, blk8.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32) * bsc[None, :]
        vals, idx = jax.lax.top_k(s, args.k)
        return vals, idx + base

    t0 = time.perf_counter()
    best_v = np.full((args.queries, args.k), -1e30, np.float32)
    best_i = np.zeros((args.queries, args.k), np.int64)
    OB = 250_000
    for off in range(0, N, OB):
        hi = min(off + OB, N)
        v, i = jax.device_get(scan_block(
            qdev, jnp.asarray(vec[off:hi]), jnp.asarray(sca[off:hi]),
            jnp.int32(off)))
        allv = np.concatenate([best_v, v], axis=1)
        alli = np.concatenate([best_i, i], axis=1)
        top = np.argsort(-allv, axis=1)[:, :args.k]
        best_v = np.take_along_axis(allv, top, axis=1)
        best_i = np.take_along_axis(alli, top, axis=1)
    log(f"oracle: {time.perf_counter() - t0:.0f}s")
    oracle_sets = [set(map(int, r)) for r in best_i]
    # oracle score gap: top-10 floor vs crowd (rank-k value spread)
    log(f"oracle top1 mean {best_v[:, 0].mean():.4f} "
        f"top10 mean {best_v[:, -1].mean():.4f}")

    # ---- IVF build (host path, same as engine.ensure_ann) ----
    t0 = time.perf_counter()
    ivf = IVFIndex.build_host(vec, sca, nlist=args.nlist)
    log(f"ivf build_host: {time.perf_counter() - t0:.0f}s "
        f"(nlist {ivf.nlist}, pad {ivf.pad}, spill {ivf.spill_count})")

    # probe coverage: owning cell of each oracle row vs probed set
    members = np.asarray(ivf.members)
    mvalid = np.asarray(ivf.member_valid)
    cell_of = np.full(N, -1, np.int64)
    cc, ss = np.nonzero(mvalid > 0)
    cell_of[members[cc, ss]] = cc
    cents = np.asarray(ivf.centroids)
    cs = qv @ cents.T
    report = {"n": N, "nlist": ivf.nlist, "pad": ivf.pad,
              "spill": ivf.spill_count, "coverage": {}, "funnel": {}}
    for npx in (16, 64, 256, 1024):
        probe = np.argsort(-cs, axis=1)[:, :npx]
        cov = np.mean([
            np.mean([cell_of[r] in set(probe[i]) for r in oracle_sets[i]])
            for i in range(args.queries)])
        report["coverage"][npx] = round(float(cov), 4)
        log(f"probe coverage @nprobe {npx}: {cov:.4f}")

    # ---- PackedPQ funnel ----
    for m in filter(None, (args.m, args.m2 or None)):
        t0 = time.perf_counter()
        ppq = PackedPQ.from_ivf(ivf, vec, m=m, row_scales=sca)
        log(f"pq m={m} build: {time.perf_counter() - t0:.0f}s "
            f"codes {np.prod(ppq.codes.shape) / 1e6:.0f} MB")
        pen = jnp.zeros((N,), jnp.float32)
        entry = {}
        for W in (80, 256, 1024):
            vals, idx = pq_search_packed(ppq, qdev, pen, W, args.nprobe)
            idx = np.asarray(jax.device_get(idx))
            rec = np.mean([
                len(oracle_sets[i] & set(map(int, idx[i]))) / args.k
                for i in range(args.queries)])
            # timing (warm, W static so recompile per W — time the last)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(pq_search_packed(ppq, qdev, pen, W,
                                                args.nprobe)[0])
                ts.append(time.perf_counter() - t0)
            entry[W] = {"recall_at_10_in_topW": round(float(rec), 4),
                        "ms_per_batch": round(sorted(ts)[1] * 1e3, 1)}
            log(f"m={m} W={W}: funnel recall {rec:.4f} "
                f"scan {sorted(ts)[1] * 1e3:.0f} ms/batch{args.queries}")
        report["funnel"][f"m{m}"] = entry
        del ppq

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
