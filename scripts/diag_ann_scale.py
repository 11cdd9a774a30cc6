"""Stage-wise ANN diagnosis on the 10M bench substrate (sliced).

The round-3 10M run measured end-to-end recall@10 = 0.1656 vs the exact
oracle (BENCH run, 2026-08-18) after the same two-stage path validated
0.9875 at 20k — something breaks with SCALE, and the end-to-end number
can't say what. This script bisects the pipeline at a configurable N
(default 2.5M) with the SAME graded near-duplicate ladder structure
(every base row × 10 amplitude-graded copies, sliced copy-aligned from
the cached 10M corpus):

  stage 1  spill: how many rows the assignment failed to place in a
           real cluster (pre-fix: ~20% at 10M; these get garbage
           residual codes AND cost an always-probe of every slab)
  stage 2  routing: P(true top-10 row's owning cell ∈ the query's
           nprobe probe set)
  stage 3  ADC containment: P(true row ∈ ADC top-W) for W ∈ {80, 320}
  stage 4  two-stage recall@10: ADC top-W + exact re-rank (the serving
           shape, minus the hybrid engine around it)

Usage: python scripts/diag_ann_scale.py [--n 2500000] [--m 96]
       [--nlist 1024] [--nprobe 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_500_000)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--cache", default="/tmp/bench10m_vec_10000000.npy")
    ap.add_argument("--scales", default="/tmp/bench10m_sca_10000000.npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mobius_rag_tpu.index.ivf import IVFIndex
    from mobius_rag_tpu.ops.pq import PackedPQ, pq_search_packed

    K = 10
    full = np.load(args.cache, mmap_mode="r")
    sca_full = np.load(args.scales, mmap_mode="r")
    n10, d = full.shape
    t_copies = 10
    nb_full = n10 // t_copies
    nb = args.n // t_copies
    # copy-aligned slice: base rows [0, nb) from EACH copy block keeps
    # the exact 10-ladder structure at reduced base-row count
    t0 = time.perf_counter()
    vec = np.concatenate(
        [full[t * nb_full: t * nb_full + nb] for t in range(t_copies)])
    sca = np.concatenate(
        [sca_full[t * nb_full: t * nb_full + nb] for t in range(t_copies)])
    n = vec.shape[0]
    log(f"sliced corpus {n}×{d} ({vec.nbytes/1e9:.1f} GB) "
        f"in {time.perf_counter()-t0:.0f}s; backend={jax.default_backend()}")

    # --- build -----------------------------------------------------------
    t0 = time.perf_counter()
    ivf = IVFIndex.build_host(vec, sca, nlist=args.nlist, iters=10)
    t_ivf = time.perf_counter() - t0
    spill = ivf.spill_count
    mv = np.asarray(ivf.member_valid).sum(axis=1)
    log(f"IVF built {t_ivf:.0f}s: nlist={ivf.nlist} pad={ivf.pad} "
        f"spill={spill} ({spill/n:.2%}); occupancy min/mean/max = "
        f"{mv.min():.0f}/{mv.mean():.0f}/{mv.max():.0f}")

    t0 = time.perf_counter()
    ppq = PackedPQ.from_ivf(ivf, vec, m=args.m, row_scales=sca)
    t_pq = time.perf_counter() - t0
    log(f"PQ packed {t_pq:.0f}s: cells={ppq.nlist} (base {ppq.base_nlist}) "
        f"codes {np.prod(ppq.codes.shape)/1e9:.2f} GB")

    # owning cell per row (from the packed tables themselves)
    rowids = np.asarray(ppq.rowids)
    valid = np.asarray(ppq.valid) > 0
    own = np.full(n, -1, np.int64)
    cell_of = np.repeat(np.arange(ppq.nlist), ppq.pad).reshape(rowids.shape)
    own[rowids[valid]] = cell_of[valid]
    assert (own >= 0).all(), "some rows missing from packed tables"

    # --- queries + exact oracle (blockwise device scan) --------------------
    rng = np.random.default_rng(0)
    q_rows = rng.choice(n, args.queries, replace=False)
    qv = vec[q_rows].astype(np.float32) * sca[q_rows][:, None]
    qv += 0.02 * rng.standard_normal(qv.shape).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    qdev = jnp.asarray(qv)

    @jax.jit
    def scan_block(qs, blk8, bsc, base):
        s = jnp.dot(qs, blk8.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32) * bsc[None, :]
        vals, idx = jax.lax.top_k(s, K)
        return vals, idx + base

    t0 = time.perf_counter()
    best_v = np.full((args.queries, K), -1e30, np.float32)
    best_i = np.zeros((args.queries, K), np.int64)
    OB = 250_000
    for off in range(0, n, OB):
        hi = min(off + OB, n)
        v, i = jax.device_get(scan_block(
            qdev, jnp.asarray(vec[off:hi]), jnp.asarray(sca[off:hi]),
            jnp.int32(off)))
        allv = np.concatenate([best_v, v], axis=1)
        alli = np.concatenate([best_i, i], axis=1)
        top = np.argsort(-allv, axis=1)[:, :K]
        best_v = np.take_along_axis(allv, top, axis=1)
        best_i = np.take_along_axis(alli, top, axis=1)
    log(f"exact oracle: {time.perf_counter()-t0:.0f}s")

    # --- stage 2: routing ---------------------------------------------------
    cents = np.asarray(ppq.centroids)
    cs = qv @ cents[: ppq.base_nlist].T
    order = np.argsort(-cs, axis=1)[:, : args.nprobe]
    probe_sets = [set(row.tolist()) for row in order]
    if ppq.nlist > ppq.base_nlist:  # spill slabs always probed
        slabs = set(range(ppq.base_nlist, ppq.nlist))
        probe_sets = [p | slabs for p in probe_sets]
    routed = np.mean([
        np.mean([own[r] in probe_sets[i] for r in best_i[i]])
        for i in range(args.queries)])
    log(f"stage 2 routing recall (owning cell probed, nprobe="
        f"{args.nprobe}): {routed:.4f}")

    # --- stage 3/4: ADC containment + two-stage recall ----------------------
    pen = jnp.zeros((n,), jnp.float32)
    out = {"n": n, "m": args.m, "nlist": args.nlist, "nprobe": args.nprobe,
           "spill": int(spill), "spill_frac": round(spill / n, 4),
           "routing_recall": round(float(routed), 4),
           "occupancy": {"min": int(mv.min()), "mean": float(mv.mean()),
                         "max": int(mv.max())}}
    for w in (80, 320):
        vals, idx = jax.device_get(
            pq_search_packed(ppq, qdev, pen, w, args.nprobe))
        cont = np.mean([
            len(set(map(int, best_i[i])) & set(map(int, idx[i]))) / K
            for i in range(args.queries)])
        # exact re-rank of the window (host gather, f32)
        rec = []
        for i in range(args.queries):
            cand = idx[i]
            cv = vec[cand].astype(np.float32) * sca[cand][:, None]
            s = cv @ qv[i]
            top = cand[np.argsort(-s)[:K]]
            rec.append(len(set(map(int, best_i[i])) & set(map(int, top))) / K)
        log(f"stage 3/4 W={w}: ADC containment {cont:.4f}, "
            f"two-stage recall@10 {np.mean(rec):.4f}")
        out[f"w{w}"] = {"adc_containment": round(float(cont), 4),
                        "two_stage_recall": round(float(np.mean(rec)), 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
