"""Dissect the candidate-signal + fusion cost of the config-5 program.

diag_host_funnel --stages attributed the 2M device time as: arm scans
~140 ms but `arms` (scans + candidate_signals + stack) 303 ms and the
full program 511 ms — i.e. ~370 ms in candidate-space work (signal
gathers, fusion, packing) that touches only [B, ~1k] data and should
cost single-digit ms. This script times each piece in isolation on the
same corpus shape to find the pathological lowering.

Usage: PYTHONPATH=... python scripts/diag_sig_stages.py [--n 2000000]
"""
from __future__ import annotations

import argparse
import functools as ft
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    host_vec = np.array(np.load(cvec, mmap_mode="r")[:N])
    host_sca = np.array(np.load(csca, mmap_mode="r")[:N])
    qv = np.load("/tmp/ann_curve_queries.npy")[:B].astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)

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
    log("bulk_load done")

    engine = SearchEngine(store, lexicon)
    ann = engine.ensure_ann()
    log("ann ready")

    reqs = [QueryRequest(query=f"timely filing for {payers[i % 3]} claims",
                         embedding=qv[i % len(qv)], tag_mode="none")
            for i in range(B)]
    engine.search(reqs, k=K)  # warm the production program
    q, exps = engine.prepare_batch(reqs)
    index = store.index
    nprobe = engine.effective_nprobe
    kd = engine._device_k(K)          # 80
    fw = engine._device_funnel(K)     # 1024
    m_fuse = min(K * cfg.over_fetch, N)

    def timed(f, iters=5):
        jax.device_get(jax.tree.leaves(f())[0].ravel()[:1])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.leaves(f())[0].ravel()[:1])
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[len(ts) // 2] * 1e3, 1)

    res = {}

    # fixed candidate ids in funnel range, and a materialized lex_raw
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=(B, fw), dtype=np.int64)
    idx = jnp.asarray(idx_np)
    qdev = {key: jnp.asarray(v) for key, v in q.items()}
    qdev["vec"] = qdev["vec"].astype(jnp.float32)

    @jax.jit
    def mk_lex_raw(ix, qq):
        return eng.lexical_raw(ix, qq)

    lex_raw = mk_lex_raw(index, qdev)
    jax.device_get(lex_raw[:1, :1])

    # -- A. candidate_signals in isolation and by piece --
    @jax.jit
    def sig_full(ix, qq, cand):
        a, l, j, c = eng.candidate_signals(ix, qq, cand)
        return a.sum() + l.sum() + j.sum() + c.sum()

    res["sig_full_1024"] = timed(lambda: sig_full(index, qdev, idx))

    @jax.jit
    def sig_scalar_gathers(ix, cand):
        return (jnp.take(ix.authority, cand, axis=0).sum()
                + jnp.take(ix.length_score, cand, axis=0).sum())

    res["sig_scalar_gathers"] = timed(lambda: sig_scalar_gathers(index, idx))

    @jax.jit
    def sig_jpd(ix, qq, cand):
        cand_dbits = jnp.take(ix.d_tags, cand, axis=0)
        inter = (cand_dbits & qq["d_bits"][:, None, :]).astype(jnp.uint32)
        x = inter
        x = x - ((x >> 1) & jnp.uint32(0x55555555))
        x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
        x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
        return (((x * jnp.uint32(0x01010101)) >> 24)
                .sum(axis=-1).astype(jnp.float32).sum())

    res["sig_jpd"] = timed(lambda: sig_jpd(index, qdev, idx))

    @jax.jit
    def sig_cov(ix, qq, cand):
        cand_pbits = jnp.take(ix.phrase_bits, cand, axis=0)
        cand_jbits = jnp.take(ix.j_tags, cand, axis=0)
        s_word = qq["slot_word"][:, None, :]
        s_bit = qq["slot_bit"][:, None, :]

        def test_bits(bits, word, bit):
            w = jnp.take_along_axis(bits, word.repeat(bits.shape[1], 1), axis=2)
            return ((w >> bit.astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.float32)

        pp = test_bits(cand_pbits, s_word, s_bit)
        jj = test_bits(cand_jbits, qq["slot_jword"][:, None, :],
                       qq["slot_jbit"][:, None, :])
        return pp.sum() + jj.sum()

    res["sig_cov_bittests"] = timed(lambda: sig_cov(index, qdev, idx))

    # -- B. the [B, C] lexical gather --
    @jax.jit
    def lex_gather(lr, cand):
        return jnp.take_along_axis(lr, cand, axis=1).sum()

    res["lex_raw_gather_1024"] = timed(lambda: lex_gather(lex_raw, idx))

    # -- C. arm_candidates with signals stubbed to zeros --
    real_signals = eng.candidate_signals

    def zero_signals(index_, qq, cand):
        z = jnp.zeros(cand.shape, jnp.float32)
        return z, z, z, z

    eng.candidate_signals = zero_signals

    @jax.jit
    def arms_nosig(ix, qq, ann_):
        vals, gidx, sigs, st = eng.arm_candidates(
            ix, qq, K, fw, m_other=m_fuse, ann=ann_, nprobe=nprobe)
        return vals.sum() + gidx.sum() + sigs.sum() + st.sum()

    res["arms_nosig"] = timed(lambda: arms_nosig(index, qdev, ann))
    eng.candidate_signals = real_signals

    @jax.jit
    def arms_full(ix, qq, ann_):
        vals, gidx, sigs, st = eng.arm_candidates(
            ix, qq, K, fw, m_other=m_fuse, ann=ann_, nprobe=nprobe)
        return vals.sum() + gidx.sum() + sigs.sum() + st.sum()

    res["arms_full"] = timed(lambda: arms_full(index, qdev, ann))

    # -- D. fusion + pack on fixed arm outputs --
    @jax.jit
    def arms_out(ix, qq, ann_):
        return eng.arm_candidates(ix, qq, K, fw, m_other=m_fuse,
                                  ann=ann_, nprobe=nprobe)

    vals, gidx, sigs, st = arms_out(index, qdev, ann)
    jax.device_get(vals[:1, :1, :1])

    @jax.jit
    def fuse_only(v, g, s, qq):
        out = eng.fuse_and_rerank(v[:, None], g[:, None], s[:, None],
                                  qq, K, cfg.rrf_k, m_fuse)
        return out["rerank"].sum()

    res["fuse_only"] = timed(lambda: fuse_only(vals, gidx, sigs, qdev))

    @jax.jit
    def fuse_pack(v, g, s, st_, qq):
        out = eng.fuse_and_rerank(v[:, None], g[:, None], s[:, None],
                                  qq, K, cfg.rrf_k, m_fuse)
        out.update({
            "vec_idx": g[0][:, : K * 2], "vec_vals": v[0][:, : K * 2],
            "lex_idx": g[1][:, : K * 2], "lex_vals": v[1][:, : K * 2],
            "dtag_idx": g[2][:, : K * 2], "dtag_vals": v[2][:, : K * 2],
            "strict_count": st_[:, 0],
        })
        out.update(eng.wide_outputs(v, g, s, fw))
        return eng.pack_out(out, kd, fw)

    res["fuse_pack_wide"] = timed(lambda: fuse_pack(vals, gidx, sigs, st, qdev))

    # -- E. full program cross-checks --
    res["full_w1024"] = timed(lambda: eng._search_compiled(
        index, qdev, kd, cfg.over_fetch, cfg.rrf_k, ann, nprobe, fw))
    res["full_w0_k80"] = timed(lambda: eng._search_compiled(
        index, qdev, kd, cfg.over_fetch, cfg.rrf_k, ann, nprobe, 0))

    # -- F. bisect INSIDE one program: rebuild _search_compiled in
    # stages, each its own jit, all returning a scalar — the first
    # variant whose cost jumps owns the full-program overhead.
    def staged(ix, qq, ann_, upto):
        qq = dict(qq, vec=qq["vec"].astype(jnp.float32))
        vals, gidx, sigs, st = eng.arm_candidates(
            ix, qq, K, fw, m_other=m_fuse, ann=ann_, nprobe=nprobe)
        vals, gidx, sigs, st = jax.lax.optimization_barrier(
            (vals, gidx, sigs, st))
        if upto == "barrier":
            return vals.sum() + gidx.sum() + sigs.sum() + st.sum()
        out = eng.fuse_and_rerank(vals[:, None], gidx[:, None],
                                  sigs[:, None], qq, K, cfg.rrf_k, m_fuse)
        if upto == "fused":
            return sum(v.sum() for v in out.values())
        out.update({
            "vec_idx": gidx[0][:, : kd * 2], "vec_vals": vals[0][:, : kd * 2],
            "lex_idx": gidx[1][:, : kd * 2], "lex_vals": vals[1][:, : kd * 2],
            "dtag_idx": gidx[2][:, : kd * 2],
            "dtag_vals": vals[2][:, : kd * 2],
            "strict_count": st[:, 0],
        })
        out.update(eng.wide_outputs(vals, gidx, sigs, fw))
        if upto == "wide":
            return sum(v.sum() for v in out.values())
        pf, pi = eng.pack_out(out, kd, fw)
        if upto == "packed_sum":
            return pf.sum() + pi.sum()
        return pf, pi  # full arrays out (the real program shape)

    staged_j = jax.jit(staged, static_argnames=("upto",))
    for upto in ("barrier", "fused", "wide", "packed_sum", "arrays"):
        res[f"staged_{upto}"] = timed(
            lambda u=upto: staged_j(index, qdev, ann, u))

    # -- G. proj scan alone: exact vs approx final top-k --
    from mobius_rag_tpu.ops.proj import proj_search_packed
    pen0 = jnp.zeros((B, N), jnp.float32)

    @ft.partial(jax.jit, static_argnames=("approx",))
    def proj_only(ann_, qq, pen, approx):
        v, i = proj_search_packed(ann_, qq["vec"].astype(jnp.float32),
                                  pen, fw, nprobe, approx)
        return v.sum() + i.sum()

    res["proj_w1024_exact"] = timed(lambda: proj_only(ann, qdev, pen0, 0.0))
    try:
        res["proj_w1024_approx95"] = timed(
            lambda: proj_only(ann, qdev, pen0, 0.95))
    except Exception as e:  # approx_max_k unsupported on this backend?
        res["proj_w1024_approx95"] = f"ERROR {type(e).__name__}: {e}"[:200]

    log(json.dumps(res))
    print(json.dumps({"metric": f"diag_sig_stages_{N}", **res}))
    with open(f"/root/repo/eval_artifacts/DIAG_sig_stages_{N}.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
