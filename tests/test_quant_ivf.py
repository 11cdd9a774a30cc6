"""Quantized scan + IVF recall/parity tests (small-scale, CPU)."""
import numpy as np
import pytest

from mobius_rag_tpu.index.ivf import IVFIndex, ivf_search
from mobius_rag_tpu.ops.quant import cosine_topk_int8, quantize_rows
from mobius_rag_tpu.ops.topk import NEG_INF, cosine_topk_xla


def _corpus(rng, n=4000, d=256, n_clusters=32, noise=0.02):
    # Clustered corpus. Note the per-dim noise scale: a unit-norm center
    # plus noise*N(0, I_d) has noise NORM noise*sqrt(d), so noise must be
    # << 1/sqrt(d)-ish for cluster structure to survive in high dim —
    # with noise=0.3 the data is effectively uniform and IVF (or any ANN)
    # legitimately needs near-exhaustive probing.
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    v = centers[assign] + noise * rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _recall(idx_a, idx_b, k):
    return np.mean([
        len(set(map(int, a[:k])) & set(map(int, b[:k]))) / k
        for a, b in zip(np.asarray(idx_a), np.asarray(idx_b))
    ])


def test_int8_quantization_roundtrip(rng):
    v = rng.standard_normal((100, 256)).astype(np.float32)
    q, scale = quantize_rows(v)
    deq = np.asarray(q, np.float32) * np.asarray(scale)[:, None]
    rel = np.abs(deq - v).max() / np.abs(v).max()
    assert rel < 0.01
    assert np.asarray(q).dtype == np.int8


def test_int8_topk_recall(rng):
    # moderate structure: int8's ~0.8% relative error must not reorder
    # top-10 when neighbor margins are realistic (not the degenerate
    # all-neighbors-at-sim-0.999 regime)
    v = _corpus(rng, noise=0.1)
    q = v[rng.choice(len(v), 16)] + 0.1 * rng.standard_normal((16, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_xla(v, q, pen, 10)
    qv, scale = quantize_rows(v)
    _, idx8 = cosine_topk_int8(qv, scale, q, pen, 10)
    assert _recall(exact, idx8, 10) >= 0.97


def test_int8_respects_penalty(rng):
    v = _corpus(rng, n=500)
    qv, scale = quantize_rows(v)
    q = v[:2]
    pen = np.zeros(len(v), np.float32)
    pen[100:] = NEG_INF
    vals, idx = cosine_topk_int8(qv, scale, q, pen, 5)
    assert (np.asarray(idx) < 100).all()


def test_ivf_build_covers_all_live_rows(rng):
    v = _corpus(rng, n=2000)
    valid = np.ones(len(v), np.float32)
    valid[::7] = 0.0
    ivf = IVFIndex.build(v, valid, nlist=32, iters=5)
    covered = set()
    m = np.asarray(ivf.members)
    mv = np.asarray(ivf.member_valid)
    for c in range(ivf.nlist):
        covered.update(m[c][mv[c] > 0].tolist())
    covered.update(np.asarray(ivf.spill)[np.asarray(ivf.spill_valid) > 0].tolist())
    live = set(np.flatnonzero(valid > 0).tolist())
    assert covered == live  # padding + spill never drop a live row


def test_ivf_recall_vs_exact(rng):
    v = _corpus(rng, n=4000)
    ivf = IVFIndex.build(v, nlist=64, iters=8)
    q = v[rng.choice(len(v), 16)] + 0.01 * rng.standard_normal((16, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_xla(v, q, pen, 10)
    _, probed = ivf_search(ivf, v, q, pen, 10, nprobe=8)
    r = _recall(exact, probed, 10)
    assert r >= 0.9, f"IVF recall {r}"
    # more probes → monotonically better (or equal) recall
    _, probed16 = ivf_search(ivf, v, q, pen, 10, nprobe=16)
    assert _recall(exact, probed16, 10) >= r - 0.02


def test_packed_ivf_matches_row_gather_ivf(rng):
    from mobius_rag_tpu.index.ivf import PackedIVF, ivf_search_packed

    v = _corpus(rng, n=3000)
    # small pad factor + single-choice assignment to force spill rows
    # into synthetic clusters (choices=1 disables the capacity cascade)
    ivf = IVFIndex.build(v, nlist=32, iters=6, pad_factor=1.1, choices=1)
    assert ivf.spill_count > 0, "test needs spill to exercise the fold-in"
    pivf = PackedIVF.from_ivf(ivf, v)
    assert pivf.nlist > ivf.nlist  # synthetic spill clusters exist

    q = v[rng.choice(len(v), 8)] + 0.01 * rng.standard_normal((8, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_xla(v, q, pen, 10)
    _, packed = ivf_search_packed(pivf, q, pen, 10, nprobe=10)
    r = _recall(exact, packed, 10)
    assert r >= 0.85, f"packed IVF recall {r}"

    # filter penalty respected through the packed layout
    pen2 = np.full(len(v), NEG_INF, np.float32)
    allowed = np.arange(0, 3000, 5)
    pen2[allowed] = 0.0
    vals, idx = ivf_search_packed(pivf, q, pen2, 10, nprobe=10)
    live = np.asarray(vals) > NEG_INF / 2
    assert np.isin(np.asarray(idx)[live], allowed).all()


def test_packed_ivf_from_int8_source_needs_row_scales(rng):
    # regression: packing an ALREADY-int8 matrix without its per-row
    # scales reweights ranking by 1/maxabs (recall collapsed to ~0.2 at
    # 200k before the fix)
    from mobius_rag_tpu.index.ivf import PackedIVF, ivf_search_packed
    from mobius_rag_tpu.ops.quant import cosine_topk_int8, quantize_rows

    v = _corpus(rng, n=3000, noise=0.05)
    v8, s8 = quantize_rows(v)
    q = v[rng.choice(len(v), 8)] + 0.01 * rng.standard_normal((8, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_int8(v8, s8, q, pen, 10)
    ivf = IVFIndex.build(v8, nlist=32, iters=6)
    pivf = PackedIVF.from_ivf(ivf, v8, row_scales=s8)
    _, idx = ivf_search_packed(pivf, q, pen, 10, nprobe=10)
    assert _recall(exact, idx, 10) >= 0.9


def test_ivf_respects_filter_penalty(rng):
    v = _corpus(rng, n=1000)
    ivf = IVFIndex.build(v, nlist=16, iters=5)
    q = v[:3]
    pen = np.full(len(v), NEG_INF, np.float32)
    allowed = np.arange(0, 1000, 3)
    pen[allowed] = 0.0
    vals, idx = ivf_search(ivf, v, q, pen, 10, nprobe=8)
    live = np.asarray(vals) > NEG_INF / 2
    assert np.isin(np.asarray(idx)[live], allowed).all()


def test_calibrate_nprobe_meets_target():
    """Auto-nprobe: smallest ladder value whose recall@k clears the
    floor on a clustered corpus; curve recorded; full probe = recall 1."""
    import jax
    import jax.numpy as jnp

    from mobius_rag_tpu.index.ivf import IVFIndex, calibrate_nprobe

    rng = np.random.default_rng(0)
    n, d, ncent = 20_000, 128, 256
    centers = rng.standard_normal((ncent, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, ncent, n)] + \
        0.05 * rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vecs = jnp.asarray(v)
    ivf = IVFIndex.build(vecs, nlist=128)
    q = v[rng.choice(n, 16, replace=False)] + \
        0.02 * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    cal = calibrate_nprobe(ivf, vecs, q, k=10, target_recall=0.95)
    assert cal["nprobe"] <= 128
    chosen = next(p for p in cal["curve"] if p["nprobe"] == cal["nprobe"])
    assert chosen["recall"] >= 0.95
    # recall grows (weakly) with nprobe
    recalls = [p["recall"] for p in cal["curve"]]
    assert recalls[-1] >= recalls[0]


def test_engine_auto_nprobe(tmp_path):
    """MRAG_IVF_TARGET_RECALL wires calibration into ensure_ann: the
    engine serves with the calibrated nprobe, not the static default."""
    import dataclasses

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=150))
    cfg = dataclasses.replace(get_config(), vector_backend="ivf",
                              ivf_target_recall=0.95, ivf_nprobe=1)
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    res = eng.search(QueryRequest(query="timely filing deadline"), k=5)[0]
    assert res.hits
    cal = getattr(eng, "_ann_calibration", None)
    assert cal and cal["nprobe"] == eng.effective_nprobe
    assert cal["curve"][0]["nprobe"] >= 1
    # the calibrated probe ignores the (deliberately bad) static nprobe=1
    assert eng.effective_nprobe > 1 or cal["curve"][0]["recall"] >= 0.95
    # no telemetry attached: sample is self-queries only
    assert cal["logged_queries"] == 0


def test_auto_nprobe_uses_logged_queries(tmp_path):
    """With a telemetry store attached, auto-nprobe calibrates on recent
    logged production queries mixed with self-queries (round-3 gap:
    calibration ran on perturbed corpus rows only)."""
    import dataclasses

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.observability import TelemetryStore
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=150))
    tel = TelemetryStore(path=str(tmp_path / "tel.sqlite"))
    for q in ("timely filing deadline for sunshine health",
              "prior authorization for dme",
              "molina eligibility verification"):
        tel.record_search_event(query=q, mode="corpus", timings={},
                                arms={}, expansion=[], results=[])
    tel.flush()
    cfg = dataclasses.replace(get_config(), vector_backend="ivf",
                              ivf_target_recall=0.95, ivf_nprobe=1)
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed,
                       telemetry=tel)
    res = eng.search(QueryRequest(query="timely filing deadline"), k=5)[0]
    assert res.hits
    cal = eng._ann_calibration
    assert cal["logged_queries"] == 3
    assert cal["nprobe"] == eng.effective_nprobe


def test_ann_persistence_roundtrip(tmp_path, monkeypatch):
    """save_ann/load_ann (index/ann_io.py): a restored engine reloads the
    tables instead of re-running k-means — the reference's
    HNSW-persists-in-Postgres durability. Identical probe results, loud
    refusal on backend/row mismatch."""
    import dataclasses

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=150))
    cfg = dataclasses.replace(get_config(), vector_backend="ivf")
    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    req = QueryRequest(query="timely filing deadline")
    before = [h.chunk_id for h in eng.search(req, k=5)[0].hits]

    ann_path = str(tmp_path / "ann.npz")
    meta = eng.save_ann(ann_path)
    assert meta["backend"] == "ivf" and meta["rows"] == len(store.records)

    # fresh engine over the same store: loading must NOT rebuild
    import mobius_rag_tpu.index.ivf as ivf_mod

    eng2 = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    monkeypatch.setattr(
        ivf_mod.IVFIndex, "build",
        classmethod(lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("k-means re-ran despite persisted tables"))))
    eng2.load_ann(ann_path)
    after = [h.chunk_id for h in eng2.search(req, k=5)[0].hits]
    assert after == before

    # refusals: wrong backend / wrong row count
    pq_cfg = dataclasses.replace(cfg, vector_backend="pq")
    eng_pq = SearchEngine(store, lex, cfg=pq_cfg, embed_fn=hash_embed)
    with pytest.raises(ValueError, match="backend"):
        eng_pq.load_ann(ann_path)
    monkeypatch.undo()
    small = ChunkStore()
    small.add_chunks(toy_corpus(lex))
    eng3 = SearchEngine(small, lex, cfg=cfg, embed_fn=hash_embed)
    with pytest.raises(ValueError, match="rows"):
        eng3.load_ann(ann_path)

    # packed + pq tables round-trip through the same writer
    for backend in ("packed", "pq"):
        bcfg = dataclasses.replace(get_config(), vector_backend=backend)
        be = SearchEngine(store, lex, cfg=bcfg, embed_fn=hash_embed)
        b_before = [h.chunk_id for h in be.search(req, k=5)[0].hits]
        p = str(tmp_path / f"ann_{backend}.npz")
        be.save_ann(p)
        be2 = SearchEngine(store, lex, cfg=bcfg, embed_fn=hash_embed)
        be2.load_ann(p)
        assert [h.chunk_id for h in be2.search(req, k=5)[0].hits] == b_before


def test_capacity_assign_respects_cap_and_preference():
    from mobius_rag_tpu.index.ivf import _capacity_assign

    # 6 rows all prefer cluster 0 (cap 2); affinities make rows 0,1 the
    # winners; the rest cascade to their 2nd choice (cluster 1, cap 2)
    # then 3rd (cluster 2); one row exhausts its choices → -1
    choice_idx = np.array([[0, 1], [0, 1], [0, 1], [0, 1], [0, 2], [0, 2]])
    choice_val = np.array([[9, 5], [8, 5], [7, 5], [6, 5], [5, 4], [4, 3]],
                          np.float32)
    cells = _capacity_assign(choice_idx, choice_val, nlist=3, cap=2)
    assert cells[0] == 0 and cells[1] == 0  # best affinity wins the slot
    counts = np.bincount(cells[cells >= 0], minlength=3)
    assert (counts <= 2).all()
    assert (cells == -1).sum() == 0  # 6 rows, capacity 3*2 and choices fit
    # rows 2,3 land in cluster 1; rows 4,5 in cluster 2
    assert set(cells[2:4]) == {1} and set(cells[4:6]) == {2}


def test_capacity_assign_leftover_goes_negative():
    from mobius_rag_tpu.index.ivf import _capacity_assign

    choice_idx = np.zeros((5, 1), np.int64)  # everyone wants cluster 0
    choice_val = np.arange(5, 0, -1, dtype=np.float32)[:, None]
    cells = _capacity_assign(choice_idx, choice_val, nlist=1, cap=3)
    assert (cells >= 0).sum() == 3 and (cells == -1).sum() == 2
    assert set(np.flatnonzero(cells >= 0)) == {0, 1, 2}  # top affinity


def test_skewed_corpus_no_spill_with_capacity_assign(rng):
    """The 10M failure mode in miniature: a mega-cluster overflowing its
    pad. Raw argmax spills ~half the hot rows into synthetic slabs whose
    residual-PQ codes are garbage; the capacity cascade places every row
    in a REAL nearby cluster instead — zero spill, full-probe parity."""
    from mobius_rag_tpu.index.ivf import ivf_search

    d = 128
    hot = rng.standard_normal(d).astype(np.float32)
    hot /= np.linalg.norm(hot)
    # 70% of rows in one tight mode, the rest spread over 15 modes
    n_hot, n_cold = 1400, 600
    v_hot = hot[None] + 0.03 * rng.standard_normal((n_hot, d)).astype(np.float32)
    cold_centers = rng.standard_normal((15, d)).astype(np.float32)
    cold_centers /= np.linalg.norm(cold_centers, axis=1, keepdims=True)
    v_cold = cold_centers[rng.integers(0, 15, n_cold)] + \
        0.03 * rng.standard_normal((n_cold, d)).astype(np.float32)
    v = np.concatenate([v_hot, v_cold])
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    ivf = IVFIndex.build(v, nlist=16, iters=8, pad_factor=2.0)
    assert ivf.spill_count == 0, \
        f"capacity cascade left {ivf.spill_count} rows in spill"

    q = v[rng.choice(len(v), 16)] + 0.01 * rng.standard_normal(
        (16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_xla(v, q, pen, 10)
    _, probed = ivf_search(ivf, v, q, pen, 10, nprobe=16)  # full probe
    assert _recall(exact, probed, 10) == 1.0
    # half probe still strong: the mega-mode occupies several adjacent
    # cells, all of which rank high for a near-mode query
    _, probed8 = ivf_search(ivf, v, q, pen, 10, nprobe=8)
    assert _recall(exact, probed8, 10) >= 0.9


def test_skewed_corpus_pq_recall_with_capacity_assign(rng):
    """End-to-end ADC recall on the skewed substrate: residual codes of
    capacity-assigned rows quantize small residuals, so two-stage
    (ADC → exact re-rank window) recall holds."""
    from mobius_rag_tpu.ops.pq import PackedPQ, pq_search_packed

    d = 128
    hot = rng.standard_normal(d).astype(np.float32)
    hot /= np.linalg.norm(hot)
    v_hot = hot[None] + 0.03 * rng.standard_normal((1400, d)).astype(np.float32)
    cold = rng.standard_normal((15, d)).astype(np.float32)
    cold /= np.linalg.norm(cold, axis=1, keepdims=True)
    v_cold = cold[rng.integers(0, 15, 600)] + \
        0.03 * rng.standard_normal((600, d)).astype(np.float32)
    v = np.concatenate([v_hot, v_cold])
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    ivf = IVFIndex.build(v, nlist=16, iters=8)
    assert ivf.spill_count == 0
    # byte budget matters on near-tie ladders: measured containment at
    # window 80 is m=16: 0.77 / m=32: 0.93 / m=64: 1.00 — the re-rank
    # window only repairs what the ADC ranks into it
    ppq = PackedPQ.from_ivf(ivf, v, m=64, iters=8)
    q = v[rng.choice(len(v), 16)] + 0.01 * rng.standard_normal(
        (16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pen = np.zeros(len(v), np.float32)
    _, exact = cosine_topk_xla(v, q, pen, 10)
    # ADC top-80 window must contain the true top-10 (the two-stage
    # re-rank repairs ordering inside the window)
    _, adc = pq_search_packed(ppq, q, pen, 80, nprobe=16)
    cont = np.mean([
        len(set(map(int, e[:10])) & set(map(int, a))) / 10
        for e, a in zip(np.asarray(exact), np.asarray(adc))])
    assert cont >= 0.95, f"ADC window containment {cont}"
