"""Host vector residency (config 5, the 10M codes-only regime): HBM
holds PQ codes only; int8 rows live in host RAM and serve the
post-fusion exact re-rank."""
import dataclasses

import numpy as np
import pytest

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore
from mobius_rag_tpu.ingest.featurize import featurize_chunk
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


def _host_cfg(**kw):
    return dataclasses.replace(
        get_config(), vector_residency="host", vector_dtype="int8",
        vector_backend="pq", ivf_nprobe=10 ** 6, **kw)


@pytest.fixture(scope="module")
def stores():
    lex = sample_lexicon()
    dev_store = ChunkStore()
    dev_store.add_chunks(toy_corpus(lex, pad_docs=120))
    host_store = ChunkStore(_host_cfg())
    host_store.add_chunks(toy_corpus(lex, pad_docs=120))
    return lex, dev_store, host_store


def test_config_validation():
    bad = dataclasses.replace(get_config(), vector_residency="host",
                              vector_backend="exact")
    assert any("RESIDENCY" in p for p in bad.validate())


def test_host_store_shape(stores):
    lex, dev_store, host_store = stores
    assert host_store.index.vectors.shape[0] == 0
    assert host_store.host_vectors is not None
    assert host_store.host_vectors.shape[0] == host_store.capacity
    assert host_store.capacity >= host_store.size
    # quantized rows present for live records
    assert np.abs(host_store.host_vectors[:host_store.size]).max() > 0


def test_host_residency_search_matches_dense(stores):
    """Full-probe PQ + host exact re-rank must track the dense engine's
    hybrid top-k closely on the toy corpus."""
    lex, dev_store, host_store = stores
    dense = SearchEngine(dev_store, lex, embed_fn=hash_embed)
    hosty = SearchEngine(host_store, lex, cfg=host_store.cfg,
                         embed_fn=hash_embed)
    queries = [
        QueryRequest(query="What is the timely filing deadline for Sunshine "
                           "Health FL Medicaid claims?"),
        QueryRequest(query="prior authorization for durable medical equipment"),
        QueryRequest(query="molina eligibility verification", payer="molina"),
    ]
    recalls = []
    for q in queries:
        a = dense.search(q, k=8)[0]
        b = hosty.search(q, k=8)[0]
        assert b.hits, q.query
        ia = {h.chunk_id for h in a.hits}
        ib = {h.chunk_id for h in b.hits}
        recalls.append(len(ia & ib) / max(len(ia), 1))
        # host re-rank recomputed exact cosine: top hit's similarity is
        # a real cosine, not an ADC approximation artifact
        assert -1.01 <= b.hits[0].signals["cosine"] <= 1.01
    assert float(np.mean(recalls)) >= 0.8, recalls


def test_host_residency_republish_and_recycle(stores):
    lex, _, _ = stores
    store = ChunkStore(_host_cfg())
    store.add_chunks(toy_corpus(lex, pad_docs=32))
    eng = SearchEngine(store, lex, cfg=store.cfg, embed_fn=hash_embed)
    text = "Zugzwang rider reimburses chess clock repair within 90 days."
    rec = featurize_chunk(ChunkRecord(
        chunk_id="z-c0", doc_id="z_doc", text=text,
        embedding=hash_embed([text])[0]), lex)
    row0 = store.publish_document("z_doc", [rec])[0]
    r = eng.search(QueryRequest(query="zugzwang chess clock repair"), k=5)[0]
    assert any(h.doc_id == "z_doc" for h in r.hits)
    # republish recycles the freed row AND overwrites its host payload
    text2 = "Quodlibet benefit covers improvised organ recitals only."
    rec2 = featurize_chunk(ChunkRecord(
        chunk_id="z-c1", doc_id="z_doc", text=text2,
        embedding=hash_embed([text2])[0]), lex)
    row1 = store.publish_document("z_doc", [rec2])[0]
    assert row1 == row0
    r2 = eng.search(QueryRequest(query="quodlibet organ recitals"), k=5)[0]
    assert r2.hits and r2.hits[0].chunk_id == "z-c1"
    stale = eng.search(QueryRequest(query="zugzwang chess clock repair"), k=5)[0]
    assert not any(h.chunk_id == "z-c0" for h in stale.hits)


def test_host_residency_bulk_load(stores):
    lex, _, _ = stores
    recs = toy_corpus(lex, pad_docs=40)
    vecs = np.stack([np.asarray(r.embedding, np.float32)
                     / max(np.linalg.norm(r.embedding), 1e-9) for r in recs])
    store = ChunkStore(_host_cfg())
    store.bulk_load(recs, vectors=vecs)
    assert store.index.vectors.shape[0] == 0
    eng = SearchEngine(store, lex, cfg=store.cfg, embed_fn=hash_embed)
    r = eng.search(QueryRequest(query="timely filing deadline"), k=5)[0]
    assert r.hits


def test_two_stage_recall_on_graded_neardups():
    """End-to-end recall of the codes-only two-stage path (PQ candidate
    generation → native host exact re-rank) on a graded-near-duplicate
    corpus — the realistic republished-revision geometry where recall is
    meaningfully achievable (an iid-noise corpus puts hundreds of rows at
    near-identical distance: rank-k near-ties no approximate method can
    resolve). Mirrors bench_10m's methodology at test scale: constant
    authority, empty-text queries (dead lexical/d-tag arms), recall vs
    the exact scan over the store's own dequantized int8 rows."""
    import dataclasses

    rng = np.random.default_rng(3)
    nb, T, dim = 300, 4, int(get_config().embed_dim)
    base = rng.standard_normal((nb, dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    recs = []
    for t, eps in enumerate((0.0, 0.05, 0.12, 0.25)):
        v = base + eps * rng.standard_normal((nb, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        for i in range(nb):
            recs.append(ChunkRecord(
                chunk_id=f"g{t}-{i}", doc_id=f"gd{i}", text=f"row {t} {i}",
                embedding=v[i], authority_level=0))
    cfg = dataclasses.replace(
        get_config(), vector_residency="host", vector_dtype="int8",
        vector_backend="pq", ivf_nprobe=10 ** 6, over_fetch=8)
    store = ChunkStore(cfg)
    store.add_chunks(recs)
    eng = SearchEngine(store, sample_lexicon(), cfg=cfg,
                       embed_fn=hash_embed)
    k = 8
    q_rows = rng.choice(nb, 16, replace=False)
    qv = base[q_rows] + 0.02 * rng.standard_normal(
        (16, dim)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    # oracle over the exact int8+scales the host re-rank serves
    hv = store.host_vectors[:store.size].astype(np.float32) \
        * store.host_scales[:store.size][:, None]
    scores = qv @ hv.T
    oracle = np.argsort(-scores, axis=1)[:, :k]
    # mode="recall": keep every scored hit (the corpus-mode confidence
    # floor drops the lower-cosine tail of the oracle set by design —
    # this test isolates ANN-path recall, not the product floor)
    res = eng.search(
        [QueryRequest(query="", embedding=qv[i], tag_mode="none",
                      mode="recall")
         for i in range(16)], k=k)
    recalls = []
    for i, r in enumerate(res):
        got = {h.row for h in r.hits}
        recalls.append(len(got & set(map(int, oracle[i]))) / k)
    assert float(np.mean(recalls)) >= 0.85, recalls


def test_native_gather_cos_matches_numpy():
    """cpp/rerank.cc fused gather+dequant+dot == the numpy fallback
    (clamp semantics included); engine._host_rerank relies on this."""
    from mobius_rag_tpu.utils.native import gather_cos

    rng = np.random.default_rng(7)
    n, d, b, w = 500, 96, 4, 12
    hv = rng.integers(-127, 128, (n, d)).astype(np.int8)
    hs = (rng.random(n).astype(np.float32) + 0.1) / 127
    idx = rng.integers(-3, n + 3, (b, w)).astype(np.int32)  # incl. out-of-range
    qv = rng.standard_normal((b, d)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    got = gather_cos(hv, hs, idx, qv)
    if got is None:
        pytest.skip("native library unavailable (no toolchain)")
    safe = np.clip(idx, 0, n - 1)
    ref = np.einsum("bwd,bd->bw",
                    hv[safe].astype(np.float32) * hs[safe][..., None], qv)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_host_residency_shards_as_pq_only():
    """Sharded serving under host residency is the codes-only regime —
    supported with backend 'pq' (see tests/test_sharded_host.py for the
    serving contract), refused loudly for payload-needing backends."""
    from mobius_rag_tpu.parallel.mesh import make_mesh
    from mobius_rag_tpu.parallel.sharded import ShardedEngine

    lex = sample_lexicon()
    store = ChunkStore(_host_cfg())
    store.add_chunks(toy_corpus(lex, pad_docs=16))
    with pytest.raises(ValueError, match="pq"):
        ShardedEngine(store, mesh=make_mesh(8), vector_backend="exact")
    se = ShardedEngine(store, mesh=make_mesh(8), cfg=store.cfg)
    assert se.vector_backend == "pq"


def test_host_residency_snapshot_restore(tmp_path, stores):
    """Snapshot under host residency must persist the int8 host matrix
    (host_vectors.npy) and restore must rehydrate records + re-rank from
    it — the device vectors array is deliberately 0-row in this regime,
    so the generic vectors-based rehydration cannot apply."""
    lex, _, host_store = stores
    path = str(tmp_path / "snap")
    host_store.snapshot(path)
    import os

    assert os.path.exists(os.path.join(path, "host_vectors.npy"))

    restored = ChunkStore.restore(path, cfg=host_store.cfg)
    assert restored.host_vectors is not None
    assert restored.capacity == host_store.capacity
    assert np.array_equal(restored.host_vectors[:restored.size],
                          host_store.host_vectors[:host_store.size])
    # record embeddings rehydrated from the host matrix, not zeros
    live = next(r for r in restored.records if r is not None)
    assert np.abs(live.embedding).max() > 0

    before = SearchEngine(host_store, lex, cfg=host_store.cfg,
                          embed_fn=hash_embed)
    after = SearchEngine(restored, lex, cfg=host_store.cfg,
                         embed_fn=hash_embed)
    q = QueryRequest(query="timely filing deadline for sunshine health")
    assert ([h.chunk_id for h in after.search(q, k=5)[0].hits]
            == [h.chunk_id for h in before.search(q, k=5)[0].hits])

    # residency-regime mismatch refuses loudly
    with pytest.raises(ValueError, match="vector_residency"):
        ChunkStore.restore(path, cfg=get_config())


def test_wide_pack_roundtrip():
    """_pack_wide/_unpack_wide: the funnel signal block rides the packed
    f32 output as bf16 pairs (halves the d2h payload); the roundtrip
    must preserve bf16-rounded values, NEG_INF liveness, and [0,1]
    signal ranges."""
    import jax
    import ml_dtypes

    from mobius_rag_tpu.query import engine as eng

    rng = np.random.default_rng(7)
    b, w = 4, 32
    out = {
        "wide_vals": rng.normal(size=(b, w)).astype(np.float32),
        "wide_lexn": rng.uniform(0, 1, (b, w)).astype(np.float32),
        "wide_auth": rng.uniform(0, 1, (b, w)).astype(np.float32),
        "wide_len": rng.uniform(0, 1, (b, w)).astype(np.float32),
        "wide_jpd": rng.uniform(0, 1, (b, w)).astype(np.float32),
        "wide_cov": rng.uniform(0, 1, (b, w)).astype(np.float32),
    }
    out["wide_vals"][:, ::5] = eng.NEG_INF  # dead candidates
    packed = np.asarray(jax.device_get(
        jax.jit(eng._pack_wide)({k: np.asarray(v) for k, v in out.items()})))
    assert packed.shape == (b, 3 * w)
    back = eng._unpack_wide(packed, w)
    for key, ref in out.items():
        want = ref.astype(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(back[key], want, err_msg=key)
    # liveness contract: dead entries stay below NEG_INF / 2
    assert (back["wide_vals"][:, ::5] < eng.NEG_INF / 2).all()


def test_m_other_pads_are_dead():
    """arm_candidates with m_other < m: lex/d-tag arms are top_k'd at
    m_other and dead-padded back to m — padded tails must sit below the
    NEG_INF/2 liveness line so fusion never picks them."""
    import jax

    from mobius_rag_tpu.query import engine as eng

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=120))
    engine = SearchEngine(store, lex)
    emb = hash_embed(["timely filing for sunshine health claims"])[0]
    q, _ = engine.prepare_batch([QueryRequest(
        query="timely filing for sunshine health claims",
        embedding=emb / np.linalg.norm(emb), tag_mode="none")])
    qd = {k: np.asarray(v) for k, v in q.items()}
    qd["vec"] = qd["vec"].astype(np.float32)
    m, m_oth = 24, 6
    vals, gidx, sigs, _ = jax.device_get(jax.jit(
        lambda ix, qq: eng.arm_candidates(ix, qq, 4, m, m_other=m_oth)
    )(store.index, qd))
    assert vals.shape == (3, 1, m)
    # vector arm runs at full m; lex/dtag tails beyond m_other are dead
    for arm in (1, 2):
        assert (vals[arm, :, m_oth:] < eng.NEG_INF / 2).all()
    # and fusion output never references a padded slot as live
    outd = jax.device_get(jax.jit(
        lambda v, g, s, qq: eng.fuse_and_rerank(
            v[:, None], g[:, None], s[:, None], qq, 4, 60, m)
    )(vals, gidx, sigs, qd))
    assert np.isfinite(outd["rerank"]).any()
