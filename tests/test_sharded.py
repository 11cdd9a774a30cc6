"""Sharded-vs-single-chip parity on the 8-device virtual CPU mesh: the
shard_map local-scan + allgather-merge pipeline must reproduce the dense
single-device engine's results (same top-k ids and scores)."""
import jax
import numpy as np
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.parallel.mesh import make_mesh
from mobius_rag_tpu.parallel.sharded import ShardedEngine
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def setup():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=300))
    single = SearchEngine(store, lex, embed_fn=hash_embed)
    mesh = make_mesh(8)
    sharded = ShardedEngine(store, mesh=mesh)
    return lex, store, single, sharded


QUERIES = [
    QueryRequest(query="What is the timely filing deadline for Sunshine Health "
                       "FL Medicaid claims?"),
    QueryRequest(query="prior authorization for durable medical equipment"),
    QueryRequest(query="molina eligibility verification", payer="molina"),
    QueryRequest(query="telehealth utilization trends", tag_mode="none", mode="recall"),
]


def _prepared_batch(single, reqs):
    q, _ = single.prepare_batch(reqs)
    return q


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(setup):
    lex, store, single, sharded = setup
    k = 10
    q = _prepared_batch(single, QUERIES)

    import jax.numpy as jnp
    from mobius_rag_tpu.query.engine import _search_compiled, unpack_out

    dense = unpack_out(jax.device_get(_search_compiled(
        store.index, {key: jnp.asarray(v) for key, v in q.items()},
        k, single.cfg.over_fetch, single.cfg.rrf_k,
    )), k)
    shard = sharded.search_arrays(q, k)

    from mobius_rag_tpu.ops.topk import NEG_INF
    for bi in range(len(QUERIES)):
        d_live = dense["rerank"][bi] > NEG_INF / 2
        s_live = shard["rerank"][bi] > NEG_INF / 2
        assert d_live.sum() == s_live.sum(), f"query {bi} live-count mismatch"
        d_ids = dense["idx"][bi][d_live]
        s_ids = shard["idx"][bi][s_live]
        # top-k sets must match (order may differ on exact score ties)
        assert set(map(int, d_ids)) == set(map(int, s_ids)), f"query {bi}"
        np.testing.assert_allclose(
            np.sort(shard["rerank"][bi][s_live]),
            np.sort(dense["rerank"][bi][d_live]),
            atol=1e-4,
        )


def test_sharded_full_search_api(setup):
    lex, store, single, sharded = setup
    res = sharded.search(single, QueryRequest(
        query="What is the timely filing deadline for Sunshine Health "
              "FL Medicaid claims?"), k=5)[0]
    assert res.hits and res.hits[0].doc_id == "sunshine_provider_manual"
    assert res.confidence_label in ("high", "medium")
    # matches the single-chip engine's answer
    mono = single.search(QueryRequest(
        query="What is the timely filing deadline for Sunshine Health "
              "FL Medicaid claims?"), k=5)[0]
    assert [h.chunk_id for h in res.hits] == [h.chunk_id for h in mono.hits]


def test_sharded_filter_parity(setup):
    # metadata filter must fail closed on every shard
    lex, store, single, sharded = setup
    req = QueryRequest(query="timely filing", payer="not_a_payer")
    q = _prepared_batch(single, [req])
    out = sharded.search_arrays(q, 5)
    from mobius_rag_tpu.ops.topk import NEG_INF
    assert (out["rerank"][0] <= NEG_INF / 2).all()


def test_sharded_live_refresh_publish_and_delete():
    """Publishes/deletes AFTER ShardedEngine construction surface in
    sharded results via refresh() — no engine reconstruction (the
    multi-chip form of the republish contract, publish.py:27-481)."""
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    single = SearchEngine(store, lex, embed_fn=hash_embed)
    se = ShardedEngine(store, mesh=make_mesh(8))
    serving = SearchEngine(store, lex, embed_fn=hash_embed, sharded=se)

    text = ("Zephyr Plan zymurgy benefit requires prior authorization "
            "before the first fermentation consult.")
    rec = featurize_chunk(ChunkRecord(
        chunk_id="zephyr-c0", doc_id="zephyr_doc", text=text,
        embedding=hash_embed([text])[0]), lex)
    store.publish_document("zephyr_doc", [rec])
    assert se.stale

    info = se.refresh()
    assert info["refreshed"] and info["mode"].startswith("scatter")

    q = QueryRequest(query="zymurgy benefit fermentation consult")
    res = serving.search(q, k=5)[0]
    assert any(h.doc_id == "zephyr_doc" for h in res.hits)
    # parity with the dense engine over the same (mutated) store
    mono = single.search(q, k=5)[0]
    assert [h.chunk_id for h in res.hits] == [h.chunk_id for h in mono.hits]

    store.delete_by_document("zephyr_doc")
    res2 = serving.search(q, k=5)[0]  # auto-refresh inside search
    assert not any(h.doc_id == "zephyr_doc" for h in res2.hits)
    assert not se.stale


def test_sharded_pipelined_routes_through_mesh():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=32))
    single = SearchEngine(store, lex, embed_fn=hash_embed)
    serving = SearchEngine(store, lex, embed_fn=hash_embed,
                           sharded=ShardedEngine(store, mesh=make_mesh(8)))
    batches = [[QueryRequest(query="timely filing deadline")],
               [QueryRequest(query="prior authorization for dme")]]
    mono = single.search_pipelined(batches, k=5)
    shrd = serving.search_pipelined(batches, k=5)
    for mb, sb in zip(mono, shrd):
        for mr, sr in zip(mb, sb):
            assert [h.chunk_id for h in mr.hits] == [h.chunk_id for h in sr.hits]


# ---------------------------------------------------------------------------
# ANN backends under sharding (round 3): per-shard IVF/packed tables built
# by ShardedEngine.ensure_ann, probed inside shard_map.
# ---------------------------------------------------------------------------

def test_sharded_ivf_full_probe_matches_exact(setup):
    """With nprobe >= nlist every cluster (plus spill) is probed, so the
    per-shard IVF scan covers exactly the shard's rows — results must
    equal the sharded exact scan (same live sets, same scores)."""
    import dataclasses

    lex, store, single, sharded = setup
    k = 10
    q = _prepared_batch(single, QUERIES)
    exact = sharded.search_arrays(q, k)

    cfg = dataclasses.replace(sharded.cfg, ivf_nprobe=100_000)
    ann_eng = ShardedEngine(store, mesh=sharded.mesh, cfg=cfg,
                            vector_backend="ivf")
    out = ann_eng.search_arrays(q, k)
    assert ann_eng._ann is not None  # the probe path actually built tables

    from mobius_rag_tpu.ops.topk import NEG_INF
    for bi in range(len(QUERIES)):
        e_live = exact["rerank"][bi] > NEG_INF / 2
        a_live = out["rerank"][bi] > NEG_INF / 2
        assert e_live.sum() == a_live.sum(), f"query {bi} live-count"
        assert (set(map(int, exact["idx"][bi][e_live]))
                == set(map(int, out["idx"][bi][a_live]))), f"query {bi}"
        np.testing.assert_allclose(
            np.sort(out["rerank"][bi][a_live]),
            np.sort(exact["rerank"][bi][e_live]), atol=1e-4)


def test_sharded_packed_backend_serves(setup):
    """Packed int8 per-shard backend: full-probe recall vs the exact
    sharded scan stays high (int8 quantization noise only)."""
    import dataclasses

    lex, store, single, sharded = setup
    k = 10
    q = _prepared_batch(single, QUERIES)
    exact = sharded.search_arrays(q, k)
    cfg = dataclasses.replace(sharded.cfg, ivf_nprobe=100_000)
    ann_eng = ShardedEngine(store, mesh=sharded.mesh, cfg=cfg,
                            vector_backend="packed")
    out = ann_eng.search_arrays(q, k)

    from mobius_rag_tpu.ops.topk import NEG_INF
    recalls = []
    for bi in range(len(QUERIES)):
        e_ids = set(map(int, exact["idx"][bi][exact["rerank"][bi] > NEG_INF / 2]))
        a_ids = set(map(int, out["idx"][bi][out["rerank"][bi] > NEG_INF / 2]))
        if e_ids:
            recalls.append(len(e_ids & a_ids) / len(e_ids))
    assert recalls and float(np.mean(recalls)) >= 0.8, recalls


def test_engine_backend_propagates_to_sharded():
    """MRAG_VECTOR_BACKEND=ivf with a mesh attached must actually serve
    IVF (round 2 silently fell back to exact)."""
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    se = ShardedEngine(store, mesh=make_mesh(8))
    serving = SearchEngine(store, lex, embed_fn=hash_embed, sharded=se,
                           vector_backend="ivf")
    assert se.vector_backend == "ivf"
    res = serving.search(QueryRequest(query="timely filing deadline"), k=5)[0]
    assert res.hits
    assert se._ann is not None, "sharded search did not build ANN tables"
    # runtime switch propagates too
    serving.set_vector_backend("exact")
    assert se.vector_backend == "exact"


def test_sharded_ann_rebuilds_after_publish():
    """Store writes invalidate the per-shard ANN tables (generation
    check) — a republished document must be findable through the probed
    path."""
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    import dataclasses

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    cfg = dataclasses.replace(get_config_for_tests(), ivf_nprobe=100_000)
    se = ShardedEngine(store, mesh=make_mesh(8), cfg=cfg,
                       vector_backend="ivf")
    serving = SearchEngine(store, lex, embed_fn=hash_embed, sharded=se)
    serving.search(QueryRequest(query="warm up"), k=5)
    gen0 = se._ann_generation

    text = ("Quixotic Plan florilegium benefit needs review before the "
            "first antiquarian consult.")
    rec = featurize_chunk(ChunkRecord(
        chunk_id="qx-c0", doc_id="qx_doc", text=text,
        embedding=hash_embed([text])[0]), lex)
    store.publish_document("qx_doc", [rec])
    res = serving.search(QueryRequest(query="florilegium antiquarian consult"),
                         k=5)[0]
    assert se._ann_generation != gen0, "ANN tables were not rebuilt"
    assert any(h.doc_id == "qx_doc" for h in res.hits)


def get_config_for_tests():
    from mobius_rag_tpu.config import get_config
    return get_config()


def test_sharded_pq_backend_serves(setup):
    """Per-shard residual-PQ tables under shard_map (config-5 on a
    mesh): full-probe hybrid recall stays high vs the exact sharded
    scan."""
    import dataclasses

    lex, store, single, sharded = setup
    k = 10
    q = _prepared_batch(single, QUERIES)
    exact = sharded.search_arrays(q, k)
    cfg = dataclasses.replace(sharded.cfg, ivf_nprobe=100_000)
    ann_eng = ShardedEngine(store, mesh=sharded.mesh, cfg=cfg,
                            vector_backend="pq")
    out = ann_eng.search_arrays(q, k)

    from mobius_rag_tpu.ops.topk import NEG_INF
    recalls = []
    for bi in range(len(QUERIES)):
        e_ids = set(map(int, exact["idx"][bi][exact["rerank"][bi] > NEG_INF / 2]))
        a_ids = set(map(int, out["idx"][bi][out["rerank"][bi] > NEG_INF / 2]))
        if e_ids:
            recalls.append(len(e_ids & a_ids) / len(e_ids))
    assert recalls and float(np.mean(recalls)) >= 0.8, recalls
