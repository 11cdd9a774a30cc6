"""2D data×shard serving mesh (make_serve_mesh): the corpus replicates
over the `data` axis and the query batch splits over it. Parity contract:
identical results to the dense single-device engine AND to the 1D
sharded mesh — dp only changes which device scans which query."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.ops.topk import NEG_INF
from mobius_rag_tpu.parallel.mesh import make_mesh, make_serve_mesh
from mobius_rag_tpu.parallel.sharded import ShardedEngine
from mobius_rag_tpu.query.engine import (QueryRequest, SearchEngine,
                                         _search_compiled, unpack_out)
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def setup():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=300))
    single = SearchEngine(store, lex, embed_fn=hash_embed)
    dp_mesh = make_serve_mesh(2, 4)
    sharded = ShardedEngine(store, mesh=dp_mesh)
    return lex, store, single, sharded


QUERIES = [
    QueryRequest(query="What is the timely filing deadline for Sunshine "
                       "Health FL Medicaid claims?"),
    QueryRequest(query="prior authorization for durable medical equipment"),
    QueryRequest(query="molina eligibility verification", payer="molina"),
    QueryRequest(query="telehealth utilization trends", tag_mode="none",
                 mode="recall"),
]


def _dense(single, store, q, k):
    return unpack_out(jax.device_get(_search_compiled(
        store.index, {key: jnp.asarray(v) for key, v in q.items()},
        k, single.cfg.over_fetch, single.cfg.rrf_k)), k)


def _assert_parity(dense, shard, n):
    for bi in range(n):
        d_live = dense["rerank"][bi] > NEG_INF / 2
        s_live = shard["rerank"][bi] > NEG_INF / 2
        assert d_live.sum() == s_live.sum(), f"query {bi} live-count mismatch"
        d_ids = dense["idx"][bi][d_live]
        s_ids = shard["idx"][bi][s_live]
        assert set(map(int, d_ids)) == set(map(int, s_ids)), f"query {bi}"
        np.testing.assert_allclose(
            np.sort(shard["rerank"][bi][s_live]),
            np.sort(dense["rerank"][bi][d_live]), atol=1e-4)


def test_serve_mesh_shape():
    m = make_serve_mesh(2, 4)
    assert m.shape == {"data": 2, "shard": 4}
    # default shard count fills the devices
    assert make_serve_mesh(2).shape == {"data": 2, "shard": 4}
    with pytest.raises(ValueError):
        make_serve_mesh(4, 4)  # 16 > 8 devices


def test_dp_mesh_matches_single(setup):
    lex, store, single, sharded = setup
    k = 10
    q, _ = single.prepare_batch(QUERIES)
    _assert_parity(_dense(single, store, q, k),
                   sharded.search_arrays(q, k), len(QUERIES))


def test_dp_mesh_odd_batch_pads(setup):
    """Batch not divisible by dp exercises the in-jit pad/slice path:
    3 queries over dp=2 → padded to 4, results sliced back to 3."""
    lex, store, single, sharded = setup
    k = 8
    reqs = QUERIES[:3]
    q, _ = single.prepare_batch(reqs)
    shard = sharded.search_arrays(q, k)
    assert shard["idx"].shape[0] == 3
    _assert_parity(_dense(single, store, q, k), shard, 3)


def test_dp_matches_1d_sharded(setup):
    """dp=2×4 shards must equal the 1D 4-shard mesh (same shard count —
    the data axis must not perturb the merge)."""
    lex, store, single, sharded = setup
    one_d = ShardedEngine(store, mesh=make_mesh(4))
    k = 10
    q, _ = single.prepare_batch(QUERIES)
    a = sharded.search_arrays(q, k)
    b = one_d.search_arrays(q, k)
    np.testing.assert_array_equal(a["idx"], b["idx"])
    np.testing.assert_allclose(a["rerank"], b["rerank"], atol=1e-5)


def test_dp_full_search_api(setup):
    lex, store, single, sharded = setup
    res = sharded.search(single, QueryRequest(
        query="What is the timely filing deadline for Sunshine Health "
              "FL Medicaid claims?"), k=5)[0]
    assert res.hits and res.hits[0].doc_id == "sunshine_provider_manual"
    mono = single.search(QueryRequest(
        query="What is the timely filing deadline for Sunshine Health "
              "FL Medicaid claims?"), k=5)[0]
    assert [h.chunk_id for h in res.hits] == [h.chunk_id for h in mono.hits]


def test_dp_filter_parity(setup):
    lex, store, single, sharded = setup
    q, _ = single.prepare_batch([QueryRequest(query="timely filing",
                                              payer="not_a_payer")])
    out = sharded.search_arrays(q, 5)
    assert (out["rerank"][0] <= NEG_INF / 2).all()


def test_dp_ivf_full_probe_matches_exact(setup):
    """Per-shard IVF under the 2D mesh: full probe covers every row of
    every shard, so results equal the dp exact scan."""
    lex, store, single, sharded = setup
    import dataclasses
    cfg = dataclasses.replace(single.cfg, ivf_nlist=4, ivf_nprobe=4)
    ivf_eng = ShardedEngine(store, mesh=sharded.mesh, cfg=cfg,
                            vector_backend="ivf")
    k = 10
    q, _ = single.prepare_batch(QUERIES)
    exact = sharded.search_arrays(q, k)
    approx = ivf_eng.search_arrays(q, k)
    _assert_parity(exact, approx, len(QUERIES))


def test_dp_live_refresh(setup):
    """Publish after construction surfaces through refresh() on the 2D
    mesh (replicated scatter must land on every data replica)."""
    from mobius_rag_tpu.index.store import ChunkRecord
    from mobius_rag_tpu.ingest.featurize import featurize_chunk

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=64))
    single = SearchEngine(store, lex, embed_fn=hash_embed)
    se = ShardedEngine(store, mesh=make_serve_mesh(2, 4))
    serving = SearchEngine(store, lex, embed_fn=hash_embed, sharded=se)

    text = ("Zephyr Plan zymurgy benefit requires prior authorization "
            "before the first fermentation consult.")
    rec = featurize_chunk(ChunkRecord(
        chunk_id="zephyr-c0", doc_id="zephyr_doc", text=text,
        embedding=hash_embed([text])[0]), lex)
    store.publish_document("zephyr_doc", [rec])
    info = se.refresh()
    assert info["refreshed"]
    res = serving.search(
        QueryRequest(query="zymurgy benefit fermentation consult"), k=5)[0]
    assert any(h.doc_id == "zephyr_doc" for h in res.hits)
    mono = single.search(
        QueryRequest(query="zymurgy benefit fermentation consult"), k=5)[0]
    assert [h.chunk_id for h in res.hits] == [h.chunk_id for h in mono.hits]
