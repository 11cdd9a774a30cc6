"""ChunkStore contract tests: append/search, DELETE+INSERT republish
idempotency, capacity growth, incremental-resume diffing, and
snapshot/restore (the reference's durability contracts:
app/services/publish.py DELETE+INSERT, app/embedding_worker.py:187-266)."""
import numpy as np
import pytest

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore, pack_bits, unpack_bits
from mobius_rag_tpu.ops.topk import NEG_INF, cosine_topk_xla


def _rec(rng, doc, i, **kw):
    cfg = get_config()
    return ChunkRecord(
        chunk_id=f"{doc}-c{i}",
        doc_id=doc,
        text=f"paragraph {i} of {doc} " * 10,
        embedding=rng.standard_normal(cfg.embed_dim).astype(np.float32),
        source_id=f"{doc}-s{i}",
        **kw,
    )


def test_pack_unpack_roundtrip():
    ids = [0, 5, 31, 32, 63, 200]
    bits = pack_bits(ids, 8)
    assert unpack_bits(bits) == ids


def test_add_and_search(rng):
    store = ChunkStore()
    recs = [_rec(rng, "docA", i) for i in range(20)]
    rows = store.add_chunks(recs)
    assert rows == list(range(20))
    assert store.size == 20

    # query = one of the stored embeddings → that row must rank first
    q = recs[7].embedding / np.linalg.norm(recs[7].embedding)
    penalty = np.where(np.asarray(store.index.valid) > 0, 0.0, NEG_INF).astype(np.float32)
    vals, idx = cosine_topk_xla(store.index.vectors, q[None, :], penalty, 3)
    assert int(np.asarray(idx)[0, 0]) == 7
    assert np.asarray(vals)[0, 0] == pytest.approx(1.0, abs=2e-3)


def test_delete_and_republish(rng):
    store = ChunkStore()
    store.add_chunks([_rec(rng, "docA", i) for i in range(5)])
    store.add_chunks([_rec(rng, "docB", i) for i in range(5)])
    assert store.delete_by_document("docA") == 5
    assert store.size == 5
    valid = np.asarray(store.index.valid)
    assert valid[:5].sum() == 0 and valid[5:10].sum() == 5

    # republish is idempotent: delete+insert
    store.publish_document("docB", [_rec(rng, "docB", i) for i in range(3)])
    assert store.size == 3 + 5 - 5  # docA gone, docB now 3
    assert len(store.embedded_source_ids("docB")) == 3


def test_incremental_resume_diff(rng):
    store = ChunkStore()
    store.add_chunks([_rec(rng, "docA", i) for i in range(4)])
    have = store.embedded_source_ids("docA")
    wanted = {f"docA-s{i}" for i in range(6)}
    missing = wanted - have
    assert missing == {"docA-s4", "docA-s5"}


def test_capacity_growth(rng):
    store = ChunkStore(capacity=256)
    store.add_chunks([_rec(rng, "big", i) for i in range(300)])
    assert store.capacity >= 300
    assert store.size == 300
    assert float(np.asarray(store.index.valid).sum()) == 300


def test_metadata_and_tags(rng):
    store = ChunkStore()
    r = _rec(rng, "docA", 0, payer="sunshine_health", state="FL",
             authority_level=4, j_tags=[3], d_tags=[10, 11], phrase_ids=[100])
    store.add_chunks([r])
    assert store.payers.lookup(int(np.asarray(store.index.payer)[0])) == "sunshine_health"
    assert np.asarray(store.index.authority)[0] == pytest.approx(1.0)
    assert unpack_bits(np.asarray(store.index.j_tags)[0]) == [3]
    assert unpack_bits(np.asarray(store.index.d_tags)[0]) == [10, 11]
    assert unpack_bits(np.asarray(store.index.phrase_bits)[0]) == [100]


def test_snapshot_restore(tmp_path, rng):
    store = ChunkStore()
    recs = [_rec(rng, "docA", i, payer="aetna") for i in range(10)]
    store.add_chunks(recs)
    store.delete_by_document("docA")
    recs2 = [_rec(rng, "docB", i) for i in range(8)]
    store.add_chunks(recs2)
    store.snapshot(str(tmp_path / "snap"))

    loaded = ChunkStore.restore(str(tmp_path / "snap"))
    assert loaded.size == store.size == 8
    np.testing.assert_array_equal(
        np.asarray(loaded.index.valid), np.asarray(store.index.valid)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.index.vectors), np.asarray(store.index.vectors)
    )
    assert loaded.embedded_source_ids("docB") == store.embedded_source_ids("docB")
    # docB recycled docA's freed rows 0..7 (round-3 free-row reuse), and
    # the snapshot preserves the recycled layout
    assert store.record(2).chunk_id == "docB-c2"
    assert loaded.record(2).chunk_id == "docB-c2"
    assert loaded.free_row_count == store.free_row_count == 2


def test_restore_rehydrates_embeddings(tmp_path, rng):
    """A restored store must carry REAL record embeddings: retag/nightly/
    remediate republish from records, so zeroed embeddings would silently
    wipe the live vectors (or get the whole corpus dropped by the
    integrity zero-norm check)."""
    store = ChunkStore()
    recs = [_rec(rng, "docA", i) for i in range(6)]
    store.add_chunks(recs)
    store.snapshot(str(tmp_path / "snap"))

    loaded = ChunkStore.restore(str(tmp_path / "snap"))
    for row in range(6):
        emb = np.asarray(loaded.record(row).embedding, np.float32)
        assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-2)
        orig = recs[row].embedding / np.linalg.norm(recs[row].embedding)
        np.testing.assert_allclose(emb, orig, atol=1e-2)

    # republish from restored records keeps live vectors (the retag path)
    loaded.publish_document("docA", [loaded.record(r) for r in range(6)])
    vecs = np.asarray(loaded.index.vectors, np.float32)
    valid = np.asarray(loaded.index.valid) > 0
    assert (np.linalg.norm(vecs[valid], axis=1) > 0.5).all()


def test_restore_then_remediate_keeps_corpus(tmp_path, rng):
    """integrity_remediate drops docs whose record embeddings are
    zero-norm — on a restored store that used to delete everything."""
    import types

    from mobius_rag_tpu.integrity import integrity_remediate

    store = ChunkStore()
    store.add_chunks([_rec(rng, "docA", i) for i in range(4)])
    store.snapshot(str(tmp_path / "snap"))
    loaded = ChunkStore.restore(str(tmp_path / "snap"))
    ctx = types.SimpleNamespace(store=loaded, pipeline=None)
    out = integrity_remediate(ctx)
    assert out["dropped_docs"] == []
    assert loaded.size == 4
    assert out["after"]["ok"]


def test_mutation_generation_and_listeners(rng):
    store = ChunkStore()
    events = []
    store.listeners.append(lambda ev, rows: events.append((ev, len(rows))))
    g0 = store.generation
    rows = store.add_chunks([_rec(rng, "docA", i) for i in range(3)])
    assert store.generation > g0 and events[-1] == ("add", 3)
    store.delete_by_document("docA")
    assert events[-1] == ("delete", 3)


def test_bulk_load_device_vectors_parity():
    """bulk_load's device-resident fast path (jax.Array vectors — the
    on-chip encoder's output staying on device) must build the same
    index as the host-numpy path."""
    import jax.numpy as jnp

    from mobius_rag_tpu.testing import hash_embed

    texts = [f"chunk {i} timely filing" for i in range(20)]
    vecs = hash_embed(texts)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def recs():
        return [ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i%4}",
                            source_id=f"s{i}", text=texts[i],
                            embedding=vecs[i]) for i in range(20)]

    host_store = ChunkStore()
    host_store.bulk_load(recs(), vectors=vecs)
    dev_store = ChunkStore()
    dev_store.bulk_load(recs(), vectors=jnp.asarray(vecs))
    np.testing.assert_allclose(
        np.asarray(host_store.index.vectors, np.float32),
        np.asarray(dev_store.index.vectors, np.float32), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(host_store.index.valid),
                                  np.asarray(dev_store.index.valid))


# ---------------------------------------------------------------------------
# Free-row recycling (round 3): republish churn must not grow the index.
# ---------------------------------------------------------------------------

def test_republish_churn_capacity_stable(rng):
    """Many DELETE+INSERT republish cycles reuse freed rows: capacity and
    the host record list stay bounded by the corpus size, not the write
    count (the reference's steady-state op, publish.py:27-481)."""
    store = ChunkStore(capacity=256)
    # a background corpus that stays put
    store.add_chunks([_rec(rng, "base", i) for i in range(40)])
    cap0 = store.capacity
    for cycle in range(200):
        recs = [_rec(rng, "churn", i) for i in range(5)]
        rows = store.publish_document("churn", recs)
        assert len(rows) == 5
    assert store.capacity == cap0, "republish churn grew the device arrays"
    assert len(store.records) <= 40 + 5 + 5, (
        "host record list grew without bound")
    assert store.size == 45
    assert store.free_row_count <= 5


def test_recycled_rows_serve_new_content(rng):
    """A recycled row must score ONLY its new occupant: vector, lexical
    weights, tags and metadata all fully overwritten."""
    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon

    lex = sample_lexicon()
    store = ChunkStore()
    old_text = "Aardwolf policy covers nocturnal termite consultations only."
    new_text = "Zugzwang rider reimburses chess-clock repair within 90 days."
    old = featurize_chunk(ChunkRecord(
        chunk_id="v1-c0", doc_id="doc_v", text=old_text,
        embedding=hash_embed([old_text])[0]), lex)
    row0 = store.add_chunks([old])[0]
    store.delete_by_document("doc_v")
    new = featurize_chunk(ChunkRecord(
        chunk_id="v2-c0", doc_id="doc_v", text=new_text,
        embedding=hash_embed([new_text])[0]), lex)
    row1 = store.add_chunks([new])[0]
    assert row1 == row0, "freed row was not recycled"

    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    hit = eng.search(QueryRequest(query="zugzwang chess clock repair"),
                     k=3)[0].hits
    assert hit and hit[0].chunk_id == "v2-c0"
    stale = eng.search(QueryRequest(query="aardwolf nocturnal termite"),
                       k=3)[0].hits
    assert not any(h.chunk_id == "v1-c0" for h in stale)
    assert store.record(row0).text == new_text


def test_recycling_sparse_layout_scrubs_postings(rng):
    """Sparse postings referencing a freed row are scrubbed before the
    row's reuse — old lexical weights must not score new content."""
    import dataclasses

    from mobius_rag_tpu.ingest.featurize import featurize_chunk
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon

    cfg = dataclasses.replace(get_config(), lexical_format="sparse",
                              lexical_postings_init=8)
    lex = sample_lexicon()
    store = ChunkStore(cfg)
    old_text = "Quokka benefit includes marsupial wellness screenings."
    new_text = "Xylophone maintenance billed under percussion therapy codes."
    old = featurize_chunk(ChunkRecord(
        chunk_id="s1-c0", doc_id="doc_s", text=old_text,
        embedding=hash_embed([old_text])[0]), lex)
    row0 = store.add_chunks([old])[0]
    store.delete_by_document("doc_s")
    new = featurize_chunk(ChunkRecord(
        chunk_id="s2-c0", doc_id="doc_s", text=new_text,
        embedding=hash_embed([new_text])[0]), lex)
    row1 = store.add_chunks([new])[0]
    assert row1 == row0

    eng = SearchEngine(store, lex, cfg=cfg, embed_fn=hash_embed)
    res = eng.search(QueryRequest(query="quokka marsupial wellness"),
                     k=3)[0]
    # lexical arm must NOT credit the recycled row for the old terms
    assert not any(t["row"] == row0
                   for t in res.telemetry["arms"]["lexical"])
    res2 = eng.search(QueryRequest(query="xylophone percussion therapy"),
                      k=3)[0]
    assert res2.hits and res2.hits[0].chunk_id == "s2-c0"
