"""approx_max_k recall-delta contract (r4 VERDICT item 3 — resolved by
MEASUREMENT, against the hypothesis).

The probed scans' final top-k optionally uses jax.lax.approx_max_k on
TPU (cfg.ann_approx_topk) — ~70x faster than exact lax.top_k at funnel
width. The r4 2M strict sweep measured the recall delta through the
funnel + exact-host-re-rank stack: recall_target 0.95 → recall@10
0.96→0.83; even 0.99 → 0.85 (true top-k rows rank deep in the
approximate ordering, the boundary region where approx_max_k retention
is weakest). So the default is EXACT (0.0); the op stays available by
env for workloads whose candidates rank shallow. These tests pin:
- the default is OFF (0.0) per the measurement above;
- merged_topk on the CPU parity mesh stays EXACT regardless of the
  approx setting (bitwise mesh parity);
- the engine's end-to-end results are identical either way on the CPU
  mesh (same gating).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mobius_rag_tpu.config import get_config
from mobius_rag_tpu.ops.topk import merged_topk


def test_default_is_exact(monkeypatch):
    monkeypatch.delenv("MRAG_ANN_APPROX_TOPK", raising=False)
    cfg = get_config()
    assert cfg.ann_approx_topk == 0.0


def test_cpu_backend_stays_exact():
    assert jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    ids = jnp.broadcast_to(jnp.arange(512, dtype=jnp.int32)[None], (4, 512))
    v_exact, i_exact = merged_topk(vals, ids, 16, approx_recall=0.0)
    v_appr, i_appr = merged_topk(vals, ids, 16, approx_recall=0.95)
    np.testing.assert_array_equal(np.asarray(i_exact), np.asarray(i_appr))
    np.testing.assert_array_equal(np.asarray(v_exact), np.asarray(v_appr))


def test_engine_results_identical_on_cpu_mesh(monkeypatch):
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex))
    req = [QueryRequest(query="timely filing deadline claims",
                        tag_mode="none")]

    def run(approx):
        monkeypatch.setenv("MRAG_ANN_APPROX_TOPK", str(approx))
        eng = SearchEngine(store, lex, embed_fn=hash_embed)
        res = eng.search(req, k=5)[0]
        return [(h.row, round(h.score, 6)) for h in res.hits]

    assert run(0.0) == run(0.95)
