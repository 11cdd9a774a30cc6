"""PQ codebook training / encoding / packed ADC search: recall vs the
exact scan on a clustered corpus, spill coverage, filter parity."""
import numpy as np
import pytest

from mobius_rag_tpu.index.ivf import IVFIndex
from mobius_rag_tpu.ops.pq import PackedPQ, encode_pq, pq_search_packed, train_pq
from mobius_rag_tpu.ops.topk import NEG_INF, cosine_topk_xla


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    n, d, centers = 20000, 256, 64
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    v = c[rng.integers(0, centers, n)] + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = v[rng.choice(n, 16, replace=False)] + 0.02 * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return v, q


def test_pq_encode_reconstruction(corpus):
    v, _ = corpus
    cb = train_pq(v, m=32, iters=8, sample=5000)
    codes = encode_pq(v[:2000], cb)
    assert codes.shape == (2000, 32) and codes.dtype == np.uint8
    # ADC self-score ≈ 1 for unit rows (quantization error bounded)
    cbn = np.asarray(cb)
    recon = np.stack([
        np.concatenate([cbn[m, codes[i, m]] for m in range(32)])
        for i in range(64)])
    sims = (recon * v[:64]).sum(axis=1)
    # plain PQ keeps the cluster-center energy; the per-subvector noise
    # floor on this substrate caps reconstruction ~0.75 — ranking recall
    # (next test) is the operative metric
    assert sims.mean() > 0.7, sims.mean()


def test_pq_packed_search_recall(corpus):
    """ADC alone generates candidates; the two-stage host re-rank
    restores exact-level recall (the production shape at ≥4M rows)."""
    from mobius_rag_tpu.ops.pq import pq_search_reranked

    v, q = corpus
    k = 10
    pen = np.zeros(len(v), np.float32)
    _, exact_idx = cosine_topk_xla(v, q, pen, k)
    exact = [set(map(int, row)) for row in np.asarray(exact_idx)]

    ivf = IVFIndex.build(v, nlist=64, iters=6)
    ppq = PackedPQ.from_ivf(ivf, v, m=64, iters=8)  # residual IVFADC
    assert ppq.bytes_per_row == 64  # 4x smaller than int8, 16x than f32
    vals, idx = pq_search_packed(ppq, q, pen, k, nprobe=16)
    adc_recall = np.mean([len(exact[i] & set(map(int, row))) / k
                          for i, row in enumerate(np.asarray(idx))])
    assert adc_recall >= 0.45, adc_recall  # candidate generator floor

    vals, idx = pq_search_reranked(ppq, q, pen, k, 16, host_vectors=v,
                                   over_fetch=10)
    recall = np.mean([len(exact[i] & set(map(int, row))) / k
                      for i, row in enumerate(np.asarray(idx))])
    assert recall >= 0.95, recall


def test_pq_respects_penalty(corpus):
    v, q = corpus
    ivf = IVFIndex.build(v, nlist=32, iters=4)
    ppq = PackedPQ.from_ivf(ivf, v, m=16, iters=4)
    pen = np.full(len(v), NEG_INF, np.float32)
    pen[:100] = 0.0  # only rows 0..99 eligible
    vals, idx = pq_search_packed(ppq, q, pen, 5, nprobe=32)
    live = np.asarray(vals) > NEG_INF / 2
    assert (np.asarray(idx)[live] < 100).all()


def test_pq_int8_row_scales(corpus):
    """PQ over an int8 store must train/encode on DEQUANTIZED rows."""
    from mobius_rag_tpu.ops.quant import quantize_rows

    v, q = corpus
    vi, scales = quantize_rows(v)
    from mobius_rag_tpu.ops.pq import pq_search_reranked

    ivf = IVFIndex.build(v, nlist=32, iters=4)
    ppq = PackedPQ.from_ivf(ivf, vi, m=64, iters=6, row_scales=scales)
    pen = np.zeros(len(v), np.float32)
    _, exact_idx = cosine_topk_xla(v, q, pen, 10)
    exact = [set(map(int, row)) for row in np.asarray(exact_idx)]
    _, idx = pq_search_reranked(ppq, q, pen, 10, 32,
                                host_vectors=np.asarray(vi),
                                host_scales=np.asarray(scales),
                                over_fetch=10)
    recall = np.mean([len(exact[i] & set(map(int, row))) / 10
                      for i, row in enumerate(np.asarray(idx))])
    assert recall >= 0.9, recall
