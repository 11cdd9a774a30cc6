"""Quantized vector scan: int8 symmetric per-row quantization.

The 10M-chunk config's memory lever (BASELINE.json config 5): fp32
embeddings are 4 bytes/dim; int8 cuts HBM residency and scan bandwidth
4× while recall@10 stays ≥0.99 on L2-normalized embeddings (validated
in tests/test_quant.py and the scale bench). The MXU multiplies int8
natively, accumulating in int32; the per-row scale re-enters as a cheap
f32 epilogue multiply.

The reference has no quantization anywhere (vectors live as Postgres
JSONB + pgvector fp32); this is net-new capability the TPU build adds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np




@jax.jit
def _quantize_block(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    v32 = v.astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(v32), axis=1)
    scale = jnp.where(max_abs > 0, max_abs / 127.0, 1.0)
    q = jnp.clip(jnp.round(v32 / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_rows(vectors: np.ndarray | jnp.ndarray, *, block: int = 131072
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N, D] float → (int8 values [N, D], per-row scales [N] f32) with
    symmetric per-row max-abs scaling. Processed in row blocks so the
    transient f32 copy never exceeds ~block×D×4 bytes (a full-corpus f32
    materialization OOMs at the 1M×1536 scale)."""
    v = jnp.asarray(vectors)
    n = v.shape[0]
    if n <= block:
        return _quantize_block(v)
    qs, ss = [], []
    for off in range(0, n, block):
        q, s = _quantize_block(v[off:off + block])
        qs.append(q)
        ss.append(s)
    return jnp.concatenate(qs, axis=0), jnp.concatenate(ss, axis=0)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_int8(values: jnp.ndarray, scales: jnp.ndarray, queries: jnp.ndarray,
                     penalty: jnp.ndarray, k: int):
    """Masked top-k over an int8-quantized chunk matrix.

    scores[b, n] = (q[b] · values[n]) * scales[n]  — int8×int8→int32 on
    the MXU via an int8-quantized query (per-query scale), then two f32
    scale multiplies in the epilogue.
    """
    qv = queries.astype(jnp.float32)
    q_max = jnp.max(jnp.abs(qv), axis=1)
    q_scale = jnp.where(q_max > 0, q_max / 127.0, 1.0)
    q_int = jnp.clip(jnp.round(qv / q_scale[:, None]), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_int, values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N] int32
    scores = acc.astype(jnp.float32) * q_scale[:, None] * scales[None, :]
    scores = scores + penalty[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)
