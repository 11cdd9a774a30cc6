"""Pallas cluster-block scan for the proj (projected-residual) backend.

Why: DIAG_sig_stages_10000000.json measured the XLA probed scan at
1950 ms/batch32 at 10M rows — the per-probe-step ``jnp.take`` cluster
gathers (~1.9 GB/batch of int8 blocks) run at XLA gather speed, ~800×
off HBM bandwidth, while the useful MXU work is ~4 GFLOP. This kernel
streams each probed cluster block VMEM-ward with Pallas's pipelined
block DMA (the block index comes from the scalar-prefetched probe
table, so the next block's DMA overlaps the current dot) and does the
int8 dot on the MXU.

Numerical parity with the XLA scan path is EXACT: int8 values are
exact in bf16, the MXU computes full-precision products with f32
accumulation, and a 192-term sum of |products| ≤ 16129 stays < 2^24 —
integer-exact in f32. tests/test_pallas_proj.py pins bitwise equality
of the raw dots (interpret mode on CPU, real kernel on TPU).

Scope: the kernel produces RAW block dots [B, P, pad]; scaling,
centroid add, penalty and validity stay in XLA (cheap elementwise /
4-byte-per-slot gathers — ~2% of the codes traffic). Selected by
``MRAG_PROJ_SCAN=pallas`` (ops/proj.py); XLA scan remains the default
until the chip measurement lands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(probe_ref, codes_ref, q_ref, out_ref):
    # codes_ref: [1, pad, p] int8 block for cluster probe[b, j]
    # q_ref:     [B, p] int8 (whole query batch resident in VMEM — tiny;
    #            a per-row (1, p) block violates the (8, 128) block-dim
    #            rule when B doesn't collapse)
    bi = pl.program_id(0)
    # f32 operands: int8 values are exact in f32, and the bf16->f32
    # preferred-type dot trips a Mosaic verification bug on this
    # toolchain ('vector.broadcast' element-type mismatch).
    blk = codes_ref[0].astype(jnp.float32)  # [pad, p]
    # Mosaic restrictions shape the selection: dynamic row slices must
    # be 8-aligned and scalar indexing can't reshape, so compute the
    # block against ALL B query rows (still DMA-bound: pad*p*B MACs
    # ~30 MFLOP vs a 1 MB block transfer) and one-hot-select row bi.
    q_all = q_ref[...].astype(jnp.float32)  # [B, p]
    acc = jax.lax.dot_general(
        blk, q_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [pad, B]
    nb = q_all.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bi
              ).astype(jnp.float32)  # [1, B]
    sel = jax.lax.dot_general(
        acc, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [pad, 1]
    out_ref[0, 0, 0] = sel[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _proj_blocks(probe, codes, q8, *, interpret: bool):
    b, np_ = probe.shape
    nlist, pad, p = codes.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, np_),
        in_specs=[
            pl.BlockSpec((1, pad, p),
                         lambda bi, j, probe_ref: (probe_ref[bi, j], 0, 0)),
            pl.BlockSpec((b, p), lambda bi, j, probe_ref: (0, 0)),
        ],
        # out rides as [B, P, 1, pad]: a (1, 1, pad) 3D block would put
        # a size-1 second-to-last block against the P axis (neither
        # divisible by 8 nor equal) — the extra singleton axis makes the
        # last-two block dims (1, pad) match the array dims exactly
        out_specs=pl.BlockSpec((1, 1, 1, pad),
                               lambda bi, j, probe_ref: (bi, j, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, 1, pad), jnp.float32),
        interpret=interpret,
    )(probe, codes, q8)
    return out.reshape(b, np_, pad)


def proj_blocks_pallas(probe, codes, q8):
    """Raw int-dot scores for every probed cluster block.

    probe [B, P] i32 cluster ids; codes [nlist, pad, p] int8;
    q8 [B, p] int8 → [B, P, pad] f32 (exact integer dots).
    Falls back to interpret mode off-TPU (parity tests).
    """
    return _proj_blocks(probe, codes, q8, interpret=not _on_tpu())
