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


# ---------------------------------------------------------------------------
# Fused GATED scan: codes + scales + eligibility metadata + rowids all
# ride the same pipelined block DMA, and the strict/relaxed/auto filter
# gate (query/engine.py filter_masks + gate_penalty semantics,
# reference corpus_search.py:1427-1555) evaluates IN-KERNEL from
# scalar-prefetched per-query params. This removes every [B, C]-sized
# input of the probed scan — the round-4 path still gathered a
# [B, C] penalty (plus scales/valid/rowids) through XLA's serial
# gather, which dominated the 10M program after the raw-dot kernel
# landed (DIAG_sig_stages_10000000: arms_nosig 3136 ms of which the
# XLA scan itself was 1950 ms).
#
# Eligibility packing (ops/proj.py build_gate_pack), three cluster-
# layout arrays so each compiled variant DMAs only the words its gate
# actually reads (a partial last-dim block would violate Mosaic's
# block-shape rule — the last two block dims must equal the array dims
# or the (8, 128) tile):
#   meta [nlist, pad, 2] i32:
#     word 0: payer u16 | state u16 << 16      (0xFFFF = none/-1)
#     word 1: program u16 | valid bit 16 | regulator bit 17
#   jw   [nlist, pad, TW] i32: j-tag bitset  (strict gating)
#   dpw  [nlist, pad, 2*TW] i32: d-tag + p-tag bitsets (relaxed gating)
# `tag_level` picks the variant: 0 = meta only (batch carries no tag
# bits — 8 B/slot), 1 = meta + j, 2 = meta + j + dp.
#
# qmeta [B, 8] i32 (scalar prefetch): payer, state, program, tag_mode,
# strict_ok, inherit, has_j, has_dp. qbits [B, 3*TW] i32: the query's
# j/d/p tag words (bitcast u32→i32; AND/!=0 tests are bit-pattern
# exact in either signedness).

_QM_PAYER, _QM_STATE, _QM_PROGRAM, _QM_TAGMODE = 0, 1, 2, 3
_QM_STRICTOK, _QM_INHERIT, _QM_HASJ, _QM_HASDP = 4, 5, 6, 7
_NEG_INF = -1e30


def _gated_kernel(tw: int, tag_level: int, probe_ref, qmeta_ref, qbits_ref,
                  codes_ref, words_ref, q_ref, out_ref, rid_ref):
    bi = pl.program_id(0)
    blk = codes_ref[0].astype(jnp.float32)  # [pad, p]
    q_all = q_ref[...].astype(jnp.float32)  # [B, p]
    acc = jax.lax.dot_general(
        blk, q_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [pad, B]
    nb = q_all.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bi
              ).astype(jnp.float32)  # [1, B]
    raw = jax.lax.dot_general(
        acc, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[:, 0]  # [pad]

    # All gate logic in i32 {0,1} arithmetic — Mosaic cannot legalize
    # vector-i1 selects (arith.select on vector<i1> fails), so AND = *,
    # OR = maximum, and the final blend is multiplicative.
    w = words_ref[0]  # [W_lvl, tile] i32, word-major (ProjGate layout)
    e0, e1 = w[0], w[1]
    scale = jax.lax.bitcast_convert_type(w[2], jnp.float32)
    none16 = jnp.int32(0xFFFF)
    payer = e0 & none16
    state = (e0 >> 16) & none16
    program = e1 & none16
    valid = (e1 >> 16) & 1
    reg = (e1 >> 17) & 1

    qp = qmeta_ref[bi, _QM_PAYER]
    qs = qmeta_ref[bi, _QM_STATE]
    qg = qmeta_ref[bi, _QM_PROGRAM]
    tm = qmeta_ref[bi, _QM_TAGMODE]
    s_ok = qmeta_ref[bi, _QM_STRICTOK]  # {0,1}
    inherit = qmeta_ref[bi, _QM_INHERIT]
    has_j = qmeta_ref[bi, _QM_HASJ]
    has_dp = qmeta_ref[bi, _QM_HASDP]

    def as01(cond):  # i1 vector → i32 {0,1}
        return cond.astype(jnp.int32)

    # query ids arrive pre-encoded in the same u16 space (-1 → 0xFFFE
    # "any", -2 → 0xFFFD "none"; see proj.py encode_qmeta) so slot
    # 0xFFFF (no value) never matches a real filter and "any" passes all
    any_p = as01(qp == jnp.int32(0xFFFE))
    ok_p = jnp.maximum(jnp.maximum(any_p, as01(payer == qp)),
                       inherit * reg)
    ok_s = jnp.maximum(as01(qs == jnp.int32(0xFFFE)), as01(state == qs))
    ok_g = jnp.maximum(as01(qg == jnp.int32(0xFFFE)), as01(program == qg))
    meta_ok = ok_p * ok_s * ok_g

    if tag_level >= 1:
        j_ov = jnp.zeros_like(valid)
        for wi in range(tw):
            j_ov = jnp.maximum(
                j_ov, as01((w[4 + wi] & qbits_ref[bi, wi]) != 0))
        strict = valid * meta_ok * jnp.maximum(j_ov, 1 - has_j)
    else:
        strict = valid * meta_ok
    if tag_level >= 2:
        dp_ov = jnp.zeros_like(valid)
        for wi in range(tw):
            dp_ov = jnp.maximum(
                dp_ov, as01((w[4 + tw + wi] & qbits_ref[bi, tw + wi]) != 0))
            dp_ov = jnp.maximum(
                dp_ov,
                as01((w[4 + 2 * tw + wi]
                      & qbits_ref[bi, 2 * tw + wi]) != 0))
        relaxed = valid * meta_ok * jnp.maximum(dp_ov, 1 - has_dp)
    else:
        relaxed = valid * meta_ok
    auto = s_ok * strict + (1 - s_ok) * jnp.maximum(strict, relaxed)
    is0 = as01(tm == 0)
    is1 = as01(tm == 1)
    gate = (is0 * auto + is1 * relaxed
            + (1 - is0) * (1 - is1) * valid).astype(jnp.float32)

    score = raw * scale * gate + (1.0 - gate) * _NEG_INF
    out_ref[0, 0, 0] = score
    rid_ref[0, 0, 0] = w[3]


# Pad-axis tile for the gated scan: a FULL cluster block at the 10M
# shape (pad ~4888) blows the ~16 MB VMEM budget (the block's f32 cast
# alone is 3.7 MB; measured scoped-vmem OOM at 16.89M). The pad axis
# tiles in _PAD_TILE-slot chunks as a third grid axis (fastest-moving:
# the DMA walks one cluster's chunks, then the next probe). IVF builds
# align pad to 512 (index/ivf.py _aligned_pad) so the tile divides.
_PAD_TILE = 512


@functools.partial(jax.jit,
                   static_argnames=("tw", "tag_level", "interpret"))
def _proj_gated(probe, qmeta, qbits, codes, words, q8, *, tw: int,
                tag_level: int, interpret: bool):
    from mobius_rag_tpu.ops.proj import gate_widths

    b, np_ = probe.shape
    nlist, pad, p = codes.shape
    w_full, w01 = gate_widths(tw)
    w_lvl = w_full if tag_level >= 2 else w01
    words = words[:, :w_lvl]  # static prefix of the word rows
    # largest tile that divides pad (index/ivf.py aligns pad to 512):
    # a FULL ~4888-slot block blew the ~16 MB VMEM budget (its f32
    # cast alone is 3.7 MB; measured scoped-vmem OOM at 16.89M)
    tile = next((t for t in (2048, 1024, 512) if pad % t == 0 and pad > t),
                pad)
    n_tiles = pad // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, np_, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, p),
                lambda bi, j, c, probe_ref, *_: (probe_ref[bi, j], c, 0)),
            pl.BlockSpec(
                (1, w_lvl, tile),
                lambda bi, j, c, probe_ref, *_: (probe_ref[bi, j], 0, c)),
            pl.BlockSpec((b, p),
                         lambda bi, j, c, probe_ref, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, tile),
                         lambda bi, j, c, probe_ref, *_: (bi, j, 0, c)),
            pl.BlockSpec((1, 1, 1, tile),
                         lambda bi, j, c, probe_ref, *_: (bi, j, 0, c)),
        ],
    )
    out, rid = pl.pallas_call(
        functools.partial(_gated_kernel, tw, tag_level),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, np_, 1, pad), jnp.float32),
                   jax.ShapeDtypeStruct((b, np_, 1, pad), jnp.int32)],
        interpret=interpret,
    )(probe, qmeta, qbits, codes, words, q8)
    return out.reshape(b, np_, pad), rid.reshape(b, np_, pad)


def proj_gated_blocks_pallas(probe, qmeta, qbits, codes, words, q8, *,
                             tw: int, tag_level: int):
    """Gated block scores for every probed cluster: [B, P, pad] f32
    (raw int dot x dequant scale where the row passes the query's
    filter gate, NEG_INF otherwise) + the slot row ids [B, P, pad] i32
    (word 3 of the gate pack). The caller adds the per-cluster centroid
    score and the query-side dequant scale (both per-[B, P] - cheap XLA
    elementwise)."""
    return _proj_gated(probe, qmeta, qbits, codes, words, q8,
                       tw=tw, tag_level=tag_level,
                       interpret=not _on_tpu())
