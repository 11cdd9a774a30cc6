"""Projected-residual ANN codes: the MXU-native compression for the
≥4M-rows/chip regime (BASELINE.md build-target config 5).

Why this exists next to ops/pq.py: classic LUT-PQ (ADC) scoring is a
per-element table gather — great on CPUs with pshufb, pathological
under XLA on TPU, which lowers gathers serially (measured 1.9 s/batch32
at 1M rows for m=96 codes vs 34 ms for this module at the same
bytes/row). The TPU-first alternative spends the code bytes on a dense
low-rank view instead of subvector codebooks:

    code(x)  = int8( P (x − centroid(x)) )          # P: [p, D] PCA rows
    score(q) ≈ q·centroid + (Pq) · dequant(code)    # one int8 matmul

- candidate scoring per probed cluster is a [pad, p] × [p] int8
  dot_general — exactly the MXU shape ivf_search_packed runs at wire
  speed, 6-16× less HBM traffic than full-D int8;
- the projection is the top-p principal subspace of the coarse
  residuals, so the discarded dimensions are the lowest-variance ones
  the corpus has (covariance accumulated blockwise on device, eigh on
  device);
- ranking error inside the funnel is repaired by the exact host re-rank
  (SearchEngine._host_rerank) over the top-W candidates, same two-stage
  shape as IVFADC — see MRAG_HOST_FUNNEL.

Measured at 1M×1536 (graded near-duplicate trained-encoder corpus,
nprobe 64, batch 32): funnel recall@10-in-top-1024 0.9906 at
78 ms/batch vs LUT-PQ m=96's 0.9656 at 1909 ms/batch
(scripts/diag_pq_funnel.py / diag_proj_funnel.py).

Reference parity anchor: this plays pgvector's HNSW role
(vector_store.py:274-287) at corpus scales where neither a dense scan
nor a graph index fits the chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mobius_rag_tpu.ops.topk import NEG_INF, merged_topk


def _scan_impl() -> str:
    """Probed-scan implementation: "xla" (default) | "pallas"
    (ops/pallas_proj.py block-DMA kernel). Read at TRACE time — set
    MRAG_PROJ_SCAN before the first search; an in-process flip after
    tracing does not retrace (tests exercise the kernel directly)."""
    import os

    return os.getenv("MRAG_PROJ_SCAN", "xla").strip().lower()


@jax.tree_util.register_pytree_node_class
class PackedProj:
    """Cluster-contiguous int8 projected-residual codes over an IVF
    layout (PackedIVF's block shape with p-byte rows + the projection
    matrix)."""

    FIELDS = ("centroids", "proj", "codes", "scales", "valid", "rowids")

    def __init__(self, centroids, proj, codes, scales, valid, rowids,
                 nlist: int, pad: int, base_nlist: int | None = None,
                 reserve_start: int | None = None):
        self.centroids = centroids  # [nlist, D] f32
        self.proj = proj  # [p, D] f32 orthonormal rows
        self.codes = codes  # [nlist, pad, p] int8
        self.scales = scales  # [nlist, pad] f32 dequant scales
        self.valid = valid  # [nlist, pad] f32
        self.rowids = rowids  # [nlist, pad] i32 global row ids
        self.nlist = nlist
        self.pad = pad
        self.base_nlist = base_nlist if base_nlist is not None else nlist
        # First reserved (streaming-insert) slab; == nlist when none.
        # Static aux so it survives save/load and pytree round trips.
        self.reserve_start = (reserve_start if reserve_start is not None
                              else nlist)

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self.FIELDS),
                (self.nlist, self.pad, self.base_nlist, self.reserve_start))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, nlist=aux[0], pad=aux[1], base_nlist=aux[2],
                   reserve_start=aux[3] if len(aux) > 3 else None)

    @property
    def bytes_per_row(self) -> int:
        return int(self.codes.shape[-1])

    @classmethod
    def from_ivf(cls, ivf, vectors, *, p: int = 256, row_scales=None,
                 sample: int = 200_000, seed: int = 0,
                 block: int = 65536, reserve_slabs: int = 0) -> "PackedProj":
        """Fit the residual PCA + encode all rows cluster-contiguously.

        `vectors` may be a HOST numpy int8 matrix (the codes-only 10M
        regime — gathers happen host-side, raw int8 crosses to the
        device) or a device array. `row_scales` dequantizes int8
        storage. Mirrors PackedPQ.from_ivf's spill handling: overflow
        rows fold into synthetic always-probed slabs.

        ``reserve_slabs`` appends that many EMPTY always-probed slabs
        (zero centroid, valid 0) as streaming-insert headroom: the
        engine's incremental path (SearchEngine._try_ann_incremental)
        encodes published rows into these slots instead of re-running
        the k-means build — a full rebuild at 10M is ~18 min of host
        k-means whose buffers OOM under serving (the reference's
        pgvector HNSW likewise inserts incrementally; republish is its
        steady state, publish.py:27-481). Host mirrors of the slot
        layout (``build_rowids``/``build_valid``, numpy) ride on the
        instance for the engine's row→slot map; they are NOT pytree
        children and vanish across tree ops — only the build-time
        object carries them."""
        host_side = isinstance(vectors, np.ndarray)
        d = vectors.shape[1]
        p = int(min(p, d))
        if host_side:
            scales_np = (np.asarray(row_scales) if row_scales is not None
                         else None)

            def rows_f32(idx) -> jnp.ndarray:
                rows_np = np.asarray(idx)
                blk = jnp.asarray(vectors[rows_np]).astype(jnp.float32)
                if scales_np is not None:
                    blk = blk * jnp.asarray(scales_np[rows_np])[:, None]
                return blk
        else:
            v = jnp.asarray(vectors)
            scl = (jnp.asarray(row_scales) if row_scales is not None
                   else None)

            def rows_f32(idx) -> jnp.ndarray:
                out = jnp.take(v, jnp.asarray(idx), axis=0).astype(jnp.float32)
                if scl is not None:
                    out = out * jnp.take(scl, jnp.asarray(idx))[:, None]
                return out

        members = np.asarray(ivf.members)
        mvalid = np.asarray(ivf.member_valid)
        spill = np.asarray(ivf.spill)[np.asarray(ivf.spill_valid) > 0]
        pad = ivf.pad
        extra = int(np.ceil(len(spill) / pad)) if len(spill) else 0
        nlist = ivf.nlist + extra + reserve_slabs
        rowids = np.zeros((nlist, pad), np.int32)
        valid = np.zeros((nlist, pad), np.float32)
        rowids[: ivf.nlist] = members
        valid[: ivf.nlist] = mvalid
        for e in range(extra):
            seg = spill[e * pad:(e + 1) * pad]
            rowids[ivf.nlist + e, : len(seg)] = seg
            valid[ivf.nlist + e, : len(seg)] = 1.0

        cents = np.asarray(ivf.centroids, np.float32)
        if extra:
            for e in range(extra):
                seg = spill[e * pad:(e + 1) * pad]
                mvec = np.asarray(jax.device_get(
                    rows_f32(seg))).mean(axis=0)
                cents = np.concatenate(
                    [cents, (mvec / max(np.linalg.norm(mvec), 1e-6))[None]],
                    axis=0)
        if reserve_slabs:
            # zero centroids: reserved-slab scores are purely the
            # projected code (residual vs 0 = the row itself)
            cents = np.concatenate(
                [cents, np.zeros((reserve_slabs, d), np.float32)], axis=0)
        cents_dev = jnp.asarray(cents)

        flat = rowids.reshape(-1)
        flat_cell = np.repeat(np.arange(nlist), pad)
        flat_valid = valid.reshape(-1) > 0
        if not flat_valid.any():
            # empty (sub)corpus — e.g. one shard of a tiny sharded store
            eye = jnp.eye(p, d, dtype=jnp.float32)
            obj = cls(cents_dev, eye,
                      jnp.zeros((nlist, pad, p), jnp.int8),
                      jnp.zeros((nlist, pad), jnp.float32),
                      jnp.asarray(valid), jnp.asarray(rowids),
                      nlist, pad, base_nlist=ivf.nlist,
                      reserve_start=nlist - reserve_slabs)
            obj.build_rowids, obj.build_valid = rowids, valid
            return obj

        # ---- residual PCA: blockwise covariance + device eigh ----
        @jax.jit
        def cov_block(rows, cell_c):
            r = rows - cell_c
            return r.T @ r

        rng = np.random.default_rng(seed)
        live_slots = np.flatnonzero(flat_valid)
        pick = np.sort(rng.choice(live_slots,
                                  size=min(sample, len(live_slots)),
                                  replace=False))
        # fixed cov blocking (NOT the scatter `block`): f32 summation
        # order pins the eigh result, so the fitted projection — and
        # therefore the codes — are deterministic w.r.t. `block`
        cov_blk = 65536
        cov = jnp.zeros((d, d), jnp.float32)
        for off in range(0, len(pick), cov_blk):
            sl = pick[off:off + cov_blk]
            cov = cov + cov_block(rows_f32(flat[sl]),
                                  cents_dev[jnp.asarray(flat_cell[sl])])
        _, evecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
        proj = evecs[:, -p:].T  # [p, D] top principal rows

        # ---- encode every slot, scattering cluster-aligned blocks into
        # FINAL-SHAPE donated buffers (nothing round-trips to the host;
        # peak HBM = one codes buffer — see ops.quant.fill_cluster_packed
        # for why the old flat-buffer + slice/reshape tail OOMed) ----
        from mobius_rag_tpu.ops.quant import fill_cluster_packed

        @jax.jit
        def enc_block(rows, cell_c, pm):
            pr = (rows - cell_c) @ pm.T  # [S, p]
            mx = jnp.maximum(jnp.max(jnp.abs(pr), axis=1), 1e-9)
            scale = mx / 127.0
            q8 = jnp.round(pr / scale[:, None]).astype(jnp.int8)
            return q8, scale

        def enc(lo, hi):
            sl = np.arange(lo, hi)
            return enc_block(rows_f32(flat[sl]),
                             cents_dev[jnp.asarray(flat_cell[sl])], proj)

        codes, scales = fill_cluster_packed(
            nlist, pad, enc, (jnp.int8, jnp.float32), (p, 0), block=block)
        obj = cls(cents_dev, proj, codes, scales, jnp.asarray(valid),
                  jnp.asarray(rowids), nlist, pad, base_nlist=ivf.nlist,
                  reserve_start=nlist - reserve_slabs)
        obj.build_rowids, obj.build_valid = rowids, valid
        return obj


# ---------------------------------------------------------------------------
# Incremental mutation (streaming publish/delete without a k-means rebuild)
# ---------------------------------------------------------------------------
# The engine (SearchEngine._try_ann_incremental) owns the bookkeeping
# (row→slot map, reserved-slot cursor); these are the device halves. All
# index arrays are padded to fixed blocks by the caller so XLA compiles
# ONE scatter program per block size, not one per batch length — pads
# repeat the last (cell, slot, value) triple, and duplicate scatter
# writes of identical values are harmless.

@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def scatter_slots(codes, scales, valid, rowids, cells, slots,
                  new_codes, new_scales, new_valid, new_rowids):
    """Write encoded rows into (cell, slot) positions in place (donated
    buffers — no second copy of the multi-GB codes array)."""
    return (codes.at[cells, slots].set(new_codes),
            scales.at[cells, slots].set(new_scales),
            valid.at[cells, slots].set(new_valid),
            rowids.at[cells, slots].set(new_rowids))


@functools.partial(jax.jit, donate_argnums=(0,))
def invalidate_slots(valid, cells, slots):
    """Mask deleted rows' slots (codes stay — NEG_INF gating is enough)."""
    return valid.at[cells, slots].set(0.0)


@jax.jit
def encode_reserved(proj, rows_f32):
    """Encode rows for a RESERVED slab (zero centroid → the code is the
    projection of the row itself, same int8 shape as enc_block)."""
    pr = rows_f32 @ proj.T  # [n, p]
    mx = jnp.maximum(jnp.max(jnp.abs(pr), axis=1), 1e-9)
    scale = mx / 127.0
    return jnp.round(pr / scale[:, None]).astype(jnp.int8), scale


def stack_shard_proj(shards: "list[PackedProj]") -> PackedProj:
    """Leading-shard-axis stack (see index.ivf.stack_shard_ivf for the
    invariants). Each shard keeps its OWN projection + centroids; cells
    a shard doesn't have are fully invalid, zero centroids score 0."""
    base = max(s.base_nlist for s in shards)
    extra = max(s.nlist - s.base_nlist for s in shards)
    nlist, pad = base + extra, max(s.pad for s in shards)
    p = shards[0].codes.shape[-1]
    d = shards[0].centroids.shape[-1]
    cols = {f: [] for f in PackedProj.FIELDS}
    for sh in shards:
        assert sh.codes.shape[-1] == p
        c = np.zeros((nlist, d), np.float32)
        codes = np.zeros((nlist, pad, p), np.int8)
        sc = np.zeros((nlist, pad), np.float32)
        ok = np.zeros((nlist, pad), np.float32)
        rid = np.zeros((nlist, pad), np.int32)
        nb, ne = sh.base_nlist, sh.nlist - sh.base_nlist
        src = {f: np.asarray(getattr(sh, f)) for f in PackedProj.FIELDS}
        for dst_lo, src_lo, n in ((0, 0, nb), (base, nb, ne)):
            c[dst_lo:dst_lo + n] = src["centroids"][src_lo:src_lo + n]
            codes[dst_lo:dst_lo + n, : sh.pad] = src["codes"][src_lo:src_lo + n]
            sc[dst_lo:dst_lo + n, : sh.pad] = src["scales"][src_lo:src_lo + n]
            ok[dst_lo:dst_lo + n, : sh.pad] = src["valid"][src_lo:src_lo + n]
            rid[dst_lo:dst_lo + n, : sh.pad] = src["rowids"][src_lo:src_lo + n]
        for f, a in zip(PackedProj.FIELDS,
                        (c, src["proj"], codes, sc, ok, rid)):
            cols[f].append(a)
    return PackedProj(**{f: np.stack(v) for f, v in cols.items()},
                      nlist=nlist, pad=pad, base_nlist=base)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "approx"))
def proj_search_packed(pp: PackedProj, queries: jnp.ndarray,
                       penalty: jnp.ndarray, k: int, nprobe: int,
                       approx: float = 0.0):
    """Probed masked top-k over projected-residual codes. penalty
    indexes GLOBAL row ids, [C] shared or [B, C] per-query (same
    contract as every other scan op). Returns (scores [B, k], global
    row ids [B, k]); scores approximate cosine for eligible rows.

    Scans over probe RANK with the whole query batch per step: step j
    gathers every query's j-th cluster block [B, pad, p] and scores it
    as one batched int8 dot_general — nprobe MXU steps, not B·nprobe
    scalar micro-ops. Synthetic spill slabs (cells ≥ base_nlist) are
    always probed. Probe scores accumulate as scan outputs and the
    top-k runs ONCE at the end (ops.topk.merged_topk — optionally
    approx_max_k via ``approx``); a per-step running top-k was
    sort-bound at funnel widths."""
    b = queries.shape[0]
    q32 = queries.astype(jnp.float32)
    if penalty.ndim == 1:
        penalty = jnp.broadcast_to(penalty[None, :], (b, penalty.shape[0]))

    cscores = jnp.dot(q32, pp.centroids.T,
                      preferred_element_type=jnp.float32)  # [B, nlist]
    p_eff = min(nprobe, pp.base_nlist)
    _, probe = jax.lax.top_k(cscores[:, : pp.base_nlist], p_eff)
    n_spill = pp.nlist - pp.base_nlist
    if n_spill:
        spill_cells = jnp.broadcast_to(
            jnp.arange(pp.base_nlist, pp.nlist, dtype=probe.dtype)[None, :],
            (b, n_spill))
        probe = jnp.concatenate([probe, spill_cells], axis=1)

    # int8 query projection (the same symmetric-quantization shape as
    # ivf_search_packed: int8×int8 on the MXU, rescale after)
    qp = q32 @ pp.proj.T  # [B, p]
    qmax = jnp.maximum(jnp.max(jnp.abs(qp), axis=1), 1e-9)
    q_scale = qmax / 127.0
    q8 = jnp.round(qp / q_scale[:, None]).astype(jnp.int8)

    if _scan_impl() == "pallas":
        # Pallas cluster-block scan (ops/pallas_proj.py): pipelined
        # block DMA + MXU dot replaces the gather-bound jnp.take path
        # (1950 ms/batch32 at 10M, DIAG_sig_stages_10000000). The raw
        # dots are integer-exact (see module docstring); scaling,
        # centroid, penalty, validity stay here as fused elementwise +
        # 4-byte-per-slot gathers.
        from mobius_rag_tpu.ops.pallas_proj import proj_blocks_pallas

        raw = proj_blocks_pallas(probe, pp.codes, q8)  # [B, P, pad]
        sc = jnp.take(pp.scales, probe, axis=0)
        ok = jnp.take(pp.valid, probe, axis=0)
        rid = jnp.take(pp.rowids, probe, axis=0)
        cs = jnp.take_along_axis(cscores, probe, axis=1)
        pen = jnp.take_along_axis(
            penalty, rid.reshape(b, -1), axis=1).reshape(rid.shape)
        s = (raw * sc * q_scale[:, None, None] + cs[..., None] + pen
             + (1.0 - ok) * NEG_INF)
        vals = s.reshape(b, -1)
        ids = rid.reshape(b, -1)
        nv, ni = merged_topk(vals, ids, k, approx)
        return nv, ni.astype(jnp.int32)

    def scan_probe(tok, pc):
        blk = jnp.take(pp.codes, pc, axis=0)  # [B, pad, p] int8
        sc = jnp.take(pp.scales, pc, axis=0)  # [B, pad]
        ok = jnp.take(pp.valid, pc, axis=0)
        rid = jnp.take(pp.rowids, pc, axis=0)
        acc = jax.lax.dot_general(
            blk, q8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32)  # [B, pad]
        s = acc * sc * q_scale[:, None] \
            + jnp.take_along_axis(cscores, pc[:, None], axis=1) \
            + jnp.take_along_axis(penalty, rid, axis=1) \
            + (1.0 - ok) * NEG_INF
        return tok, (s + tok, rid)

    # carry seeded from the shard-varying penalty (see
    # index.ivf.ivf_search_packed for why a constant init fails under
    # shard_map); it also rides the ys so they stay axis-varying
    veps = penalty[:, :1] * 0.0  # [B, 1]
    _, (ss, rids) = jax.lax.scan(scan_probe, veps, probe.T)
    vals = jnp.moveaxis(ss, 0, 1).reshape(b, -1)  # [B, P*pad]
    ids = jnp.moveaxis(rids, 0, 1).reshape(b, -1)
    nv, ni = merged_topk(vals, ids, k, approx)
    return nv, ni.astype(jnp.int32)
