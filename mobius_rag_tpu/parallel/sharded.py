"""Corpus sharding across a device mesh with an all-gather top-k merge.

The TPU-native replacement for the reference's missing scale-out story
(SURVEY §2.9 row 'multi-node scale-out', §5.8): the chunk matrix and all
its companion columns shard along rows over the ``shard`` mesh axis;
each device scans only its shard (arm scores + local top-M + local
rerank signals) under ``shard_map``; the tiny per-shard candidate
payloads (M rows × ~6 floats, not [B, C] scores) are then all-gathered
over ICI and fused/reranked identically on every device.

Communication per query ≈ 3 arms × M candidates × (val + idx + 6
signals) × S shards — a few KB — versus the chunk matrix never leaving
its shard. This is the 'shard-local top-k, allgather merge' recipe
(SURVEY §5.8, scaling-book style).

RRF caveat handled here: reciprocal-rank fusion needs each arm's GLOBAL
ranks. Because the global top-M of an arm is a subset of the union of
shard-local top-Ms, gathering local top-Ms and re-sorting reproduces the
exact single-chip ranks (tested against the dense engine in
tests/test_sharded.py). The strict-count for filter auto-relax is a
psum so every shard takes the same strict/relaxed branch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mobius_rag_tpu.config import Config, get_config
from mobius_rag_tpu.index.store import ChunkStore, DeviceIndex
from mobius_rag_tpu.ops.topk import NEG_INF
from mobius_rag_tpu.query import engine as eng
from mobius_rag_tpu.utils import round_up

_N_SIG = eng.N_SIG  # cos, lex_raw, auth, len, jpd, cov


def _local_candidates(index: DeviceIndex, q: dict, k: int, m: int, axis: str):
    """Per-shard arm scan: delegates to the engine's shared
    arm_candidates with the mesh axis (strict counts psum so every shard
    takes the same auto-relax branch; indices offset to global).
    Returns (vals [3,B,m], gidx [3,B,m], sigs [3,B,m,_N_SIG])."""
    vals, gidx, sigs, _ = eng.arm_candidates(index, q, k, m, axis=axis)
    return vals, gidx, sigs


# The replicated merge is the engine's fuse_and_rerank (shared with the
# single-chip pipeline — one fusion code path ⇒ sharded ≡ dense results).
_fuse_and_rerank = eng.fuse_and_rerank


class ShardedEngine:
    """Search over a corpus sharded across a mesh.

    Build from a ChunkStore: rows are block-partitioned over shards
    (shard s owns global rows [s*Cs, (s+1)*Cs)), so ChunkStore row ids
    remain valid global ids for record lookup."""

    def __init__(self, store: ChunkStore, mesh: Mesh | None = None,
                 cfg: Config | None = None, axis: str | None = None):
        from mobius_rag_tpu.parallel.mesh import make_mesh

        self.cfg = cfg or get_config()
        self.store = store
        self.mesh = mesh or make_mesh(self.cfg.num_shards, self.cfg.shard_axis)
        self.axis = axis or self.cfg.shard_axis
        self.index = self._shard_index(store.index)

    def _shard_index(self, index: DeviceIndex) -> DeviceIndex:
        s = self.mesh.shape[self.axis]
        host = jax.device_get(index)
        arrays = {}
        c_pad = round_up(index.capacity, s)
        for f in index.fields:
            if f in ("lex_cols", "lex_wts"):
                continue  # rebuilt per shard below (row ids must go local)
            a = np.asarray(getattr(host, f))
            # every field is chunk-major except lexical ([H, C]) — the
            # chunk axis is what shards
            chunk_axis = 1 if f == "lexical" else 0
            c = a.shape[chunk_axis]
            if c_pad != c:
                shape = list(a.shape)
                shape[chunk_axis] = c_pad - c
                a = np.concatenate([a, np.zeros(shape, a.dtype)], axis=chunk_axis)
            spec = [None] * a.ndim
            spec[chunk_axis] = self.axis
            arrays[f] = jax.device_put(a, NamedSharding(self.mesh, P(*spec)))
        if "lex_cols" in index.fields:
            sc, sw = self._shard_sparse_tables(s, c_pad)
            spec = NamedSharding(self.mesh, P(self.axis, None))
            arrays["lex_cols"] = jax.device_put(sc, spec)
            arrays["lex_wts"] = jax.device_put(sw.astype(jnp.bfloat16), spec)
        return DeviceIndex(**arrays)

    def _shard_sparse_tables(self, s: int, c_pad: int):
        """Re-key the store's sparse postings per shard: shard s owns
        global rows [s*Cs, (s+1)*Cs); its table holds LOCAL row ids so
        the per-shard arm scan scatter-adds into [B, c_local] directly.
        Tables stack to [S*H, P_local] and shard on axis 0 — inside
        shard_map each device sees its own [H, P_local]."""
        cols_np = self.store._lex_cols_np  # [H, P] global row ids
        wts_np = self.store._lex_wts_np
        h = cols_np.shape[0]
        cs = c_pad // s
        hh, pp = np.nonzero(cols_np >= 0)
        rows = cols_np[hh, pp]
        shard = rows // cs
        key = shard * h + hh  # [NNZ] → row of the stacked [S*H, ...] table
        counts = np.bincount(key, minlength=s * h)
        p_loc = int(round_up(max(8, int(counts.max(initial=0))), 8))
        out_cols = np.full((s * h, p_loc), -1, np.int32)
        out_wts = np.zeros((s * h, p_loc), np.float32)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        # slot within each key run (ks is sorted, so searchsorted-left
        # gives each run's first position)
        slot = np.arange(len(ks)) - np.searchsorted(ks, ks, side="left")
        out_cols[ks, slot] = (rows - shard * cs)[order]
        out_wts[ks, slot] = wts_np[hh, pp][order]
        return out_cols, out_wts

    def _index_specs(self) -> DeviceIndex:
        specs = {}
        for f in self.index.fields:
            ndim = getattr(self.index, f).ndim
            spec = [None] * ndim
            spec[1 if f == "lexical" else 0] = self.axis
            specs[f] = P(*spec)
        return DeviceIndex(**specs)

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _run(self, q: dict, k: int):
        cfg = self.cfg
        s = self.mesh.shape[self.axis]
        c_total = self.index.valid.shape[0]
        c_local = c_total // s
        # Per-shard over-fetch: the global top-(k*over_fetch) of an arm can
        # in the worst case live entirely on one shard.
        m = min(k * cfg.over_fetch, c_local)
        m_global = min(k * cfg.over_fetch, c_total)

        local = shard_map(
            functools.partial(_local_candidates, k=k, m=m, axis=self.axis),
            mesh=self.mesh,
            in_specs=(
                self._index_specs(),
                P(),  # queries replicated
            ),
            out_specs=(P(None, self.axis), P(None, self.axis), P(None, self.axis)),
        )(self.index, q)
        # local returns: vals [3, S*B? ...]  — reshape below
        vals, gidx, sigs = local
        b = q["vec"].shape[0]
        # out along axis 1 was locally [3, B, m] → gathered [3, S*B, m]
        vals = vals.reshape(3, s, b, m)
        gidx = gidx.reshape(3, s, b, m)
        sigs = sigs.reshape(3, s, b, m, _N_SIG)
        return _fuse_and_rerank(vals, gidx, sigs, q, k, cfg.rrf_k, m_global)

    def search_arrays(self, q_host: dict[str, np.ndarray], k: int):
        """Run the sharded pipeline on prepared query arrays (schema =
        SearchEngine.prepare_batch). Returns host dict."""
        q = {key: jnp.asarray(v) for key, v in q_host.items()}
        return jax.device_get(self._run(q, k))

    def search(self, engine, reqs, k: int | None = None):
        """Full search over the sharded index: borrow the (single-chip)
        SearchEngine for host-side prep and result assembly; run the
        compiled portion sharded. `engine` must wrap the SAME ChunkStore
        this ShardedEngine was built from (row ids are shared)."""
        from mobius_rag_tpu.query.engine import QueryRequest

        if isinstance(reqs, QueryRequest):
            reqs = [reqs]
        k = k or self.cfg.default_k
        q, exps = engine.prepare_batch(reqs)
        out = jax.device_get(self._run(q, k))
        return engine._assemble(list(reqs), exps, out, out["idx"].shape[1])
