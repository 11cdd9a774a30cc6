"""Pallas cluster-block scan (ops/pallas_proj.py): bitwise parity of
the raw block dots vs the int32-exact reference, and end-to-end parity
of proj_search_packed under MRAG_PROJ_SCAN=pallas (interpret mode on
the CPU mesh; the real kernel is driven on the chip by the bench)."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobius_rag_tpu.ops.pallas_proj import proj_blocks_pallas


def _mk(nlist=12, pad=32, p=64, b=4, nprobe=5, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(-120, 120, size=(nlist, pad, p)).astype(np.int8)
    q8 = rng.integers(-127, 127, size=(b, p)).astype(np.int8)
    probe = rng.integers(0, nlist, size=(b, nprobe)).astype(np.int32)
    return codes, q8, probe


def test_raw_dots_bitwise_vs_int32_reference():
    codes, q8, probe = _mk()
    out = np.asarray(proj_blocks_pallas(
        jnp.asarray(probe), jnp.asarray(codes), jnp.asarray(q8)))
    # int32-exact reference (the XLA scan path's arithmetic)
    ref = np.einsum(
        "bjsp,bp->bjs",
        codes[probe].astype(np.int64), q8.astype(np.int64)).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_raw_dots_extreme_values_stay_exact():
    # |sum of products| bounded by p * 127^2 < 2^24 → exact in f32
    codes, q8, probe = _mk(p=128, seed=3)
    codes[:] = 127
    q8[:] = -127
    out = np.asarray(proj_blocks_pallas(
        jnp.asarray(probe), jnp.asarray(codes), jnp.asarray(q8)))
    assert np.all(out == np.float32(128 * 127 * -127))


def test_search_parity_pallas_vs_xla_subprocess():
    """proj_search_packed under MRAG_PROJ_SCAN=pallas must return the
    same (scores, ids) as the XLA scan. The impl flag is read at trace
    time, so the pallas run happens in a subprocess."""
    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os, sys
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "@@REPO@@")
from mobius_rag_tpu.index.ivf import IVFIndex
from mobius_rag_tpu.ops.proj import PackedProj, proj_search_packed

rng = np.random.default_rng(0)
n, d, p = 600, 64, 32
vecs = rng.normal(size=(n, d)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
ivf = IVFIndex.build(jnp.asarray(vecs), nlist=8, iters=4)
pp = PackedProj.from_ivf(ivf, jnp.asarray(vecs), p=p)
q = jnp.asarray(vecs[:5] + 0.01)
pen = jnp.zeros((n,), jnp.float32)
v, i = proj_search_packed(pp, q, pen, 10, 4)
np.save("/tmp/pallas_parity_%s.npy" % os.environ.get("MRAG_PROJ_SCAN", "xla"),
        np.concatenate([np.asarray(v), np.asarray(i, np.float32)], axis=1))
"""
    import os

    script = script.replace("@@REPO@@", os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..")))

    env = dict(os.environ)
    for impl in ("xla", "pallas"):
        env["MRAG_PROJ_SCAN"] = impl
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    a = np.load("/tmp/pallas_parity_xla.npy")
    b = np.load("/tmp/pallas_parity_pallas.npy")
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
