"""Pallas TrSpMV kernel correctness (interpret mode on CPU).

The Mosaic-compiled path is exercised on real TPU by bench.py and the
TPU smoke scripts; here the same kernel logic runs under the Pallas
interpreter so the full chunking/carry/slot machinery is tested in CI.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", patched)
    yield


def check(A, B, rtol=1e-5):
    fmt = pk.pack_stream(B)
    x = np.random.default_rng(1).standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(pk.tr_spmv_pallas(fmt, jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=rtol)


@pytest.mark.parametrize(
    "m,n,dens,W",
    [(60, 80, 0.1, 4), (200, 300, 0.05, 8), (37, 37, 0.3, 3), (5, 130, 0.5, 8)],
)
def test_pallas_matches_scipy(m, n, dens, W):
    A = sp.random(m, n, dens, random_state=m + n, format="csc")
    for method in [
        v.EquiChunker(3),
        v.StrictChunker(W),
        v.DynamicTotalChunker(v.model_1dvbc_memory(4, 4), W),
    ]:
        check(A, v.vbc1d(A, W, method))


def test_pallas_straddle_carry():
    """Small cq forces stripes to straddle chunk boundaries."""
    A = sp.random(50, 64, 0.4, random_state=9, format="csc")
    B = v.vbc1d(A, 4, v.EquiChunker(4))
    fmt = pk.pack_stream(B, cq_cap=128)
    x = np.random.default_rng(2).standard_normal(50).astype(np.float32)
    y = np.asarray(pk.tr_spmv_pallas(fmt, jnp.asarray(x)))
    np.testing.assert_allclose(y, (A.T @ x).astype(np.float32), atol=1e-5)


def test_pallas_basis_exact():
    """One-hot basis vectors reproduce stored values exactly (HIGHEST
    precision makes the one-hot MXU reduction exact)."""
    A = sp.random(40, 48, 0.2, random_state=3, format="csc").astype(np.float32)
    B = v.vbc1d(A, 4)
    fmt = pk.pack_stream(B)
    D = A.toarray()
    for i in range(40):
        e = np.zeros(40, dtype=np.float32)
        e[i] = 1.0
        y = np.asarray(pk.tr_spmv_pallas(fmt, jnp.asarray(e)))
        assert np.array_equal(y, D.T @ e), i


def test_pack_stream_slot_injective():
    A = sp.random(80, 100, 0.15, random_state=5, format="csc")
    B = v.vbc1d(A, 6)
    fmt = pk.pack_stream(B)
    perm = np.asarray(fmt.y_perm)
    assert np.unique(perm).size == perm.size  # each y element has one slot
