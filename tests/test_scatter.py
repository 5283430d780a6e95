"""Routed scatter TrSpMV (multipass-gathered) — interpret mode.

The 'no blocking pays' landing spot (reference fallback:
``src/TrSpMV.jl:1-20``): unstructured matrices whose v3 pack refuses
must still run at device rate through the radix-routed gather.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_scatter as ps
from vbcs_tpu.ops import windowed_gather as wg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(wg.pl, "pallas_call", patched)
    monkeypatch.setattr(ps.pl, "pallas_call", patched)
    yield


def scattered(m, n, nnz, seed):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


def check(A, W=8):
    C = v.CSC.from_scipy(A)
    B = v.vbc1d(C, W, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), W))
    fmt = ps.pack_scatter(B)
    assert fmt is not None
    rng = np.random.default_rng(7)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(ps.tr_spmv_scatter(fmt, jnp.asarray(x)))
    want = (A.T.astype(np.float64) @ x.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
    return fmt


def test_scattered_square():
    A = scattered(5000, 5000, 35000, seed=1)
    fmt = check(A)
    # the entry gather must have needed the multipass router
    assert fmt.entry.n_pass >= 1


def test_scattered_rectangular():
    A = scattered(3000, 6000, 20000, seed=2)
    check(A)


def test_heavy_columns_in_slot():
    A = scattered(2000, 2000, 12000, seed=3).tolil()
    A[:40, 5] = 1.5  # 40 entries: 5 sub-columns, still in-slot
    A[:25, 77] = -0.5
    A = A.tocsc()
    fmt = check(A)
    assert fmt.n_spill == 0


def test_heavy_columns_spill():
    A = scattered(2000, 2000, 12000, seed=3).tolil()
    A[:90, 5] = 1.5  # 90 entries > 64-slot cap -> spill path
    A = A.tocsc()
    fmt = check(A)
    assert fmt.n_spill > 0


def test_refuses_blocky():
    # dense 8-wide stripes: mean width 8 > MAX_MEAN_WIDTH -> None
    rng = np.random.default_rng(4)
    m = 512
    d = sp.random(64, 64, 0.3, random_state=5)
    A = sp.kron(d, np.ones((8, 8))).tocsc().astype(np.float32)
    B = v.vbc1d(v.CSC.from_scipy(A), 8, v.EquiChunker(8))
    assert ps.pack_scatter(B) is None


def test_operator_routes_scatter():
    from vbcs_tpu.operator import VBCOperator

    A = scattered(4000, 4000, 24000, seed=6)
    op = VBCOperator.from_csc(A.astype(np.float32), W=8,
                              use_pallas=True, reorder="never")
    if op._pallas_tr_oneshot() is not False:
        pytest.skip("v3 pack unexpectedly succeeded; scatter not reached")
    assert op._pallas_scatter("tr") is not None
    x = np.random.default_rng(8).standard_normal(A.shape[0]).astype(
        np.float32)
    y = np.asarray(op.tr_mul(jnp.asarray(x)))
    want = (A.T.astype(np.float64) @ x.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
