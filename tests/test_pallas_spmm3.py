"""v3 k-tiled SpMM (shared 2-take gather across RHS columns) — interpret."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_spmm3 as sm3
from vbcs_tpu.ops import pallas_trspmv3 as pk3


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(sm3.pl, "pallas_call", patched)
    yield


def banded(m, n, d, band, seed):
    r = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for j in range(n):
        c = int(j * m / n)
        rr = np.unique(np.clip(c + r.integers(-band, band, d), 0, m - 1))
        rows.extend(rr)
        cols.extend([j] * rr.size)
        vals.extend(r.standard_normal(rr.size))
    return sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()


def check(A, W, method, k, kt):
    B = v.vbc1d(A, W, method)
    fmt = pk3.pack_stream3(B, mode="nat", split_identity=False)
    assert fmt is not None
    rng = np.random.default_rng(0)
    X = rng.standard_normal((A.shape[0], k)).astype(np.float32)
    Y = np.asarray(sm3.tr_spmm_pallas3(fmt, jnp.asarray(X), kt=kt))
    want = (A.T @ X.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(Y / scale, want / scale, atol=3e-5)
    return fmt


def test_spmm3_natural_k32():
    A = banded(1024, 1024, 6, 50, seed=1)
    fmt = check(A, 8, v.EquiChunker(8), k=32, kt=8)
    assert fmt.natural


def test_spmm3_slot_mode_k5_pad():
    A = banded(800, 800, 5, 60, seed=3)
    fmt = check(A, 4, v.EquiChunker(4), k=5, kt=4)
    assert not fmt.natural


def test_spmm3_nonidentity():
    A = banded(512, 512, 40, 200, seed=6)
    fmt = check(A, 2, v.EquiChunker(2), k=8, kt=4)
    assert not all(fmt.identities)


def test_spmm3_basis_columns_bitwise():
    """Identity RHS block -> exact columns of A.T (the reference's
    basis-vector oracle batched as SpMM, SURVEY §4)."""
    A = banded(256, 256, 4, 20, seed=9)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, mode="nat", split_identity=False)
    X = np.zeros((256, 8), np.float32)
    for j in range(8):
        X[j * 31, j] = 1.0
    Y = np.asarray(sm3.tr_spmm_pallas3(fmt, jnp.asarray(X), kt=4))
    Ad = A.toarray().astype(np.float32)
    for j in range(8):
        np.testing.assert_array_equal(Y[:, j], Ad[j * 31, :])


def test_spmm3_k128_default_kt():
    """Config-4 shape: k=128 RHS through the shipped default KT=32
    (the bench's SpMM row; neither was covered before)."""
    A = banded(512, 512, 6, 40, seed=11)
    fmt = check(A, 8, v.EquiChunker(8), k=128, kt=sm3.KT)
    assert sm3.KT == 32
    assert fmt.natural
