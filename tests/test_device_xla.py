"""Device-format + XLA kernel correctness (CPU backend, fp64).

Contract (SURVEY.md §4): device kernels must match the host NumPy
oracles — exactly on basis vectors (one-hot products are exact in any
binary float format), approximately on random inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from corpus import load_corpus
from vbcs_tpu import (
    CSC,
    AlternatingPacker,
    OverlapChunker,
    StrictChunker,
    vbc1d,
    vbc2d,
)
from vbcs_tpu.formats.device import bin_vbc1d, bin_vbc2d
from vbcs_tpu.ops import csr, xla

CORPUS = load_corpus()


def _f64(A_sp):
    return A_sp.astype(np.float64)


@pytest.mark.parametrize("name", list(CORPUS))
def test_tr_spmv_1d_matches_host(name):
    A = _f64(CORPUS[name])
    B = vbc1d(A, 8)
    dev = bin_vbc1d(B)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    got = jax.jit(xla.tr_spmv)(dev, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), B.tr_mul(x), rtol=1e-12)


@pytest.mark.parametrize("name", list(CORPUS))
def test_spmv_1d_matches_host(name):
    A = _f64(CORPUS[name])
    B = vbc1d(A, 8, StrictChunker(8))
    dev = bin_vbc1d(B)
    x = np.random.default_rng(1).standard_normal(A.shape[1])
    got = jax.jit(xla.spmv)(dev, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), B.mul(x), rtol=1e-12)


@pytest.mark.parametrize("name", ["LPnetlib/lpi_itest6", "HB/west0132", "HB/can_292"])
def test_2d_kernels_match_host(name):
    A = _f64(CORPUS[name])
    B = vbc2d(A, 4, 4, AlternatingPacker(OverlapChunker(0.7, 4), OverlapChunker(0.7, 4)))
    dev = bin_vbc2d(B)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A.shape[0])
    xf = rng.standard_normal(A.shape[1])
    np.testing.assert_allclose(
        np.asarray(jax.jit(xla.tr_spmv)(dev, jnp.asarray(x))),
        B.tr_mul(x),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jax.jit(xla.spmv)(dev, jnp.asarray(xf))),
        B.mul(xf),
        rtol=1e-12,
    )


def test_basis_vectors_exact_1d():
    """fp64 parity on basis vectors — bitwise (reference runtests.jl:38)."""
    A = _f64(CORPUS["LPnetlib/lpi_itest6"])
    B = vbc1d(A, 4)
    dev = bin_vbc1d(B)
    D = A.toarray()
    m, n = A.shape
    trf = jax.jit(xla.tr_spmv)
    fwd = jax.jit(xla.spmv)
    for i in range(m):
        e = np.zeros(m)
        e[i] = 1.0
        assert np.array_equal(np.asarray(trf(dev, jnp.asarray(e))), D.T @ e)
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        assert np.array_equal(np.asarray(fwd(dev, jnp.asarray(e))), D @ e)


@pytest.mark.parametrize("k", [4, 32])
def test_spmm_matches_dense(k):
    A = _f64(CORPUS["LPnetlib/lp_blend"])
    D = A.toarray()
    B1 = vbc1d(A, 8)
    B2 = vbc2d(A, 4, 4, AlternatingPacker(StrictChunker(4), StrictChunker(4)))
    rng = np.random.default_rng(3)
    Xm = rng.standard_normal((A.shape[0], k))
    Xn = rng.standard_normal((A.shape[1], k))
    for B, binf in [(B1, bin_vbc1d), (B2, bin_vbc2d)]:
        dev = binf(B)
        np.testing.assert_allclose(
            np.asarray(jax.jit(xla.tr_spmm)(dev, jnp.asarray(Xm))),
            D.T @ Xm,
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(xla.spmm)(dev, jnp.asarray(Xn))),
            D @ Xn,
            rtol=1e-10,
        )


def test_csc_device_baseline():
    for name, A_sp in CORPUS.items():
        A = CSC.from_scipy(_f64(A_sp))
        dev = csr.CSCDevice.from_host(A)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(A.m)
        xf = rng.standard_normal(A.n)
        np.testing.assert_allclose(
            np.asarray(jax.jit(csr.csc_tr_spmv)(dev, jnp.asarray(x))),
            A_sp.toarray().astype(np.float64).T @ x,
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(csr.csc_spmv)(dev, jnp.asarray(xf))),
            A_sp.toarray().astype(np.float64) @ xf,
            rtol=1e-12,
        )


def test_int32_device_semiring():
    A = CORPUS["Pajek/GD99_c"]  # bool matrix
    B = vbc1d(A, 4)
    dev = bin_vbc1d(B, dtype=np.int32)
    x = np.ones(A.shape[0], dtype=np.int32)
    got = np.asarray(jax.jit(xla.tr_spmv)(dev, jnp.asarray(x)))
    np.testing.assert_array_equal(got, B.tr_mul(x))


def test_random_grid_device():
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    for m in [1, 3, 8, 17]:
        for n in [2, 5, 16]:
            A = sp.random(m, n, 0.3, random_state=int(rng.integers(2**31)), format="csc")
            B = vbc1d(A, 4)
            dev = bin_vbc1d(B)
            x = rng.standard_normal(m)
            np.testing.assert_allclose(
                np.asarray(xla.tr_spmv(dev, jnp.asarray(x))), B.tr_mul(x), rtol=1e-12
            )
            xf = rng.standard_normal(n)
            np.testing.assert_allclose(
                np.asarray(xla.spmv(dev, jnp.asarray(xf))), B.mul(xf), rtol=1e-12
            )
