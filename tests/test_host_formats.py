"""Host-layer correctness: formats, converters, oracle kernels, planners.

Replicates the reference test strategy (``test/runtests.jl``, SURVEY.md
§4): every format x planner is compared against the CSC reference —
exhaustive basis vectors with *exact* equality on small matrices, dense
reconstruction (the equivalent linear-algebra contract) plus approximate
random-x checks on the rest.  Dtypes cover float64, bool, and int32
(non-float semirings, reference ``runtests.jl:15-16``).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from corpus import load_corpus
from vbcs_tpu import (
    CSC,
    AlternatingPacker,
    ConstrainedCost,
    DynamicTotalChunker,
    EquiChunker,
    OverlapChunker,
    SplitPartition,
    StrictChunker,
    VertexCount,
    model_1dvbc_blocks,
    model_1dvbc_memory,
    vbc1d,
    vbc2d,
)

CORPUS = load_corpus()

METHODS_1D = [
    StrictChunker(4),
    OverlapChunker(0.9, 4),
    DynamicTotalChunker(ConstrainedCost(model_1dvbc_blocks(), VertexCount(), 4)),
    DynamicTotalChunker(ConstrainedCost(model_1dvbc_memory(8, 8), VertexCount(), 4)),
    EquiChunker(3),
]

METHODS_2D = [
    AlternatingPacker(StrictChunker(4), StrictChunker(4)),
    AlternatingPacker(OverlapChunker(0.9, 4), OverlapChunker(0.9, 4)),
]


def random_grid(seed=0xDEADBEEF):
    """Random matrices straddling block widths, per reference
    ``runtests.jl:14-16`` (trimmed trials for runtime)."""
    rng = np.random.default_rng(seed)
    sizes = [1, 2, 3, 4, 5, 7, 8, 9, 16, 17]
    mats = []
    for m in sizes:
        for n in sizes:
            for dtype in (np.float64, np.bool_, np.int32):
                M = sp.random(m, n, 0.2, random_state=rng.integers(2**31))
                if dtype == np.bool_:
                    M = (M != 0).astype(np.bool_)
                elif dtype == np.int32:
                    M = sp.csc_matrix(
                        (
                            rng.integers(-100, 100, M.nnz).astype(np.int32),
                            M.tocsc().indices,
                            M.tocsc().indptr,
                        ),
                        shape=M.shape,
                    )
                mats.append(sp.csc_matrix(M))
    return mats


def check_against_csc(A_sp, B):
    """Basis-vector oracle with exact equality (reference
    ``runtests.jl:28-53``) when small; dense + random-x otherwise."""
    m, n = A_sp.shape
    D = A_sp.toarray()
    assert np.array_equal(B.to_dense(), D)
    from vbcs_tpu.utils.dtypes import acc_dtype

    small = max(m, n) <= 48
    out_dtype = acc_dtype(D.dtype, D.dtype)
    if small:
        for j in range(n):
            e = np.zeros(n, dtype=D.dtype)
            e[j] = True
            assert np.array_equal(
                B.mul(e), (D.astype(out_dtype) @ e.astype(out_dtype))
            ), f"forward basis {j}"
        for i in range(m):
            e = np.zeros(m, dtype=D.dtype)
            e[i] = True
            assert np.array_equal(
                B.tr_mul(e), (D.astype(out_dtype).T @ e.astype(out_dtype))
            ), f"transposed basis {i}"
    else:
        rng = np.random.default_rng(42)
        x = rng.standard_normal(n)
        xt = rng.standard_normal(m)
        assert np.allclose(B.mul(x), D @ x)
        assert np.allclose(B.tr_mul(xt), D.T @ xt)


@pytest.mark.parametrize("name", list(CORPUS))
@pytest.mark.parametrize("mi", range(len(METHODS_1D)))
def test_corpus_1d(name, mi):
    A = CORPUS[name]
    check_against_csc(A, vbc1d(A, 4, METHODS_1D[mi]))


@pytest.mark.parametrize("name", list(CORPUS))
@pytest.mark.parametrize("mi", range(len(METHODS_2D)))
def test_corpus_2d(name, mi):
    A = CORPUS[name]
    check_against_csc(A, vbc2d(A, 4, 4, METHODS_2D[mi]))


def test_random_grid_1d():
    for A in random_grid():
        for method in METHODS_1D:
            B = vbc1d(A, 4, method)
            assert np.array_equal(B.to_dense(), A.toarray())


def test_random_grid_basis_exact():
    """Exhaustive basis vectors on a subset (exact equality, all dtypes)."""
    rng = np.random.default_rng(7)
    for A in random_grid(seed=123)[::7]:
        for method in [METHODS_1D[0], METHODS_1D[3]]:
            check_against_csc(A, vbc1d(A, 4, method))
        for method in METHODS_2D:
            check_against_csc(A, vbc2d(A, 4, 4, method))


def test_random_grid_2d_default():
    for A in random_grid(seed=99)[::11]:
        B = vbc2d(A, 4, 4)  # default 5-pass alternating min-memory
        assert np.array_equal(B.to_dense(), A.toarray())


def test_alpha_beta_semantics():
    """mul!(y, A, x, alpha, beta) semantics — implemented correctly
    (deliberate fix of the reference's ignored-alpha quirk, SURVEY §2.5)."""
    A = CORPUS["LPnetlib/lp_blend"]
    D = A.toarray()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(A.shape[1])
    y0 = rng.standard_normal(A.shape[0])
    B = vbc1d(A, 4)
    got = B.mul(x, alpha=2.5, beta=-0.5, y=y0.copy())
    np.testing.assert_allclose(got, 2.5 * (D @ x) - 0.5 * y0)
    xt = rng.standard_normal(A.shape[0])
    yt = rng.standard_normal(A.shape[1])
    got = B.tr_mul(xt, alpha=2.5, beta=-0.5, y=yt.copy())
    np.testing.assert_allclose(got, 2.5 * (D.T @ xt) - 0.5 * yt)


def test_trspmv_csc_baseline():
    """CSC TrSpMV baseline (reference src/TrSpMV.jl) matches dense."""
    for name, A in CORPUS.items():
        C = CSC.from_scipy(A)
        x = np.random.default_rng(1).standard_normal(A.shape[0])
        np.testing.assert_allclose(C.tr_mul(x), A.toarray().T @ x)


def test_strict_chunker_groups_identical_columns():
    D = np.zeros((6, 6))
    D[[0, 2], 0] = 1.0
    D[[0, 2], 1] = 2.0  # same pattern as col 0
    D[[1], 2] = 1.0
    D[[1], 3] = 1.0
    D[[1], 4] = 1.0
    # col 5 empty
    A = CSC.from_dense(D)
    Phi = StrictChunker(4).partition(A)
    assert list(Phi.spl) == [0, 2, 5, 6]


def test_partition_validation():
    A = CORPUS["LPnetlib/lpi_itest6"]
    with pytest.raises(ValueError):
        vbc1d(A, 2, SplitPartition(np.array([0, 5, A.shape[1]])))  # width 5 > W=2
