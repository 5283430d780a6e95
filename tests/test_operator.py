"""VBCOperator API (XLA fallback path on CPU) and row reordering."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from corpus import load_corpus
from vbcs_tpu import CSC
from vbcs_tpu.operator import VBCOperator
from vbcs_tpu.plan.reorder import profile_rows, rcm_rows

CORPUS = load_corpus()


def test_operator_both_directions():
    A = CORPUS["LPnetlib/lp_blend"].astype(np.float64)
    op = VBCOperator.from_csc(A, W=4, use_pallas=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    xf = rng.standard_normal(A.shape[1])
    np.testing.assert_allclose(
        np.asarray(op.tr_mul(jnp.asarray(x))), A.T @ x, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.mul(jnp.asarray(xf))), A @ xf, rtol=1e-5, atol=1e-5
    )
    # host oracles agree
    np.testing.assert_allclose(op.host_tr_mul(x), A.T @ x, rtol=1e-12)
    np.testing.assert_allclose(op.host_mul(xf), A @ xf, rtol=1e-12)
    assert op.memory_bytes() > 0


def test_operator_spmm():
    A = CORPUS["LPnetlib/lpi_itest6"].astype(np.float64)
    op = VBCOperator.from_csc(A, W=4, use_pallas=False)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((A.shape[0], 5))
    Xf = rng.standard_normal((A.shape[1], 5))
    np.testing.assert_allclose(
        np.asarray(op.tr_mul_mat(jnp.asarray(X))), A.T @ X, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.mul_mat(jnp.asarray(Xf))), A @ Xf, rtol=1e-5, atol=1e-5
    )


def test_operator_single_direction_errors():
    A = CORPUS["LPnetlib/lpi_itest6"]
    op = VBCOperator.from_csc(A, W=4, directions="transposed", use_pallas=False)
    try:
        op.mul(jnp.zeros(A.shape[1]))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_profile_rows_reduces_bandwidth():
    rng = np.random.default_rng(2)
    n = 400
    perm0 = rng.permutation(n)
    # banded matrix scrambled by a random row permutation
    diags = sp.diags(
        [np.ones(n - d) for d in range(4)], offsets=list(range(4)), shape=(n, n)
    ).tocsc()
    A = CSC.from_scipy(diags[perm0, :])

    def bandwidth(C):
        S = C.to_scipy().tocoo()
        return int(np.abs(S.row - S.col).max())

    B, perm = profile_rows(A)
    assert bandwidth(B) < bandwidth(A) / 4
    # semantics: A.T @ x == B.T @ x[perm]
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        A.to_scipy().T @ x, B.to_scipy().T @ x[perm], rtol=1e-12
    )


def test_rcm_rows_semantics():
    A = CSC.from_scipy(CORPUS["HB/can_292"].astype(np.float64))
    B, perm = rcm_rows(A)
    x = np.random.default_rng(4).standard_normal(A.m)
    np.testing.assert_allclose(
        A.to_scipy().T @ x, B.to_scipy().T @ x[perm], rtol=1e-12
    )


def test_profile_rows_rectangular():
    A = CSC.from_scipy(CORPUS["LPnetlib/lp_etamacro"])
    B, perm = profile_rows(A)
    x = np.random.default_rng(3).standard_normal(A.m)
    np.testing.assert_allclose(
        A.to_scipy().T @ x, B.to_scipy().T @ x[perm], rtol=1e-12
    )


def test_alpha_beta_device():
    """Device-side alpha/beta (reference mul!(y,A,x,alpha,beta); alpha
    applied correctly — deliberate fix of the reference quirk)."""
    A = sp.random(60, 80, 0.1, random_state=9, format="csc")
    op = VBCOperator.from_csc(A, W=4, use_pallas=False)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(60), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(80), jnp.float32)
    got = np.asarray(op.tr_mul(x, alpha=2.0, beta=-0.5, y=y0))
    want = 2.0 * (A.T @ np.asarray(x, np.float64)) - 0.5 * np.asarray(
        y0, np.float64
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    z = jnp.asarray(rng.standard_normal(80), jnp.float32)
    got2 = np.asarray(op.mul(z, alpha=3.0))
    np.testing.assert_allclose(
        got2, 3.0 * (A @ np.asarray(z, np.float64)), rtol=1e-4, atol=1e-4
    )


def test_operator_2d_both_directions():
    A = CORPUS["LPnetlib/lp_blend"].astype(np.float64)
    from vbcs_tpu.operator import VBC2DOperator

    op = VBC2DOperator.from_csc(A, U=4, W=4, use_pallas=False)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(A.shape[0])
    xf = rng.standard_normal(A.shape[1])
    np.testing.assert_allclose(
        np.asarray(op.tr_mul(jnp.asarray(x))), A.T @ x, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.mul(jnp.asarray(xf))), A @ xf, rtol=1e-5, atol=1e-5
    )
    X = rng.standard_normal((A.shape[0], 6))
    Xf = rng.standard_normal((A.shape[1], 6))
    np.testing.assert_allclose(
        np.asarray(op.tr_mul_mat(jnp.asarray(X))), A.T @ X, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.mul_mat(jnp.asarray(Xf))), A @ Xf, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(op.host_tr_mul(x), A.T @ x, rtol=1e-12)
    np.testing.assert_allclose(op.host_mul(xf), A @ xf, rtol=1e-12)
    assert op.memory_bytes() > 0
    # alpha/beta applied (reference ignores alpha — documented quirk, fixed)
    y0 = rng.standard_normal(A.shape[1])
    got = np.asarray(op.tr_mul(jnp.asarray(x), alpha=2.0, beta=0.5,
                               y=jnp.asarray(y0)))
    np.testing.assert_allclose(got, 2.0 * (A.T @ x) + 0.5 * y0,
                               rtol=1e-5, atol=1e-5)


def test_operator_2d_pallas_interpret(monkeypatch):
    from jax.experimental import pallas as pl
    from vbcs_tpu.operator import VBC2DOperator
    from vbcs_tpu.ops import pallas_trspmv2 as pk2
    from vbcs_tpu.ops import pallas_trspmv2d as pk2d
    from vbcs_tpu.ops import pallas_spmm as pkm
    from vbcs_tpu.ops import windowed_gather as wg

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    for mod in (pk2, pk2d, pkm, wg):
        monkeypatch.setattr(mod.pl, "pallas_call", patched)

    A = sp.random(150, 120, 0.06, random_state=5, format="csc")
    op = VBC2DOperator.from_csc(A, U=4, W=4, use_pallas=True)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    got = np.asarray(op.tr_mul(jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)
    xf = rng.standard_normal(A.shape[1]).astype(np.float32)
    gotf = np.asarray(op.mul(jnp.asarray(xf)))
    wantf = (A @ xf).astype(np.float32)
    scalef = max(1e-6, np.abs(wantf).max())
    np.testing.assert_allclose(gotf / scalef, wantf / scalef, atol=1e-5)


def test_operator_fp64_basis_parity():
    """Config-1 contract: fp64 bitwise parity vs the dense oracle on
    basis vectors, THROUGH the operator's device path (the XLA device
    kernels run the matrix's own dtype — reference runs Float64,
    test/runtests.jl:15)."""
    A = CORPUS["LPnetlib/lpi_itest6"].astype(np.float64)
    op = VBCOperator.from_csc(A, W=4, use_pallas=False)
    Ad = A.toarray()
    for i in range(A.shape[0]):
        e = np.zeros(A.shape[0])
        e[i] = 1.0
        y = np.asarray(op.tr_mul(jnp.asarray(e)))
        assert y.dtype == np.float64
        np.testing.assert_array_equal(y, Ad[i, :])
    for j in range(A.shape[1]):
        e = np.zeros(A.shape[1])
        e[j] = 1.0
        y = np.asarray(op.mul(jnp.asarray(e)))
        np.testing.assert_array_equal(y, Ad[:, j])


def test_operator_bool_int_semirings():
    """Bool and Int32 matrices execute on device in their own dtype
    (reference src/hacks.jl:1 Bool shim + Int32 tests)."""
    rng = np.random.default_rng(3)
    dense = (rng.random((40, 30)) < 0.2)
    Ab = sp.csc_matrix(dense)
    op = VBCOperator.from_csc(Ab, W=4, use_pallas=False)
    x = rng.standard_normal(40)
    got = np.asarray(op.tr_mul(jnp.asarray(x)))
    np.testing.assert_allclose(got, dense.astype(np.float64).T @ x,
                               rtol=1e-12, atol=1e-12)
    Ai = sp.csc_matrix((dense * rng.integers(1, 9, dense.shape)).astype(np.int32))
    opi = VBCOperator.from_csc(Ai, W=4, use_pallas=False)
    xi = rng.integers(-5, 5, 40).astype(np.int32)
    got_i = np.asarray(opi.tr_mul(jnp.asarray(xi)))
    assert got_i.dtype in (np.int32, np.int64)
    np.testing.assert_array_equal(got_i, (Ai.toarray().astype(np.int64).T
                                          @ xi.astype(np.int64)).astype(got_i.dtype))


def _grid_laplacian(k, seed=0, scramble=True):
    """k*k 5-point grid Laplacian, rows/cols randomly relabeled
    (thermal1-like FEM structure hidden behind a bad ordering)."""
    n = k * k
    ii, jj, vv = [], [], []
    for r in range(k):
        for c in range(k):
            u = r * k + c
            ii.append(u); jj.append(u); vv.append(4.0)
            for dr, dc in ((0, 1), (1, 0)):
                r2, c2 = r + dr, c + dc
                if r2 < k and c2 < k:
                    v2 = r2 * k + c2
                    ii += [u, v2]; jj += [v2, u]; vv += [-1.0, -1.0]
    A = sp.coo_matrix((vv, (ii, jj)), shape=(n, n)).tocsc()
    if scramble:
        rng = np.random.default_rng(seed)
        p = rng.permutation(n)
        A = A[p][:, p].tocsc()
    return A


def test_auto_rcm_reorder():
    """A scrambled FEM matrix triggers the auto symmetric-RCM path and
    still matches the oracle (reference analog: the planner choosing
    well on thermal1-like structure, BASELINE.md:77)."""
    A = _grid_laplacian(40)  # 1600 > the 1024 auto threshold
    op = VBCOperator.from_csc(A, W=4, use_pallas=False, reorder="always")
    assert op.row_perm is not None
    from vbcs_tpu.plan.reorder import window_badness
    assert window_badness(op.host_tr) <= window_badness(
        VBCOperator.from_csc(A, W=4, use_pallas=False,
                             reorder="never").host_tr)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    got = np.asarray(op.tr_mul(jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    got_f = np.asarray(op.mul(jnp.asarray(x)))
    np.testing.assert_allclose(got_f, (A @ x).astype(np.float32),
                               rtol=2e-4, atol=2e-4)
    # chained (fallback loop on CPU), boundary perms once per call
    got_c = np.asarray(op.tr_mul_chain(jnp.asarray(x), 2, 0.5))
    want_c = 0.5 * (A.T @ (0.5 * (A.T @ x.astype(np.float64))))
    np.testing.assert_allclose(got_c, want_c.astype(np.float32),
                               rtol=2e-4, atol=2e-4)


def test_auto_rcm_mul_mat():
    """mul_mat / tr_mul_mat apply the auto-RCM boundary permutations
    (round-2 advisor finding: mul_mat returned permuted-row output)."""
    A = _grid_laplacian(40)
    op = VBCOperator.from_csc(A, W=4, use_pallas=False, reorder="always")
    assert op.row_perm is not None
    rng = np.random.default_rng(7)
    X = rng.standard_normal((A.shape[1], 3)).astype(np.float32)
    got = np.asarray(op.mul_mat(jnp.asarray(X)))
    np.testing.assert_allclose(got, (A @ X).astype(np.float32),
                               rtol=2e-4, atol=2e-4)
    got_t = np.asarray(op.tr_mul_mat(jnp.asarray(X)))
    np.testing.assert_allclose(got_t, (A.T @ X).astype(np.float32),
                               rtol=2e-4, atol=2e-4)


def test_chain_dtype_and_zero_iters():
    """tr_mul_chain stays dtype-correct (f64 never silently downcast to
    the f32 Pallas chain) and n_iters=0 returns x unchanged."""
    A = CORPUS["HB/can_292"].astype(np.float64)
    op = VBCOperator.from_csc(A, W=4, use_pallas=False)
    x = np.random.default_rng(2).standard_normal(A.shape[0])
    out = np.asarray(op.tr_mul_chain(jnp.asarray(x), 2))
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, A.T @ (A.T @ x), rtol=1e-10, atol=1e-10)
    out0 = np.asarray(op.tr_mul_chain(jnp.asarray(x), 0))
    np.testing.assert_array_equal(out0, x)


def test_route_tr_spmv_mirrors_operator_dispatch():
    """operator.route_tr_spmv is documented as the single source of
    truth for the shipped per-call kernel (the autotuner fits it, the
    TABLE harness times it).  Pin it to the branch VBCOperator.tr_mul
    actually takes across all three tiers so they cannot drift."""
    import scipy.sparse as sp

    from vbcs_tpu.operator import VBCOperator, route_tr_spmv

    def op_choice(op):
        if op._pallas_tr_oneshot() is not False:
            return "v3_oneshot"
        if op._pallas_scatter("tr") is not None:
            return "scatter"
        return "v2"

    rng = np.random.default_rng(0)

    # v3 tier: banded blocky, uniform-8 plan
    L, d, m = 256, 6, 2048
    cs = np.arange(L) * 8 + 4
    rr = np.clip(cs[:, None] + rng.integers(-40, 40, (L, d)), 0, m - 1)
    rows = np.repeat(rr.reshape(-1), 8)
    cols = (np.repeat(np.arange(L) * 8, d)[:, None]
            + np.arange(8)[None, :]).reshape(-1)
    A1 = sp.coo_matrix((rng.standard_normal(rows.size).astype(np.float32),
                        (rows, cols)), shape=(m, m)).tocsc()
    A1.sum_duplicates()

    # scatter tier: information-free scatter (width-1/2 plans)
    A2 = sp.random(3000, 3000, 0.001, random_state=9,
                   format="csc").astype(np.float32)

    for A in (A1, A2):
        op = VBCOperator.from_csc(A, W=8, reorder="never")
        kname, _, _ = route_tr_spmv(op.host_tr)
        assert kname == op_choice(op), (
            f"route_tr_spmv says {kname}, operator takes "
            f"{op_choice(op)}")
