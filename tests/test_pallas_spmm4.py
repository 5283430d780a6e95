"""SpMM v4 (streaming FMA, k in lanes) — interpret-mode correctness."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_spmm4 as pm4


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pm4.pl, "pallas_call", patched)
    yield


def blocky(L, w, d, band, seed):
    rng = np.random.default_rng(seed)
    m = L * w
    cs = np.arange(L) * w + w // 2
    rr = np.clip(cs[:, None] + rng.integers(-band, band, (L, d)), 0, m - 1)
    rows = np.repeat(rr.reshape(-1), w)
    cols = (np.repeat(np.arange(L) * w, d)[:, None]
            + np.arange(w)[None, :]).reshape(-1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


def check(A, W, k, sl=8):
    B = v.vbc1d(A, W, v.EquiChunker(W))
    fmt = pm4.pack_spmm4(B, sl=sl)
    assert fmt is not None
    rng = np.random.default_rng(0)
    X = rng.standard_normal((A.shape[0], k)).astype(np.float32)
    Y = np.asarray(pm4.tr_spmm_pallas4(fmt, jnp.asarray(X)))
    want = (A.T.astype(np.float64) @ X.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(Y / scale, want / scale, atol=2e-5)
    return fmt


def test_w8_k128():
    A = blocky(64, 8, 4, 60, seed=1)
    fmt = check(A, 8, 128)
    assert fmt.num_chunks >= 2


def test_w8_k32_pad():
    A = blocky(48, 8, 3, 40, seed=2)
    check(A, 8, 32)


def test_w4():
    A = blocky(40, 4, 3, 30, seed=3)
    check(A, 4, 16)


def test_variable_nb_padding():
    # stripes with differing block counts (nb padded to the max)
    A = blocky(32, 8, 5, 50, seed=4).tolil()
    A[:, :8] = 0  # empty first stripe
    A = A.tocsc()
    A.eliminate_zeros()
    check(A, 8, 128)


def test_flagship_scale_budgets():
    """The r3 defect class: pack at bench-flagship scale must keep the
    streamed rowloc block within SMEM and the full double-buffered
    footprint within VMEM (r3 shipped a 1.29 MB scalar-prefetch SMEM
    operand that failed to COMPILE on the flagship — ADVICE r3 high).
    Pure pack + budget math, no kernel run (CI has no TPU)."""
    A = blocky(40000, 8, 8, 400, seed=0)  # == bench.blocky_matrix()
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pm4.pack_spmm4(B)
    assert fmt is not None
    # per-chunk SMEM block (double-buffered) fits the budget
    assert 2 * fmt.sl * fmt.nb * 4 <= pm4.SMEM_BUDGET
    # full double-buffered VMEM footprint fits
    assert pm4._vmem_bytes(fmt.sl, fmt.nb, fmt.nt) <= pm4.VMEM_BUDGET
    # rowloc is streamed (chunk-blocked), not a flat SMEM operand
    assert np.asarray(fmt.rowloc).shape == (fmt.num_chunks,
                                            fmt.sl, fmt.nb)
    # val is lane-major (8 sublanes x blocks): dense VMEM tiling
    assert np.asarray(fmt.val).shape[0] == 8


def test_refuses_multiclass():
    A = blocky(16, 8, 3, 20, seed=5)
    B = v.vbc1d(A, 8, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8))
    widths = B.Phi.widths()
    if (widths == widths[0]).all() and widths[0] == 8:
        pytest.skip("planner produced uniform-8 anyway")
    assert pm4.pack_spmm4(B) is None


def test_2d_view_uniform_tiles():
    """Uniform 2-D tile plans expand to uniform column stripes with
    NB = d*u blocks — the VBC2DOperator SpMM route (mixed-width plans
    refuse and fall back to v2)."""
    import vbcs_tpu as v
    from vbcs_tpu.plan.alternating import AlternatingPacker

    rng = np.random.default_rng(11)
    K, u, w, d = 120, 4, 8, 3
    rb = np.clip(np.arange(K)[:, None] + rng.integers(-15, 15, (K, d)),
                 0, K - 1)
    rows = np.repeat(
        rb.reshape(-1)[:, None] * u + np.arange(u)[None, :], w, axis=0
    ).reshape(-1)
    cols = (np.repeat(np.arange(K) * w, d * u)[:, None]
            + np.arange(w)[None, :]).reshape(-1)
    A2 = sp.coo_matrix(
        (rng.standard_normal(rows.size).astype(np.float32), (rows, cols)),
        shape=(K * u, K * w)).tocsc()
    A2.sum_duplicates()
    B2 = v.vbc2d(v.CSC.from_scipy(A2), u, w,
                 AlternatingPacker(v.EquiChunker(w), v.EquiChunker(u)))
    fmt = pm4.pack_spmm4(B2.to_1d_view(), sl=16)
    assert fmt is not None and fmt.nb == d * u
    X = rng.standard_normal((A2.shape[0], 32)).astype(np.float32)
    Y = np.asarray(pm4.tr_spmm_pallas4(fmt, jnp.asarray(X)))
    want = (A2.T.astype(np.float64) @ X.astype(np.float64)).astype(
        np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(Y / scale, want / scale, atol=2e-5)
