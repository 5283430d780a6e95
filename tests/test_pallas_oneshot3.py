"""Pallas v3 one-shot TrSpMV (natural-layout gather) — interpret mode.

The one-shot packs with ``mode="nat"``: gather metadata targets the
tile-interleaved natural x layout, so a single call needs no entry
permutation at all (reference per-call op: ``bin/test_table.jl:80``).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv3 as pk3


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk3.pl, "pallas_call", patched)
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


def check_oneshot(A, W, method, alpha=None, expect_natural=None):
    B = v.vbc1d(A, W, method)
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None
    assert fmt.entry_mode == "reshape"
    if expect_natural is not None:
        assert fmt.natural == expect_natural
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_oneshot3(fmt, jnp.asarray(x), alpha))
    a = 1.0 if alpha is None else alpha
    want = (a * (A.T @ x.astype(np.float64))).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
    return fmt


def test_natural_uniform8():
    A = banded(1024, 1024, 6, 50, seed=1)
    fmt = check_oneshot(A, 8, v.EquiChunker(8), expect_natural=True)
    assert not fmt.has_straddle


def test_natural_multivreg_store():
    # m large enough that the padded-natural exit store writes every
    # output vreg lane-block (cc > 0) of multiple chunks — guards the
    # per-vreg shuffle's index arithmetic (a cc=0-only bug passed the
    # small tests)
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import blocky_matrix

    A = blocky_matrix(L=2048, w=8, d=8, band=300, seed=21).astype(np.float64)
    fmt = check_oneshot(A, 8, v.EquiChunker(8), expect_natural=True)
    assert fmt.num_chunks >= 2


def test_alpha_fused():
    A = banded(1024, 1024, 6, 50, seed=2)
    check_oneshot(A, 8, v.EquiChunker(8), alpha=0.25)


def test_w4_slot_exit():
    A = banded(800, 800, 5, 60, seed=3)
    check_oneshot(A, 4, v.EquiChunker(4), expect_natural=False)


def test_w1():
    A = banded(300, 300, 3, 30, seed=4)
    check_oneshot(A, 1, v.EquiChunker(1), expect_natural=False)


def test_nonidentity_runs():
    A = banded(512, 512, 40, 200, seed=6)
    fmt = check_oneshot(A, 2, v.EquiChunker(2), expect_natural=False)
    assert not all(fmt.identities)


def test_straddle_carry():
    m = 2048
    rng = np.random.default_rng(7)
    dense = sp.coo_matrix(
        (rng.standard_normal(1600 * 8),
         (np.repeat(np.arange(1600), 8), np.tile(np.arange(8), 1600))),
        shape=(m, m),
    )
    diag = sp.coo_matrix(
        (np.ones(m - 8), (np.arange(8, m), np.arange(8, m))), shape=(m, m)
    )
    A = (dense + diag).tocsc()
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, ng=128, ns=128, mode="nat")
    assert fmt is not None and fmt.has_straddle
    rng2 = np.random.default_rng(8)
    x = rng2.standard_normal(m).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_oneshot3(fmt, jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)


def test_basis_vectors_bitwise():
    A = banded(256, 256, 4, 20, seed=9)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None
    Ad = A.toarray().astype(np.float32)
    for i in list(range(0, 256, 37)) + [255]:
        e = np.zeros(256, np.float32)
        e[i] = 1.0
        y = np.asarray(pk3.tr_spmv_oneshot3(fmt, jnp.asarray(e)))
        np.testing.assert_array_equal(y, Ad[i, :])


def test_multiclass_dp_plan():
    A = banded(500, 500, 5, 60, seed=12)
    B = v.vbc1d(A, 4, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 4), 4))
    widths = B.Phi.widths()
    if (widths == widths[0]).all():
        pytest.skip("planner happened to produce a single class")
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None and len(fmt.ws) > 1
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_oneshot3(fmt, jnp.asarray(x)))
    want = (A.T @ x.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)


def test_rectangular_nat():
    # nat-mode one-shot accepts m != n (gather covers x=m, exit covers
    # y=n); slot-mode still refuses (output layout must compose with x)
    A = banded(600, 900, 5, 60, seed=17)
    check_oneshot(A, 8, v.EquiChunker(8), expect_natural=False)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    assert pk3.pack_stream3(B) is None


def test_nat_format_cannot_chain():
    A = banded(256, 256, 4, 20, seed=14)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, mode="nat")
    x = jnp.zeros(256, jnp.float32)
    with pytest.raises(AssertionError):
        pk3.tr_spmv_chain3(fmt, x, 2)


def test_corpus_can292():
    from corpus import load_corpus

    A = load_corpus()["HB/can_292"].tocsc().astype(np.float64)
    check_oneshot(A, 4, v.EquiChunker(4), expect_natural=False)


def test_beta_fused_natural():
    """beta*y fuses into the kernel's output store on natural formats:
    parity with the host oracle AND no XLA elementwise mul/add in the
    jaxpr (reference beta prescale, src/multiply_1DVBC.jl:143-147)."""
    import jax

    A = banded(1024, 1024, 6, 50, seed=11)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None and fmt.natural
    rng = np.random.default_rng(12)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y0 = rng.standard_normal(A.shape[1]).astype(np.float32)
    out = np.asarray(pk3.tr_spmv_oneshot3(
        fmt, jnp.asarray(x), 0.5, 0.25, jnp.asarray(y0)))
    want = (0.5 * (A.T @ x.astype(np.float64))
            + 0.25 * y0.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(out / scale, want / scale, atol=2e-5)
    # the hot op has NO post-hoc XLA elementwise pass: every mul/add
    # lives inside the pallas_call
    jaxpr = jax.make_jaxpr(
        lambda f, xx, yy: pk3.tr_spmv_oneshot3(f, xx, 0.5, 0.25, yy)
    )(fmt, jnp.asarray(x), jnp.asarray(y0))
    names = {e.primitive.name for e in jaxpr.jaxpr.eqns}
    assert "mul" not in names and "add" not in names, names


def test_beta_posthoc_nonnatural():
    A = banded(800, 800, 5, 60, seed=13)
    B = v.vbc1d(A, 4, v.EquiChunker(4))
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None and not fmt.natural
    rng = np.random.default_rng(14)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y0 = rng.standard_normal(A.shape[1]).astype(np.float32)
    out = np.asarray(pk3.tr_spmv_oneshot3(
        fmt, jnp.asarray(x), None, 0.75, jnp.asarray(y0)))
    want = ((A.T @ x.astype(np.float64))
            + 0.75 * y0.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(out / scale, want / scale, atol=2e-5)


def test_slot_store_exit_w5_multigroup():
    """w=5 multi-group FEM-like format: the sublane-major exit needs
    w+1 windows per output segment (unroutable single-pass), so pack
    chooses the slot-major Eklundh store whose exit map (flat =
    8*slot + wi) routes in one pass — never the XLA gather (the
    round-5 root cause of the 0.66 Gnnz/s multi-group cliff)."""
    from vbcs_tpu.ops import multipass as mpm
    from vbcs_tpu.ops import windowed_gather as wgm

    k = 48
    n = k * k
    A = sp.diags(
        [np.full(n, 4.0), -np.ones(n - 1), -np.ones(n - 1),
         -np.ones(n - k), -np.ones(n - k)],
        [0, 1, -1, k, -k], format="csc").astype(np.float32)
    B = v.vbc1d(v.CSC.from_scipy(A), 8,
                v.SplitPartition(np.arange(0, n + 1, 5)[
                    : n // 5 + 1] if n % 5 == 0 else
                    np.concatenate([np.arange(0, n, 5), [n]])))
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None
    assert fmt.slot_store, "w=5 multi-group should take the slot store"
    assert not isinstance(fmt.exit_plan, mpm.MultipassPlan)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32)
    # the exit permute kernel needs interpret too
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kk):
        kk["interpret"] = True
        kk.pop("compiler_params", None)
        return orig(*a, **kk)

    wgm.pl.pallas_call = patched
    try:
        y = np.asarray(pk3.tr_spmv_oneshot3(fmt, jnp.asarray(x)))
    finally:
        wgm.pl.pallas_call = orig
    want = (A.T @ x.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
