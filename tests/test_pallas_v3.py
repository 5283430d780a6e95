"""Pallas v3 fused chained TrSpMV (exact 2-take gather) — interpret mode."""

import numpy as np
import pytest
import jax
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


def check_chain(A, W, method, n_iters=1, alpha=None, expect_natural=None):
    B = v.vbc1d(A, W, method)
    fmt = pk3.pack_stream3(B)
    assert fmt is not None
    if expect_natural is not None:
        assert fmt.natural == expect_natural
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(x), n_iters, alpha))
    a = 1.0 if alpha is None else alpha
    want = x.astype(np.float64)
    for _ in range(n_iters):
        want = a * (A.T @ want)
    want = want.astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
    return fmt


def test_natural_uniform8():
    A = banded(1024, 1024, 6, 50, seed=1)
    fmt = check_chain(A, 8, v.EquiChunker(8), expect_natural=True)
    assert not fmt.has_straddle


def test_natural_identity_flagship_shape():
    """One group per stripe (the flagship bench structure): identity
    chunks, no scan, no carry."""
    m = 1024
    rng = np.random.default_rng(11)
    rows = np.clip(
        (np.arange(128) * 8 + 4)[:, None] + rng.integers(-40, 40, (128, 8)),
        0, m - 1,
    )
    cols = (np.repeat(np.arange(128) * 8, 8)[:, None]
            + np.arange(8)[None, :]).reshape(-1)
    rows = np.repeat(rows.reshape(-1), 8)
    A = sp.coo_matrix(
        (rng.standard_normal(rows.size), (rows, cols)), shape=(m, m)
    ).tocsc()
    A.sum_duplicates()
    fmt = check_chain(A, 8, v.EquiChunker(8), n_iters=3, alpha=0.9,
                      expect_natural=True)
    assert all(fmt.identities) and not fmt.has_straddle


def test_natural_chain3():
    A = banded(1024, 1024, 6, 50, seed=2)
    check_chain(A, 8, v.EquiChunker(8), n_iters=3, alpha=0.5,
                expect_natural=True)


def test_slot_mode_w4_chain():
    A = banded(800, 800, 5, 60, seed=3)
    check_chain(A, 4, v.EquiChunker(4), n_iters=2, expect_natural=False)


def test_slot_mode_w1():
    A = banded(300, 300, 3, 30, seed=4)
    check_chain(A, 1, v.EquiChunker(1), n_iters=2, expect_natural=False)


def test_nonidentity_runs():
    """Stripes with many blocks -> multi-group runs -> segmented scan."""
    A = banded(512, 512, 40, 200, seed=6)
    fmt = check_chain(A, 2, v.EquiChunker(2), n_iters=2,
                      expect_natural=False)
    assert not all(fmt.identities)


def test_straddle_carry():
    """A stripe spanning more groups than a chunk holds straddles the
    chunk boundary and is merged through the VMEM carry (small ng/ns
    so the case is cheap in interpret mode)."""
    m = 2048
    rng = np.random.default_rng(7)
    # stripe 0 (cols 0..7): dense 1600x8 block = 200 groups; with
    # ng=ns=128 it spans chunks 0 and 1.  All other stripes: diagonal.
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
    fmt = pk3.pack_stream3(B, ng=128, ns=128)
    assert fmt is not None and fmt.has_straddle
    rng2 = np.random.default_rng(8)
    x = rng2.standard_normal(m).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(x), 1))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
    # and a 2-iteration chain through the carry path
    y2 = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(x), 2))
    want2 = (A.T @ (A.T @ x.astype(np.float64))).astype(np.float32)
    scale = max(1e-6, np.abs(want2).max())
    np.testing.assert_allclose(y2 / scale, want2 / scale, atol=2e-5)


def test_basis_vectors_bitwise():
    """Reference oracle: exact equality on unit vectors
    (test/runtests.jl:28-53)."""
    A = banded(256, 256, 4, 20, seed=9)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B)
    assert fmt is not None
    Ad = A.toarray().astype(np.float32)
    for i in list(range(0, 256, 37)) + [255]:
        e = np.zeros(256, np.float32)
        e[i] = 1.0
        y = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(e), 1))
        np.testing.assert_array_equal(y, Ad[i, :])


def test_nonsquare_returns_none():
    A = banded(300, 400, 5, 100, seed=10)
    B = v.vbc1d(A, 4, v.EquiChunker(4))
    assert pk3.pack_stream3(B) is None


def test_multiclass_dp_plan_chain():
    """The DP planner's variable-width output runs the fused chain
    directly (round-2 verdict item 2: planner and fast kernel must not
    be mutually exclusive)."""
    A = banded(500, 500, 5, 60, seed=12)
    B = v.vbc1d(A, 4, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 4), 4))
    widths = B.Phi.widths()
    if (widths == widths[0]).all():
        pytest.skip("planner happened to produce a single class")
    fmt = pk3.pack_stream3(B)
    assert fmt is not None and len(fmt.ws) > 1
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500).astype(np.float32)
    for n_iters in (1, 3):
        y = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(x), n_iters))
        want = x.astype(np.float64)
        for _ in range(n_iters):
            want = A.T @ want
        want = want.astype(np.float32)
        scale = max(1e-6, np.abs(want).max())
        np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)


def test_multiclass_mixed_small_widths():
    """Hand-built widths {1, 2, 3} partition across class segments."""
    A = banded(384, 384, 4, 40, seed=13)
    spl = [0]
    wseq = [1, 2, 3, 2, 1, 3]
    i = 0
    while spl[-1] < 384:
        spl.append(min(384, spl[-1] + wseq[i % len(wseq)]))
        i += 1
    from vbcs_tpu.formats.partition import SplitPartition

    B = v.vbc1d(A, 4, SplitPartition(np.asarray(spl, dtype=np.int64)))
    fmt = pk3.pack_stream3(B)
    # classes split by width AND single/multi-group; widths {1,2,3}
    assert fmt is not None and set(fmt.ws) == {1, 2, 3}
    rng = np.random.default_rng(1)
    x = rng.standard_normal(384).astype(np.float32)
    y = np.asarray(pk3.tr_spmv_chain3(fmt, jnp.asarray(x), 2, 0.5))
    want = 0.5 * (A.T @ (0.5 * (A.T @ x.astype(np.float64))))
    want = want.astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)


def test_corpus_can292():
    from corpus import load_corpus

    A = load_corpus()["HB/can_292"].tocsc().astype(np.float64)
    check_chain(A, 4, v.EquiChunker(4), n_iters=2, expect_natural=False)


def test_chain_slot_store_w5_multigroup(monkeypatch):
    """Chain on a w=5 multi-group Laplacian: the slot-major chain
    store (out_ref = tot8.T, (ns, 8) blocks) pairs with the
    single-pass slot-major exit — the chain analog of the one-shot's
    slot-store tier."""
    from vbcs_tpu.ops import windowed_gather as wgm
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(wgm.pl, "pallas_call", patched)
    k = 48
    n = k * k
    A = sp.diags(
        [np.full(n, 4.0), -np.ones(n - 1), -np.ones(n - 1),
         -np.ones(n - k), -np.ones(n - k)],
        [0, 1, -1, k, -k], format="csc").astype(np.float32)
    spl = np.concatenate([np.arange(0, n, 5), [n]]) \
        if n % 5 else np.arange(0, n + 1, 5)
    fmt = check_chain(A, 8, v.SplitPartition(np.asarray(spl, np.int64)),
                      n_iters=2, alpha=0.1)
    assert fmt.slot_store
