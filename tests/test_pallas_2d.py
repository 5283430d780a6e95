"""Dedicated u-blocked 2-D Pallas TrSpMV (ops/pallas_trspmv2d) — interpret mode.

Correctness contract: matches ``A.T @ x`` (scipy) for 2-D VBC matrices
under the planners the reference tests (AlternatingPacker of strict /
overlap chunkers, ``test/runtests.jl:56-59``) plus the default 5-pass
min-memory alternating DP.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv2 as pk2
from vbcs_tpu.ops import pallas_trspmv2d as pk2d
from vbcs_tpu.ops import windowed_gather as wg
from vbcs_tpu.plan.alternating import AlternatingPacker
from vbcs_tpu.plan.chunkers import EquiChunker, OverlapChunker, StrictChunker


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk2.pl, "pallas_call", patched)
    monkeypatch.setattr(pk2d.pl, "pallas_call", patched)
    monkeypatch.setattr(wg.pl, "pallas_call", patched)
    yield


def banded(m, n, d, band, seed):
    r = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for j in range(n):
        c = int(j * m / n)
        rr = np.clip(c + r.integers(-band, band, d), 0, m - 1)
        rows.extend(rr)
        cols.extend([j] * d)
        vals.extend(r.standard_normal(d))
    return sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()


def blocky(mb, nb, u, w, density, seed):
    """Random block matrix with exact u x w dense tiles."""
    r = np.random.default_rng(seed)
    mask = r.random((mb, nb)) < density
    dense = np.where(
        np.kron(mask, np.ones((u, w), bool)),
        r.standard_normal((mb * u, nb * w)),
        0.0,
    )
    return sp.csc_matrix(dense)


def run_case(A, U, W, method=None, rtol_atol=1e-5):
    B2 = v.vbc2d(A, U, W, method)
    bundle = pk2d.pack_stream_vbc2d(B2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(pk2d.tr_spmv_pallas_2d(bundle, jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=rtol_atol)
    return bundle


def test_blocky_uniform_tiles_stay_2d():
    """A matrix of exact 3x4 tiles under an equi plan packs entirely into
    one (u, w) 2-D class — no 1-D fallback."""
    A = blocky(40, 30, 3, 4, 0.3, seed=1)
    method = AlternatingPacker(EquiChunker(4), EquiChunker(3))  # cols, rows
    bundle = run_case(A, 3, 4, method)
    assert bundle.fmt1d is None
    assert {(c.u, c.w) for c in bundle.classes2d} == {(3, 4)}


def test_banded_default_plan():
    A = banded(600, 512, 8, 80, seed=2)
    bundle = run_case(A, 4, 4)
    assert bundle.classes2d  # at least some stripes go through the 2-D path


@pytest.mark.parametrize(
    "method",
    [
        AlternatingPacker(StrictChunker(4), StrictChunker(4)),
        AlternatingPacker(OverlapChunker(0.7, 4), OverlapChunker(0.7, 4)),
    ],
    ids=["strict", "overlap"],
)
def test_reference_planners(method):
    A = sp.random(300, 260, 0.05, random_state=3, format="csc")
    run_case(A, 4, 4, method)


def test_mixed_heights_fall_back():
    """Stripes with mixed tile heights route through the 1-D stream
    expansion; the combined slot permutation is still correct."""
    A = banded(900, 400, 10, 150, seed=4)
    # uneven row partition: alternating heights 1 and 3
    bundle = run_case(A, 3, 4)
    # both paths coexist on typical irregular inputs
    if bundle.fmt1d is not None:
        assert bundle.total_slots >= A.shape[1]


def test_tile_straddles_x_tile_boundary():
    """Tiles whose rows cross an aligned 1024-element x boundary gather
    from the successor window."""
    u, w = 4, 4
    # offset row partition: heights 2,4,4,...,4,2 — the block at rows
    # 1022..1025 crosses the 1024 edge
    dense = np.zeros((2048, 8))
    rng = np.random.default_rng(5)
    dense[1022 : 1022 + u, 0:w] = rng.standard_normal((u, w))
    dense[98 : 98 + u, w : 2 * w] = rng.standard_normal((u, w))
    A = sp.csc_matrix(dense)
    spl = np.concatenate([[0], np.arange(2, 2048, 4), [2048]])
    Pi = v.SplitPartition(spl.astype(np.int64))
    Phi = v.SplitPartition(np.array([0, w, 2 * w], dtype=np.int64))
    B2 = v.pack_vbc2d(v.CSC.from_scipy(A), Pi, Phi, u, w)
    bundle = pk2d.pack_stream_vbc2d(B2)
    x = rng.standard_normal(2048).astype(np.float32)
    y = np.asarray(pk2d.tr_spmv_pallas_2d(bundle, jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=1e-5)


def test_matches_stream_expansion():
    """The dedicated 2-D kernel and the 1-D stream expansion of the same
    VBC2D agree (they execute the same blocks)."""
    A = banded(1500, 700, 9, 200, seed=6)
    B2 = v.vbc2d(A, 4, 8)
    bundle = pk2d.pack_stream_vbc2d(B2)
    fmt1 = pk2.pack_stream2(B2.to_1d_view())
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal(A.shape[0]), jnp.float32
    )
    y2 = np.asarray(pk2d.tr_spmv_pallas_2d(bundle, x))
    y1 = np.asarray(pk2.tr_spmv_pallas2(fmt1, x))
    scale = max(1e-6, np.abs(y1).max())
    np.testing.assert_allclose(y2 / scale, y1 / scale, atol=1e-5)


def test_corpus_matrix():
    from corpus import load_corpus

    mats = load_corpus()
    A = mats["HB/west0132"].tocsc()
    run_case(A.astype(np.float64), 4, 4)


def test_basis_vectors_exact_2d():
    """One-hot basis vectors reproduce stored tile values exactly
    (reference oracle style, ``test/runtests.jl:63-87``: bitwise
    equality — one-hot x makes every FMA exact)."""
    A = sp.random(24, 30, 0.25, random_state=8, format="csc").astype(np.float32)
    B2 = v.vbc2d(A, 3, 4)
    bundle = pk2d.pack_stream_vbc2d(B2)
    D = A.toarray()
    fn = lambda e: np.asarray(pk2d.tr_spmv_pallas_2d(bundle, jnp.asarray(e)))
    for i in range(0, 24, 2):  # every other basis vector (interpret-mode cost)
        e = np.zeros(24, dtype=np.float32)
        e[i] = 1.0
        assert np.array_equal(fn(e), D.T @ e), i
