"""Pallas TrSpMV v2 (windowed gather + segmented scan) — interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv as pk1
from vbcs_tpu.ops import pallas_trspmv2 as pk2
from vbcs_tpu.ops import windowed_gather as wg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk1.pl, "pallas_call", patched)
    monkeypatch.setattr(pk2.pl, "pallas_call", patched)
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


CASES = [
    ("banded", banded(300, 400, 5, 100, 1), 4),
    ("banded big-stripe", banded(2000, 1024, 12, 400, 2), 8),
    ("scattered", sp.random(5000, 600, 0.01, random_state=3, format="csc"), 8),
    ("tiny", sp.random(10, 12, 0.4, random_state=4, format="csc"), 3),
]


@pytest.mark.parametrize("name,A,W", CASES, ids=[c[0] for c in CASES])
def test_v2_matches_scipy(name, A, W):
    rng = np.random.default_rng(0)
    for method in [
        v.EquiChunker(W),
        v.DynamicTotalChunker(v.model_1dvbc_memory(4, 4), W),
    ]:
        B = v.vbc1d(A, W, method)
        fmt = pk2.pack_stream2(B)
        x = rng.standard_normal(A.shape[0]).astype(np.float32)
        y = np.asarray(pk2.tr_spmv_pallas2(fmt, jnp.asarray(x)))
        want = (A.T @ x).astype(np.float32)
        scale = max(1e-6, np.abs(want).max())
        np.testing.assert_allclose(y / scale, want / scale, atol=1e-5)


def test_v2_slot_space_consistent():
    """tr_spmv_slots + y_perm == tr_spmv_pallas2."""
    A = CASES[0][1]
    B = v.vbc1d(A, 4)
    fmt = pk2.pack_stream2(B)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(A.shape[0]), jnp.float32
    )
    slots = pk2.tr_spmv_slots(fmt, x)
    y = pk2.tr_spmv_pallas2(fmt, x)
    np.testing.assert_array_equal(
        np.asarray(slots)[np.asarray(fmt.y_perm)], np.asarray(y)
    )


def test_windowed_permute_matches_gather():
    rng = np.random.default_rng(9)
    src_len, n = 50000, 40000
    perm = np.sort(rng.choice(src_len, n, replace=False))
    plan = wg.pack_permute(perm, src_len)
    assert plan is not None
    src = rng.standard_normal(src_len).astype(np.float32)
    out = np.asarray(wg.apply_permute(plan, jnp.asarray(src)))
    np.testing.assert_array_equal(out, src[perm])


def test_windowed_permute_rejects_nonlocal():
    rng = np.random.default_rng(10)
    perm = rng.permutation(100000)[:50000]  # fully scrambled
    assert wg.pack_permute(perm, 100000) is None


def test_natural_identity_fast_path():
    """Uniform-width matrix in natural stripe order: the slot->natural
    map is the identity, the permutation is skipped, and the kernel's
    transposed store is y directly."""
    A = banded(1024, 1024, 6, 50, seed=7)
    B = v.vbc1d(A, 8, v.EquiChunker(8))
    fmt = pk2.pack_stream2(B)
    assert fmt.natural
    assert fmt.y_plan is None
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(pk2.tr_spmv_pallas2(fmt, x))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=1e-5)


def test_disjoint_tile_windows():
    """Rows split between two *distant* aligned 1024-tiles: the old
    contiguous-span rule would have forced the v1 fallback; independent
    per-vreg window bases keep the fused kernel local (wblk == 2)."""
    m, n, W = 12 * 1024, 512, 4
    rng = np.random.default_rng(11)
    rows, cols, vals = [], [], []
    for j in range(n):
        # ~3 rows near the top tile, ~3 near a tile ~10k away
        rr = np.concatenate(
            [rng.integers(0, 900, 3), rng.integers(10 * 1024, 10 * 1024 + 900, 3)]
        )
        rows.extend(rr)
        cols.extend([j] * rr.size)
        vals.extend(rng.standard_normal(rr.size))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    B = v.vbc1d(A, W, v.EquiChunker(W))
    fmt = pk2.pack_stream2(B)
    assert fmt.fallback is None
    assert all(c.wblk <= 2 for c in fmt.classes)
    x = jnp.asarray(rng.standard_normal(m), jnp.float32)
    y = np.asarray(pk2.tr_spmv_pallas2(fmt, x))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=1e-5)


def test_permute_disjoint_tiles():
    """pack_permute with segments gathering from two distant tiles."""
    src_len = 8 * 1024
    n = 2048
    rng = np.random.default_rng(13)
    perm = np.where(
        rng.random(n) < 0.5,
        rng.integers(0, 1024, n),
        rng.integers(6 * 1024, 7 * 1024, n),
    ).astype(np.int64)
    plan = wg.pack_permute(perm, src_len)
    assert plan is not None and plan.wblk <= 2
    src = jnp.asarray(rng.standard_normal(src_len), jnp.float32)
    out = np.asarray(wg.apply_permute(plan, src))
    np.testing.assert_array_equal(out, np.asarray(src)[perm])


def test_all_zero_matrix_and_empty_stripes():
    """Zero-block stripes (and fully empty matrices) pack and run: the
    empty-idx clamp regression (a 2-D operator's forward pack hit
    pack_stream2 on a subset with zero blocks)."""
    Az = sp.csc_matrix((64, 48))
    B = v.vbc1d(Az, 4, v.EquiChunker(4))
    fmt = pk2.pack_stream2(B)
    y = np.asarray(pk2.tr_spmv_pallas2(fmt, jnp.zeros(64, jnp.float32)))
    np.testing.assert_array_equal(y, np.zeros(48, np.float32))
    # sparse matrix whose leading stripes are empty
    A = sp.random(500, 300, 0.005, random_state=21, format="csc").tolil()
    A[:, :40] = 0
    A = A.tocsc()
    B = v.vbc1d(A, 8)
    fmt = pk2.pack_stream2(B)
    x = np.random.default_rng(22).standard_normal(500).astype(np.float32)
    y = np.asarray(pk2.tr_spmv_pallas2(fmt, jnp.asarray(x)))
    want = (A.T @ x).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=1e-5)
