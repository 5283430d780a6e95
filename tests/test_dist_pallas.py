"""Distributed Pallas TrSpMV over the 8-device CPU mesh (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv2 as pk2
from vbcs_tpu.ops import windowed_gather as wg
from vbcs_tpu.parallel import pallas_spmv as dps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk2.pl, "pallas_call", patched)
    monkeypatch.setattr(wg.pl, "pallas_call", patched)
    yield


def banded(m, n, d, band, seed):
    r = np.random.default_rng(seed)
    rows = np.clip(
        (np.arange(n) * m // n)[:, None] + r.integers(-band, band, (n, d)),
        0,
        m - 1,
    )
    cols = np.repeat(np.arange(n), d)
    return sp.coo_matrix(
        (r.standard_normal(n * d), (rows.reshape(-1), cols)), shape=(m, n)
    ).tocsc()


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_dist_pallas_matches_scipy(ndev):
    A = banded(4000, 4096, 6, 300, 1)
    B = v.vbc1d(A, 8, v.EquiChunker(4))
    fmt = pk2.pack_stream2(B)
    assert fmt.fallback is None
    sfmt = dps.shard_stream(fmt, ndev)
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = dps.place(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(dps.dist_tr_spmv_pallas(sfmt, x, mesh))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    np.testing.assert_allclose(
        y / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )


def test_shard_ranges_respect_straddles():
    straddle = np.array([0, 1, 0, 0, 1, 1, 0, 0], dtype=np.int32)
    ranges = dps._split_ranges(8, straddle, 3)
    assert ranges[0][0] == 0 and ranges[-1][1] == 8
    for (g0, g1), (h0, h1) in zip(ranges, ranges[1:]):
        assert g1 == h0
        if h0 > 0:
            assert straddle[h0 - 1] == 0  # cut only at carry-free points


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_pallas_halo_matches_scipy(ndev):
    """Halo-exchange variant: x sharded by tiles, one all-to-all moves
    only the tiles each device's windows read."""
    A = banded(4000, 4096, 6, 300, 2)
    B = v.vbc1d(A, 8, v.EquiChunker(4))
    fmt = pk2.pack_stream2(B)
    assert fmt.fallback is None
    sfmt = dps.shard_stream(fmt, ndev)
    halo = dps.plan_halo(sfmt)
    # banded matrix: the halo is a sliver, not a replica of x
    assert halo.hmax < halo.tiles_per_dev + 2
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = dps.place(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(jax.jit(
        lambda s, h, xx: dps.dist_tr_spmv_pallas_halo(s, h, xx, mesh)
    )(sfmt, halo, x))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    np.testing.assert_allclose(
        y / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_pallas_halo_overlap_matches_scipy(ndev):
    """Overlapped halo variant: local-window chunks reordered first so
    they can run while the all_to_all is in flight; correctness on the
    virtual mesh, overlap realized by XLA's scheduler on real chips.

    Uses a blocky matrix with single-group stripes (straddle-free):
    runs are single chunks, so whole-run reordering is unconstrained —
    the banded matrix above has straddle-glued runs mixing local and
    remote chunks, for which plan_overlap correctly returns k=0."""
    # 32768 stripes -> 32 chunks (4 per device at ndev=8); each
    # chunk's windows span ~8-9 x tiles, so the device-interior chunks
    # are fully local and only boundary chunks read halo tiles
    L, d, band = 32768, 6, 60
    rng = np.random.default_rng(2)
    m = L * 8
    cs = np.arange(L) * 8 + 4
    rr = np.clip(cs[:, None] + rng.integers(-band, band, (L, d)), 0, m - 1)
    rows = np.repeat(rr.reshape(-1), 8)
    cols = (np.repeat(np.arange(L) * 8, d)[:, None]
            + np.arange(8)[None, :]).reshape(-1)
    A = sp.coo_matrix(
        (rng.standard_normal(rows.size).astype(np.float32),
         (rows, cols)), shape=(m, m)).tocsc()
    A.sum_duplicates()
    B = v.vbc1d(v.CSC.from_scipy(A), 8, v.EquiChunker(8))
    fmt = pk2.pack_stream2(B)
    assert fmt.fallback is None
    sfmt0 = dps.shard_stream(fmt, ndev)
    sfmt1, k_locals = dps.plan_overlap(sfmt0)
    # device-interior chunks are fully local on this blocky matrix:
    # the overlap split must be non-trivial
    assert any(k > 0 for k in k_locals)
    halo = dps.plan_halo(sfmt1)
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt1 = dps.place(sfmt1, mesh)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(jax.jit(
        lambda s, h, xx: dps.dist_tr_spmv_pallas_halo_overlap(
            s, h, k_locals, xx, mesh)
    )(sfmt1, halo, x))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    np.testing.assert_allclose(
        y / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )
    # the reordered non-overlap path must also stay correct (the chunk
    # permutation + y_perm remap is consistent on its own)
    y2 = np.asarray(dps.dist_tr_spmv_pallas_halo(sfmt1, halo, x, mesh))
    np.testing.assert_allclose(
        y2 / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_with_fallback_classes(ndev, monkeypatch):
    """Scattered (non-local) classes shard too: v1 fallback chunks are
    distributed with replicated x (VERDICT r1 weak #4 — previously a
    NotImplementedError)."""
    from vbcs_tpu.ops import pallas_trspmv as pk1
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(pk1.pl, "pallas_call", patched)

    # fully scattered: every stripe's rows are uniform over m
    A = sp.random(20000, 512, 0.005, random_state=7, format="csc")
    B = v.vbc1d(A, 4, v.EquiChunker(2))
    fmt = pk2.pack_stream2(B)
    assert fmt.fallback is not None  # the scattered classes fell back
    sfmt = dps.shard_stream(fmt, ndev)
    assert len(sfmt.fallback) > 0
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = dps.place(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(dps.dist_tr_spmv_pallas(sfmt, x, mesh))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)
