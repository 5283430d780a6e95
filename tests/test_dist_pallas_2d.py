"""Distributed u-blocked 2-D Pallas TrSpMV over the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv2 as pk2
from vbcs_tpu.ops import pallas_trspmv2d as pk2d
from vbcs_tpu.ops import windowed_gather as wg
from vbcs_tpu.parallel import pallas_spmv2d as dps2
from vbcs_tpu.plan.alternating import AlternatingPacker
from vbcs_tpu.plan.chunkers import EquiChunker


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


def blocky2d(K, u, w, d, band, seed):
    """Banded matrix of exact u x w dense tiles."""
    rng = np.random.default_rng(seed)
    m, n = K * u, K * w
    rb = np.clip(
        np.arange(K)[:, None] + rng.integers(-band, band, (K, d)), 0, K - 1
    )
    rows = rb.reshape(-1)[:, None] * u + np.arange(u)[None, :]
    rows = np.repeat(rows, w, axis=0).reshape(-1)
    cols = np.repeat(np.arange(K) * w, d)
    cols = (np.repeat(cols, u)[:, None] + np.arange(w)[None, :]).reshape(-1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    A.sum_duplicates()
    return A


def make_bundle(K=900, u=3, w=4, d=5, band=120, seed=1):
    A = blocky2d(K, u, w, d, band, seed)
    B2 = v.vbc2d(
        v.CSC.from_scipy(A), u, w, AlternatingPacker(EquiChunker(w), EquiChunker(u))
    )
    bundle = pk2d.pack_stream_vbc2d(B2)
    assert bundle.fmt1d is None
    return A, bundle


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_dist_2d_matches_scipy(ndev):
    A, bundle = make_bundle()
    sfmt = dps2.shard_stream_2d(bundle, ndev)
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = dps2.place_2d(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(dps2.dist_tr_spmv_pallas_2d(sfmt, x, mesh))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    np.testing.assert_allclose(
        y / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_2d_halo_matches_scipy(ndev):
    A, bundle = make_bundle(seed=2)
    sfmt = dps2.shard_stream_2d(bundle, ndev)
    halo = dps2.plan_halo_2d(sfmt)
    assert halo.hmax < halo.tiles_per_dev + 2  # banded: halo is a sliver
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = dps2.place_2d(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(A.shape[0]), jnp.float32
    )
    y = np.asarray(jax.jit(
        lambda s, h, xx: dps2.dist_tr_spmv_pallas_2d_halo(s, h, xx, mesh)
    )(sfmt, halo, x))
    want = (A.T @ np.asarray(x)).astype(np.float32)
    np.testing.assert_allclose(
        y / np.abs(want).max(), want / np.abs(want).max(), atol=1e-5
    )


def test_mixed_height_fallback_raises():
    A = sp.random(700, 500, 0.01, random_state=4, format="csc")
    B2 = v.vbc2d(A, 3, 4)  # irregular: produces a 1-D fallback
    bundle = pk2d.pack_stream_vbc2d(B2)
    if bundle.fmt1d is None:
        pytest.skip("planner produced uniform heights on this input")
    with pytest.raises(NotImplementedError):
        dps2.shard_stream_2d(bundle, 2)
