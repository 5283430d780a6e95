"""Distributed v3 one-shot over the 8-device CPU mesh (interpret).

Column-stripe sharding of the fast nat-mode one-shot: each device
runs its column slice, x replicated, y slices concatenated.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv3 as pk3
from vbcs_tpu.parallel import pallas_spmv3 as d3


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


def blocky(L, d, band, seed):
    rng = np.random.default_rng(seed)
    m = L * 8
    cs = np.arange(L) * 8 + 4
    rr = np.clip(cs[:, None] + rng.integers(-band, band, (L, d)), 0, m - 1)
    rows = np.repeat(rr.reshape(-1), 8)
    cols = (np.repeat(np.arange(L) * 8, d)[:, None]
            + np.arange(8)[None, :]).reshape(-1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_oneshot3_matches_scipy(ndev):
    A = blocky(512, 6, 60, seed=1)
    B = v.vbc1d(v.CSC.from_scipy(A), 8, v.EquiChunker(8))
    sfmt = d3.shard_oneshot3(B, ndev)
    assert sfmt is not None
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
    sfmt = d3.place3(sfmt, mesh)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32)
    y = np.asarray(d3.dist_tr_spmv_oneshot3(sfmt, x, mesh))
    want = (A.T.astype(np.float64) @ np.asarray(x).astype(
        np.float64)).astype(np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(y / scale, want / scale, atol=2e-5)


def test_refuses_scan_format():
    # Uniform width-8 stripes but 12 blocks per stripe: pack_stream3
    # produces a scan-format (has_scan=True, identities=(False,));
    # _template hardcodes the identity kernel, so shard_oneshot3 must
    # refuse (it used to accept and silently return wrong y).
    A = blocky(128, 12, 60, seed=3)
    B = v.vbc1d(v.CSC.from_scipy(A), 8, v.EquiChunker(8))
    fmt = pk3.pack_stream3(B, mode="nat")
    assert fmt is not None and (fmt.has_scan
                                or fmt.identities != (True,))
    assert d3.shard_oneshot3(B, 2) is None


def test_refuses_nonuniform():
    A = blocky(64, 4, 30, seed=2)
    B = v.vbc1d(v.CSC.from_scipy(A), 8,
                v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8))
    if (B.Phi.widths() == 8).all():
        pytest.skip("planner produced uniform-8 anyway")
    assert d3.shard_oneshot3(B, 2) is None
