"""k-tiled Pallas SpMM (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_spmm as pm
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

    for mod in (pk1, pk2, pm, wg):
        monkeypatch.setattr(mod.pl, "pallas_call", patched)
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


@pytest.mark.parametrize(
    "m,n,d,band,W,k",
    [(1500, 2000, 6, 200, 6, 5), (800, 1024, 5, 150, 4, 4), (300, 256, 4, 80, 8, 9)],
)
def test_spmm_matches_scipy(m, n, d, band, W, k):
    A = banded(m, n, d, band, m + n)
    B = v.vbc1d(A, W)
    fmt = pk2.pack_stream2(B)
    X = np.random.default_rng(0).standard_normal((m, k)).astype(np.float32)
    Y = np.asarray(pm.tr_spmm_pallas(fmt, jnp.asarray(X)))
    want = (A.T @ X).astype(np.float32)
    scale = max(1e-6, np.abs(want).max())
    np.testing.assert_allclose(Y / scale, want / scale, atol=1e-5)
