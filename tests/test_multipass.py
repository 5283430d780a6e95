"""Multipass radix-routed permutation — interpret-mode correctness.

The single-pass Clos router refuses scattered maps (> 7 source tiles
per output segment); pack_multipass must factor them into passes that
each route, and the composition must equal the direct gather.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vbcs_tpu.ops import multipass as mp
from vbcs_tpu.ops import windowed_gather as wg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(wg.pl, "pallas_call", patched)
    yield


def run(g, src_len, mask=None, layout="flat", seed=0):
    plan = mp.pack_multipass(g, src_len, mask=mask, layout=layout)
    assert plan is not None
    src = np.random.default_rng(seed).standard_normal(src_len).astype(
        np.float32)
    out = np.asarray(mp.apply_multipass(plan, jnp.asarray(src)))
    want = src[np.where(mask, g, 0) if mask is not None else g]
    if mask is not None:
        want = np.where(mask, want, 0.0)
    return plan, out, want


def test_scattered_permutation():
    # a random permutation of 40k elements: ~39 tiles per segment,
    # hopeless for the single-pass router -> must multi-pass
    rng = np.random.default_rng(1)
    n = 40000
    g = rng.permutation(n)
    plan, out, want = run(g, n)
    assert plan.n_pass > 1
    np.testing.assert_array_equal(out[:n], want)


def test_scattered_gather_with_duplicates_and_mask():
    rng = np.random.default_rng(2)
    n, src_len = 30000, 7000
    g = rng.integers(0, src_len, n)
    mask = rng.random(n) > 0.1
    plan, out, want = run(g, src_len, mask=mask)
    np.testing.assert_array_equal(out[:n], want)


def test_local_map_uses_single_pass():
    # a banded map the single-pass router handles: no extra passes
    n = 20000
    g = np.clip(np.arange(n) + 17, 0, n - 1)
    plan, out, want = run(g, n)
    assert plan.n_pass == 1
    np.testing.assert_array_equal(out[:n], want)


def test_2d_layout():
    rng = np.random.default_rng(3)
    Np = 2048  # buffer lanes (multiple of 1024)
    src_len = 9000
    perm2d = rng.integers(0, src_len, (8, Np))
    mask2d = rng.random((8, Np)) > 0.2
    # flatten exactly as pack_permute2d does
    g = perm2d.T.reshape(-1)
    mask = mask2d.T.reshape(-1)
    plan = mp.pack_multipass(g, src_len, mask=mask, layout="2d")
    assert plan is not None
    src = rng.standard_normal(src_len).astype(np.float32)
    out = np.asarray(mp.apply_multipass(plan, jnp.asarray(src)))
    assert out.shape == (8, Np)
    want = np.where(mask2d, src[np.where(mask2d, perm2d, 0)], 0.0)
    np.testing.assert_array_equal(out, want)
