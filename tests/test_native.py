"""Native (C++) fast paths must match the NumPy oracles bitwise."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.formats.csc import CSC
from vbcs_tpu.formats.vbc1d import pack_1dvbc
from vbcs_tpu.native import get_lib
from vbcs_tpu.plan.dynamic import dp_partition

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _rand_csc(m, n, nnz, seed, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = sp.coo_matrix(
        (
            rng.standard_normal(nnz).astype(dtype),
            (rng.integers(0, m, nnz), rng.integers(0, n, nnz)),
        ),
        shape=(m, n),
    ).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return CSC.from_scipy(A)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_native_dp_matches_numpy(seed):
    A = _rand_csc(500, 700, 3000, seed)
    for model in [
        v.model_1dvbc_memory(8, 8),
        v.model_1dvbc_blocks(),
        v.AffineConnectivityModel(2.0, 0.5, 0.25, 1.0),
        v.AffineFillNetCostModel(24, 0, 8, 8),
    ]:
        s_nat = dp_partition(A, model, 6)
        os.environ["VBCS_NO_NATIVE"] = "1"
        try:
            s_np = dp_partition(A, model, 6)
        finally:
            del os.environ["VBCS_NO_NATIVE"]
        assert s_nat == s_np, type(model).__name__


def test_native_dp_2d_matches_numpy():
    A = _rand_csc(300, 400, 2000, 7)
    Pi = v.SplitPartition.equi(300, 3)
    model = v.model_vbc_memory(8, 8)
    s_nat = dp_partition(A, model, 5, Pi)
    os.environ["VBCS_NO_NATIVE"] = "1"
    try:
        s_np = dp_partition(A, model, 5, Pi)
    finally:
        del os.environ["VBCS_NO_NATIVE"]
    assert s_nat == s_np


@pytest.mark.parametrize("dtype", [np.float64, np.float32, np.int32])
def test_native_pack_matches_numpy(dtype):
    A = _rand_csc(200, 300, 2500, 11, np.float64)
    A = CSC(m=A.m, n=A.n, pos=A.pos, idx=A.idx, val=A.val.astype(dtype))
    Phi = v.pack_stripe(A, v.EquiChunker(5))
    B_nat = pack_1dvbc(A, Phi, 5)
    os.environ["VBCS_NO_NATIVE"] = "1"
    try:
        B_np = pack_1dvbc(A, Phi, 5)
    finally:
        del os.environ["VBCS_NO_NATIVE"]
    assert np.array_equal(B_nat.pos, B_np.pos)
    assert np.array_equal(B_nat.idx, B_np.idx)
    assert np.array_equal(B_nat.ofs, B_np.ofs)
    assert np.array_equal(B_nat.val, B_np.val)
    assert B_nat.val.dtype == B_np.val.dtype


def test_stream_chunk_plan_matches_python():
    """C++ chunk planner == the Python oracle loop, incl. straddles."""
    from vbcs_tpu.native import stream_chunk_plan_native

    rng = np.random.default_rng(17)
    for trial in range(4):
        S = int(rng.integers(1, 400))
        ngr = rng.integers(1, 50, S).astype(np.int64)
        ngr[rng.random(S) < 0.05] = int(rng.integers(100, 400))  # big stripes
        NGc, NSc = 128, 64
        got = stream_chunk_plan_native(ngr, NGc, NSc)
        if got is None:
            import pytest

            pytest.skip("native lib unavailable")
        # python oracle
        g_in, s_in, chunk = 0, 0, 0
        pieces, straddle, nslots = [], [], []
        for i in range(S):
            left = int(ngr[i]); g0 = 0
            if s_in >= NSc or g_in >= NGc:
                straddle.append(0); nslots.append(s_in)
                chunk += 1; g_in = 0; s_in = 0
            while left > 0:
                take = min(NGc - g_in, left)
                pieces.append((i, g0, g0 + take, chunk))
                g_in += take; g0 += take; left -= take
                if left > 0:
                    straddle.append(1); nslots.append(s_in)
                    chunk += 1; g_in = 0; s_in = 0
            s_in += 1
        straddle.append(0); nslots.append(s_in)
        np.testing.assert_array_equal(got[0], np.asarray(pieces))
        np.testing.assert_array_equal(got[1], np.asarray(straddle))
        np.testing.assert_array_equal(got[2], np.asarray(nslots))


def test_match_joint_native_parity():
    """C++ match_joint == Python oracle bit-for-bit on a multi-class
    scrambled-FEM pack (exercises dual-mode matching, DFS retries,
    window duplication)."""
    import os

    import pytest

    import scipy.sparse as sp

    from vbcs_tpu.native import get_lib
    from vbcs_tpu.operator import VBCOperator
    from vbcs_tpu.ops import pallas_trspmv3 as pk3

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    k = 64
    nn = k * k
    A = sp.diags(
        [np.full(nn, 4.0), -np.ones(nn - 1), -np.ones(nn - 1),
         -np.ones(nn - k), -np.ones(nn - k)],
        [0, 1, -1, k, -k], format="csc")
    p = np.random.default_rng(5).permutation(nn)
    A = A[p][:, p].tocsc().astype(np.float32)
    op = VBCOperator.from_csc(A, W=8)
    B = op.host_tr
    os.environ["VBCS_NO_NATIVE"] = "1"
    try:
        f_py = pk3.pack_stream3(B)
    finally:
        del os.environ["VBCS_NO_NATIVE"]
    f_cc = pk3.pack_stream3(B)
    assert (f_py is None) == (f_cc is None)
    if f_py is None:
        return
    assert f_py.ws == f_cc.ws and f_py.offs == f_cc.offs
    assert f_py.nwins == f_cc.nwins and f_py.entry_mode == f_cc.entry_mode
    np.testing.assert_array_equal(
        np.asarray(f_py.meta_nat), np.asarray(f_cc.meta_nat))
    np.testing.assert_array_equal(
        np.asarray(f_py.meta_slot), np.asarray(f_cc.meta_slot))
    np.testing.assert_array_equal(
        np.asarray(f_py.xtile_nat), np.asarray(f_cc.xtile_nat))
    for a, b in zip(f_py.vals, f_cc.vals):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clos_route_native_parity():
    """C++ clos_route == Python routing loop bit-for-bit (banded,
    masked, and unroutable permutations)."""
    import os

    import pytest

    from vbcs_tpu.native import get_lib
    from vbcs_tpu.ops import windowed_gather as wg

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    cases = []
    n = 20000
    cases.append((np.clip(np.arange(n) + rng.integers(-200, 200, n),
                          0, n - 1), n, None))
    mask = rng.random(9000) > 0.2
    cases.append((np.arange(9000), 9000, mask))
    cases.append((rng.permutation(30000), 30000, None))  # unroutable
    for perm, sl, m in cases:
        os.environ["VBCS_NO_NATIVE"] = "1"
        try:
            p_py = wg.pack_clos(perm, sl, mask=m)
        finally:
            del os.environ["VBCS_NO_NATIVE"]
        p_cc = wg.pack_clos(perm, sl, mask=m)
        assert (p_py is None) == (p_cc is None)
        if p_py is None:
            continue
        assert (p_py.wblk, p_py.num_chunks) == (p_cc.wblk, p_cc.num_chunks)
        np.testing.assert_array_equal(
            np.asarray(p_py.meta), np.asarray(p_cc.meta))
        np.testing.assert_array_equal(
            np.asarray(p_py.xtile), np.asarray(p_cc.xtile))
        np.testing.assert_array_equal(
            np.asarray(p_py.valid), np.asarray(p_cc.valid))
