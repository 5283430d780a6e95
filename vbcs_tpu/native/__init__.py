"""ctypes bindings for the C++ fast paths (lazy-built with g++).

Set ``VBCS_NO_NATIVE=1`` to force the pure-NumPy implementations.
The shared library is built once into this directory and reused.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "vbc_native.cpp")
_SO = os.path.join(_HERE, "libvbcnative.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    if os.environ.get("VBCS_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.dp_partition.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, f64p, f64p, f64p, f64p,
            i64p, i64p,
        ]
        lib.pack_1dvbc_count.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, i64p, i64p, i64p,
        ]
        lib.pack_1dvbc_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p,
            ctypes.c_int64, i64p, i64p, i64p, i64p, f64p,
        ]
        lib.overlap_chunk.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_double, ctypes.c_int64,
            i64p, i64p,
        ]
        lib.stream_chunk_plan.argtypes = [
            ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        ]
        _lib = lib
        return _lib


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pf64(a):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def dp_partition_native(
    n, num_groups, pos, grp, W, alpha_tab, beta_tabs, gamma_tab, weights
):
    """Run the native DP; returns split points or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    grp = np.ascontiguousarray(grp, dtype=np.int64)
    alpha_tab = np.ascontiguousarray(alpha_tab, dtype=np.float64)
    beta_tabs = np.ascontiguousarray(beta_tabs, dtype=np.float64)
    R = beta_tabs.shape[0] if beta_tabs.ndim == 2 else 1
    beta_flat = beta_tabs.reshape(-1)
    g = (
        np.ascontiguousarray(gamma_tab, dtype=np.float64)
        if gamma_tab is not None
        else None
    )
    wts = (
        np.ascontiguousarray(weights, dtype=np.float64).reshape(-1)
        if weights is not None
        else None
    )
    out_spl = np.zeros(n + 2, dtype=np.int64)
    out_len = np.zeros(1, dtype=np.int64)
    lib.dp_partition(
        int(n),
        int(max(num_groups, 1)),
        _p64(pos),
        _p64(grp),
        int(W),
        int(R),
        _pf64(alpha_tab),
        _pf64(beta_flat),
        _pf64(g),
        _pf64(wts),
        _p64(out_spl),
        _p64(out_len),
    )
    return out_spl[: int(out_len[0])]


def pack_1dvbc_native(m, n, pos, idx, val, spl):
    """Native two-pass CSC->1D-VBC (float64 values); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    val64 = np.ascontiguousarray(val, dtype=np.float64)
    spl = np.ascontiguousarray(spl, dtype=np.int64)
    L = spl.size - 1
    bpos = np.zeros(L + 1, dtype=np.int64)
    bofs = np.zeros(L + 1, dtype=np.int64)
    lib.pack_1dvbc_count(
        int(m), int(n), _p64(pos), _p64(idx), int(L), _p64(spl),
        _p64(bpos), _p64(bofs),
    )
    out_idx = np.zeros(int(bpos[-1]), dtype=np.int64)
    out_val = np.zeros(int(bofs[-1]), dtype=np.float64)
    lib.pack_1dvbc_fill(
        int(m), int(n), _p64(pos), _p64(idx), _pf64(val64), int(L),
        _p64(spl), _p64(bpos), _p64(bofs), _p64(out_idx), _pf64(out_val),
    )
    return bpos, out_idx, bofs, out_val


def overlap_chunk_native(n, pos, idx, rho, w_max):
    """Native greedy overlap chunker; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out_spl = np.zeros(n + 2, dtype=np.int64)
    out_len = np.zeros(1, dtype=np.int64)
    lib.overlap_chunk(
        int(n), _p64(pos), _p64(idx), float(rho), int(w_max),
        _p64(out_spl), _p64(out_len),
    )
    return out_spl[: int(out_len[0])]


def stream_chunk_plan_native(ngr: np.ndarray, NG: int, NS: int):
    """Chunk planning for the stream packer; returns (pieces [P, 4],
    straddle [T], nslots [T]) or None if the lib is unavailable.
    Identical output to the Python loop in pallas_trspmv2._pack_class."""
    lib = get_lib()
    if lib is None:
        return None
    ngr = np.ascontiguousarray(ngr, dtype=np.int64)
    S = ngr.size
    cap = int(S + ngr.sum() // max(NG, 1) + 2)
    pi = np.empty(cap, dtype=np.int64)
    pg0 = np.empty(cap, dtype=np.int64)
    pg1 = np.empty(cap, dtype=np.int64)
    pch = np.empty(cap, dtype=np.int64)
    straddle = np.empty(cap, dtype=np.int64)
    nslots = np.empty(cap, dtype=np.int64)
    out_np = np.zeros(1, dtype=np.int64)
    out_nc = np.zeros(1, dtype=np.int64)
    lib.stream_chunk_plan(
        S, _p64(ngr), NG, NS,
        _p64(pi), _p64(pg0), _p64(pg1), _p64(pch),
        _p64(straddle), _p64(nslots), _p64(out_np), _p64(out_nc),
    )
    P, T = int(out_np[0]), int(out_nc[0])
    pieces = np.stack([pi[:P], pg0[:P], pg1[:P], pch[:P]], axis=1)
    return pieces, straddle[:T].astype(np.int32), nslots[:T].astype(np.int32)


def match_joint_native(T, nv, vreg_of_blk, modes, real,
                       stripe_of_grp=None):
    """C++ joint A-table matcher for the v3 stream packer; None if the
    lib is unavailable (callers fall back to the Python oracle)."""
    return None  # C++ implementation below (wired in a later commit)
