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
            f64p, i64p, i64p,
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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.match_joint.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, u8p, i64p, i64p, i64p, i64p,
            i64p, i64p, i64p, i16p, i64p, i64p, i64p,
        ]
        lib.clos_route.argtypes = [
            ctypes.c_int64, i64p, u8p, ctypes.c_int64,
            i32p, i32p, i64p, i64p,
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
    n, num_groups, pos, grp, W, alpha_tab, beta_tabs, gamma_tab, weights,
    delta_tab=None,
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
    d = (
        np.ascontiguousarray(delta_tab, dtype=np.float64)
        if delta_tab is not None
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
        _pf64(d),
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
    lib is unavailable (callers fall back to the Python oracle).

    Exact port: identical sub/window assignments, A-tables, and reflow
    decisions to ``pallas_trspmv3._match_joint`` (parity-tested,
    tests/test_pallas_v3.py)."""
    lib = get_lib()
    M = len(modes)
    if lib is None or M > 2:
        return None
    MAX_NWIN = 7
    nblk = int(real.size)
    nvreg = int(T * nv)
    ngrp = nblk // 8
    vreg = np.ascontiguousarray(vreg_of_blk, dtype=np.int64)
    real_u8 = np.ascontiguousarray(real, dtype=np.uint8)
    hs_a = np.ascontiguousarray(
        np.stack([m[0] for m in modes]), dtype=np.int64).reshape(-1)
    tile_a = np.ascontiguousarray(
        np.stack([m[1] for m in modes]), dtype=np.int64).reshape(-1)
    lo_a = np.ascontiguousarray(
        np.stack([m[2] for m in modes]), dtype=np.int64).reshape(-1)
    sog = (np.ascontiguousarray(stripe_of_grp, dtype=np.int64)
           if stripe_of_grp is not None else None)
    sub_assign = np.zeros(nblk, dtype=np.int64)
    win_assign = np.zeros(M * nblk, dtype=np.int64)
    win_tiles = np.full((M, nvreg, MAX_NWIN), -1, dtype=np.int64)
    tables = np.full((M, nvreg, MAX_NWIN, 8, 128), -1, dtype=np.int16)
    nwin_v = np.zeros((M, nvreg), dtype=np.int64)
    failed = np.zeros(max(ngrp, 1), dtype=np.int64)
    n_failed = np.zeros(1, dtype=np.int64)
    lib.match_joint(
        int(T), int(nv), int(M), int(nblk),
        _p64(vreg),
        real_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _p64(hs_a), _p64(tile_a), _p64(lo_a),
        _p64(sog) if sog is not None else None,
        _p64(sub_assign), _p64(win_assign), _p64(win_tiles),
        tables.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _p64(nwin_v), _p64(failed), _p64(n_failed),
    )
    nf = int(n_failed[0])
    if nf:
        return set(int(s) for s in failed[:nf])
    out = []
    for mo in range(M):
        nwin = max(1, int(nwin_v[mo].max(initial=1)))
        wt = win_tiles[mo]
        # unused window slots point at the vreg's first window (in-bounds)
        first = np.where(wt[:, 0] >= 0, wt[:, 0], 0)
        for j in range(MAX_NWIN):
            wt[:, j] = np.where(wt[:, j] >= 0, wt[:, j], first)
        out.append((win_assign[mo * nblk:(mo + 1) * nblk], wt[:, :nwin],
                    nwin, tables[mo][:, :nwin]))
    return sub_assign, out


def clos_route_native(seg_vals: np.ndarray, seg_mask: np.ndarray,
                      max_w: int):
    """C++ Clos 3-take router (windowed_gather.pack_clos inner loop);
    returns (planes [nseg, max_w, 8, 128] i32, xtiles [nseg, max_w] i32,
    nwin [nseg] i64), False if the map cannot route, or None if the
    lib is unavailable.  Exact port: identical planes/xtiles/row
    choices to the Python loop (parity-tested)."""
    lib = get_lib()
    if lib is None:
        return None
    seg_vals = np.ascontiguousarray(seg_vals, dtype=np.int64)
    seg_mask = np.ascontiguousarray(seg_mask, dtype=np.uint8)
    nseg = seg_vals.shape[0]
    planes = np.zeros((nseg, max_w, 8, 128), dtype=np.int32)
    xtiles = np.zeros((nseg, max_w), dtype=np.int32)
    nwin = np.zeros(nseg, dtype=np.int64)
    ok = np.zeros(1, dtype=np.int64)
    lib.clos_route(
        int(nseg), _p64(seg_vals),
        seg_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(max_w),
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xtiles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _p64(nwin), _p64(ok),
    )
    if not int(ok[0]):
        return False
    return planes, xtiles, nwin
