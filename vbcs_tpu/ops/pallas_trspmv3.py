"""Pallas TrSpMV v3 — fused chained SpMV at HBM-roofline rate.

The round-2 redesign of the hot kernel (reference
``src/multiply_1DVBC.jl:90-180``), built from real-chip probe data
(``bench_tools/probe_kernel*.py``, ``probe_chain.py``):

* the v2 per-sublane broadcast+take+select gather ladder costs ~500
  ns/chunk (the kernel was compute-bound at 39% of the HBM roofline);
* ``take_along_axis`` works along *both* axes of an (8, 128) vreg on
  this Mosaic backend, enabling an **exact two-take gather**:
  ``t0 = take(win, A, axis=0); xg = take(t0, lo, axis=1)`` reads
  ``win[A[s, lo[s,l]], lo[s,l]]`` — with a pack-time *sublane table*
  ``A`` this gathers arbitrary elements of an aligned (8, 128) window
  at ~50 ns/chunk;
* a fused **chain grid** ``(n_iters, T)`` holds the x/y slot vectors
  in VMEM scratch (ping-pong), so an iterative SpMV re-reads only the
  value + metadata streams from HBM — no per-iteration x/y HBM
  traffic, no slot->natural permutation, no in-kernel transpose.

Measured on TPU v5e (probe_chain.py): full body + carry = 542-565
ns/chunk = 116-121 Gnnz/s vs the 143.7 Gnnz/s roofline.

Format contract (single exact-width class; multi-class formats fall
back to the v2 kernel):

* ``val_i [8w, T*NG]`` f32 — v2's interleaved-8 block layout: lane =
  8-block group, sublane band ``wi*8 + s`` = output column ``wi`` of
  block slot ``s``.
* ``meta [8, T*NG]`` int32 — ONE fused stream: element ``(s, c)``
  carries in its low bits the gather coordinates of the block at slot
  ``s`` of group-column ``c`` (bits 0-6 ``lo`` = lane offset within
  the window, bits 7-9 ``d`` = window id), and in its high bits the
  **A-table cells** of the enclosing vreg (bits ``10+3d .. 12+3d`` =
  sublane of the x element that window ``d``'s gather serves at lane
  position ``c % 128``).  Table cells and block coordinates are
  independent index spaces that happen to share an array.
* ``xtile [T*nv*nwin]`` int32 — 128-aligned window base lanes.
* x lives in a 2-D slot buffer ``(8, X)``: natural mode places
  ``x[r]`` at ``(r & 7, r >> 3)`` (a reshape of x); slot mode places
  stripe ``l``'s column ``wi`` at ``(wi, P(l))`` where ``P`` is the
  chunk/slot position of the stripe — the *output* layout, so a
  square chain composes with zero data movement.

Pack-time sublane assignment: the 8 blocks of each group are permuted
so that every block's window-d A-table cell ``(s, lo)`` is free or
already holds its x-sublane (blocks from different groups wanting the
same x element share cells).  A per-group DFS with window
duplication as a relief valve solves this; classes where it fails
fall back to v2.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.vbc1d import VBC1D

__all__ = ["StreamFormat3", "pack_stream3", "tr_spmv_chain3"]

NG = 1024  # 8-block groups (lanes) per chunk
NS = 1024  # stripe slots per chunk
MAX_NWIN = 7  # window-id field bits 7-9; 7 x 3-bit tables at bits 10-30
MAX_X = 131072  # xy slot-buffer lanes cap (2*8*X*4 = 8 MB of VMEM)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_i", "meta", "xtile", "nslots", "straddle", "gseg",
                 "ends", "entry_sub", "entry_lane", "exit_sub", "exit_lane"],
    meta_fields=["w", "num_chunks", "nwin", "scan_steps", "identity",
                 "has_straddle", "m", "n", "X", "natural", "ng", "ns"],
)
@dataclasses.dataclass(frozen=True)
class StreamFormat3:
    w: int
    num_chunks: int
    nwin: int
    scan_steps: int
    identity: bool
    has_straddle: bool
    m: int
    n: int
    X: int  # slot-buffer lanes
    natural: bool  # uniform width-8 natural stripes: entry/exit = reshape
    ng: int  # groups (lanes) per chunk
    ns: int  # stripe slots per chunk
    val_i: jax.Array  # [8w, T*NG] f32
    meta: jax.Array  # [8, T*NG] int32 fused lo|d|tables
    xtile: jax.Array  # [T*nv*nwin] int32 window base lanes
    nslots: jax.Array  # [T] int32
    straddle: jax.Array  # [T] int32
    gseg: object  # [1, T*NG] int32 or None (identity classes)
    ends: object  # [1, T*NS] int32 or None
    entry_sub: object  # [8, X] int32 gather (slot mode) or None (natural)
    entry_lane: object
    exit_sub: object  # [n] int32 or None (natural)
    exit_lane: object


# --------------------------------------------------------------------------
# pack


def _chunk_plan(B: VBC1D, ng=NG, ns=NS, extra=None):
    """Chunk layout for the single stripe class (same plan as v2).

    ``extra[stripe]`` adds padding groups — the reflow relief valve
    when the A-table matcher cannot place a stripe's blocks."""
    S = B.Phi.spl.size - 1
    nb = (B.pos[1:] - B.pos[:-1]).astype(np.int64)
    ngr = np.maximum(1, -(-nb // 8))
    if extra is not None:
        ngr = ngr + extra
    from ..native import stream_chunk_plan_native

    planned = stream_chunk_plan_native(ngr, ng, ns)
    if planned is not None:
        pieces_arr, straddle, nslots = planned
        T = straddle.size
    else:  # pure-Python oracle (VBCS_NO_NATIVE), same as v2's fallback
        g_in_chunk = s_in_chunk = chunk = 0
        pieces, straddle_l, nslots_l = [], [], []
        for i in range(S):
            left = int(ngr[i])
            g0 = 0
            if s_in_chunk >= ns or g_in_chunk >= ng:
                straddle_l.append(0)
                nslots_l.append(s_in_chunk)
                chunk += 1
                g_in_chunk = s_in_chunk = 0
            while left > 0:
                take = min(ng - g_in_chunk, left)
                pieces.append((i, g0, g0 + take, chunk))
                g_in_chunk += take
                g0 += take
                left -= take
                if left > 0:
                    straddle_l.append(1)
                    nslots_l.append(s_in_chunk)
                    chunk += 1
                    g_in_chunk = s_in_chunk = 0
            s_in_chunk += 1
        straddle_l.append(0)
        nslots_l.append(s_in_chunk)
        T = chunk + 1
        straddle = np.asarray(straddle_l, dtype=np.int32)
        nslots = np.asarray(nslots_l, dtype=np.int32)
        pieces_arr = np.asarray(pieces, dtype=np.int64)
    pi, pg0, pg1, pchunk = pieces_arr.T
    plen = pg1 - pg0
    cum = np.cumsum(plen) - plen
    chunk_first = np.searchsorted(pchunk, np.arange(T), side="left")
    lane0 = cum - cum[chunk_first[pchunk]]
    run_id = np.arange(pieces_arr.shape[0]) - chunk_first[pchunk]

    grp_piece = np.repeat(np.arange(pieces_arr.shape[0]), plen)
    within = np.arange(grp_piece.size) - np.repeat(np.cumsum(plen) - plen, plen)
    grp_stripe = pi[grp_piece]
    grp_in_stripe = pg0[grp_piece] + within
    grp_chunk = pchunk[grp_piece]
    grp_col = grp_chunk * ng + lane0[grp_piece] + within
    grp_run = run_id[grp_piece]

    last_piece = np.searchsorted(pi, np.arange(S), side="right") - 1
    end_chunk = pchunk[last_piece]
    end_lane = lane0[last_piece] + plen[last_piece] - 1
    first_end = np.searchsorted(end_chunk, np.arange(T), side="left")
    slot = np.arange(S) - first_end[end_chunk]
    P = end_chunk * ns + slot  # stripe -> slot-buffer lane

    max_run = int(plen.max(initial=1))
    scan_steps = 0
    while (1 << scan_steps) < max_run:
        scan_steps += 1
    return dict(
        S=S, nb=nb, T=T, straddle=straddle, nslots=nslots,
        grp_stripe=grp_stripe, grp_in_stripe=grp_in_stripe,
        grp_chunk=grp_chunk, grp_col=grp_col, grp_run=grp_run,
        end_chunk=end_chunk, end_lane=end_lane, P=P, ngr=ngr,
        scan_steps=scan_steps, identity=bool(max_run == 1),
    )


def _match_tables(T, nv, vreg_of_blk, hs, tile, lo, real,
                  stripe_of_grp=None):
    """Assign block slots to sublanes so A-table cells are consistent.

    Returns ``(sub_assign, win_assign, win_tiles, nwin, tables)``, or a
    set of stripes to split (reflow) on failure.  Each vreg keeps its
    own window list (lazily grown, up to MAX_NWIN); a window is an
    aligned 128-lane tile of the x slot buffer and owns an A-table
    ``tab[win, s, lo]`` = x-sublane its gather serves at that cell.
    A group's 8 slots need 8 distinct sublanes (the in-group sum is
    order-free, reference ``src/multiply_1DVBC.jl:99-105``).  When a
    group cannot be placed, the whole vreg is retried with the
    contended tile pre-duplicated (duplicate windows share a base but
    double the table capacity); only if retries exhaust MAX_NWIN do we
    fall back to splitting the stripe.
    """
    nblk = hs.size
    ngrp = nblk // 8
    nvreg = T * nv
    tables = np.full((nvreg, MAX_NWIN, 8, 128), -1, dtype=np.int16)
    win_tiles = np.full((nvreg, MAX_NWIN), -1, dtype=np.int64)
    nwin_v = np.zeros(nvreg, dtype=np.int64)
    sub_assign = np.zeros(nblk, dtype=np.int64)
    win_assign = np.zeros(nblk, dtype=np.int64)

    hs_g = hs.reshape(ngrp, 8)
    t_g = tile.reshape(ngrp, 8)
    lo_g = lo.reshape(ngrp, 8)
    real_g = real.reshape(ngrp, 8)
    vreg_g = vreg_of_blk.reshape(ngrp, 8)[:, 0]
    # group ranges per vreg (groups are laid out vreg-major)
    vstart = np.searchsorted(vreg_g, np.arange(nvreg), side="left")
    vend = np.searchsorted(vreg_g, np.arange(nvreg), side="right")
    failed_stripes = set()

    for v in range(nvreg):
        g0, g1 = int(vstart[v]), int(vend[v])
        if g0 >= g1:
            continue
        dup_hints = []
        shuffles = 0
        for _retry in range(MAX_NWIN + 4):
            tab = tables[v]
            tab[:] = -1
            wt = win_tiles[v]
            wt[:] = -1
            nw = 0
            for tb in dup_hints:
                if nw < MAX_NWIN:
                    wt[nw] = tb
                    nw += 1
            vreg_ok = True
            hard = None
            order = list(range(g0, g1))
            if shuffles > 0:  # last-resort randomized restarts
                np.random.default_rng(v * 31 + _retry).shuffle(order)
            for g in order:
                reals = np.flatnonzero(real_g[g])
                if reals.size == 0:
                    continue
                blocks = [(int(hs_g[g, b]), int(t_g[g, b]),
                           int(lo_g[g, b]), b) for b in reals]
                for _, tb, _, _ in blocks:
                    if not (wt[:nw] == tb).any():
                        if nw >= MAX_NWIN:
                            vreg_ok = False
                            break
                        wt[nw] = tb
                        nw += 1
                if not vreg_ok:
                    break
                cands = []
                for hsb, tb, lob, b in blocks:
                    opts = []
                    for j in range(nw):
                        if wt[j] != tb:
                            continue
                        col = tab[j, :, lob]
                        for si in range(8):
                            if col[si] == -1 or col[si] == hsb:
                                opts.append((si, j))
                    cands.append((len(opts), hsb, tb, lob, b, opts))
                cands.sort()
                used = 0
                chosen = {}
                budget = [4000]

                def dfs(k):
                    nonlocal used
                    if k == len(cands):
                        return True
                    budget[0] -= 1
                    if budget[0] <= 0:
                        return False
                    _, hsb, tb, lob, b, opts = cands[k]
                    for si, j in opts:
                        if used & (1 << si):
                            continue
                        cell = tab[j, si, lob]
                        if cell != -1 and cell != hsb:
                            continue
                        wrote = cell == -1
                        if wrote:
                            tab[j, si, lob] = hsb
                        used |= 1 << si
                        chosen[b] = (si, j)
                        if dfs(k + 1):
                            return True
                        used &= ~(1 << si)
                        if wrote:
                            tab[j, si, lob] = -1
                    return False

                if not dfs(0):
                    vreg_ok = False
                    hard = cands[0][2]  # tile of the hardest block
                    break
                free = [si for si in range(8) if not (used & (1 << si))]
                fi = 0
                for b in range(8):
                    if real_g[g, b]:
                        si, j = chosen[b]
                        sub_assign[g * 8 + b] = si
                        win_assign[g * 8 + b] = j
                    else:
                        sub_assign[g * 8 + b] = free[fi]
                        fi += 1
            if vreg_ok:
                nwin_v[v] = nw
                break
            if (hard is not None and shuffles == 0
                    and len(dup_hints) < MAX_NWIN - 1):
                dup_hints.append(hard)
                continue
            shuffles += 1
            if shuffles <= 3:
                continue
            # out of retry room: mark this vreg's stripes for reflow
            for g in range(g0, g1):
                if stripe_of_grp is not None:
                    failed_stripes.add(int(stripe_of_grp[g]))
            nwin_v[v] = max(nw, 1)
            break

    if failed_stripes:
        return failed_stripes
    nwin = max(1, int(nwin_v.max(initial=1)))
    # unused window slots point at the vreg's first window (in-bounds)
    first = np.where(win_tiles[:, 0] >= 0, win_tiles[:, 0], 0)
    for j in range(MAX_NWIN):
        win_tiles[:, j] = np.where(win_tiles[:, j] >= 0, win_tiles[:, j],
                                   first)
    return sub_assign, win_assign, win_tiles[:, :nwin], nwin, tables[:, :nwin]


def _pack_mode(B: VBC1D, plan, w, target_sub, target_lane, X, ng=NG):
    """Build meta/xtile/val for one x-layout (natural or slot targets)."""
    nb, T = plan["nb"], plan["T"]
    grp_stripe = plan["grp_stripe"]
    grp_in_stripe = plan["grp_in_stripe"]
    grp_col = plan["grp_col"]
    ngrp_cols = grp_col.size

    blk_grp = np.repeat(np.arange(ngrp_cols), 8)
    blk_slot = np.tile(np.arange(8), ngrp_cols)
    # proportional spread: group gi of a stripe with nbk blocks and G
    # groups owns blocks [gi*nbk//G, (gi+1)*nbk//G) — blocks stay
    # row-sorted within and across groups, pads spread evenly
    grp_nb = nb[grp_stripe]
    grp_G = plan["ngr"][grp_stripe]
    grp_start = (grp_in_stripe * grp_nb) // grp_G
    grp_cnt = ((grp_in_stripe + 1) * grp_nb) // grp_G - grp_start
    blk_in_stripe = grp_start[blk_grp] + blk_slot
    blk_stripe = grp_stripe[blk_grp]
    real = blk_slot < grp_cnt[blk_grp]

    pos0 = B.pos[:-1].astype(np.int64)
    gblk = pos0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1)
    idx_safe = B.idx if B.idx.size else np.zeros(1, B.idx.dtype)
    rows = np.where(real, idx_safe[np.clip(gblk, 0, idx_safe.size - 1)], 0)

    hs = target_sub[rows]  # x sublane in the buffer
    L = target_lane[rows]  # x lane in the buffer
    hs = np.where(real, hs, 0)
    L = np.where(real, L, 0)

    nv = ng // 128
    blk_vreg = (grp_col[blk_grp] // 128).astype(np.int64)
    tile = np.where(real, L >> 7, -1)
    lo = np.where(real, L & 127, 0)
    # quick infeasibility check: distinct tiles per vreg > MAX_NWIN
    pair = blk_vreg * (int(tile.max(initial=0)) + 2) + tile
    uniq_v = np.unique(pair[real]) // (int(tile.max(initial=0)) + 2)
    if np.bincount(uniq_v, minlength=T * nv).max(initial=0) > MAX_NWIN:
        return None
    tile = np.where(real, tile, 0)

    # ---- sublane assignment / A-tables --------------------------------
    res = _match_tables(T, nv, blk_vreg, hs, tile, lo, real,
                        stripe_of_grp=grp_stripe)
    if isinstance(res, set):
        return res  # stripes to split (reflow)
    sub_assign, win_assign, win_tiles, nwin, tables = res

    # ---- window base lanes ---------------------------------------------
    xtile = (win_tiles * 128).astype(np.int32)  # [T*nv, nwin]
    np.clip(xtile, 0, max(X - 128, 0), out=xtile)
    d_final = win_assign

    # ---- fused meta stream ----------------------------------------------
    meta = np.zeros((8, T * ng), dtype=np.int32)
    col_of_blk = grp_col[blk_grp]
    meta[sub_assign, col_of_blk] = (lo | (d_final << 7)).astype(np.int32)
    # table cells: element (s, vreg*128 + p) bits 10+3d
    tab_sl = np.maximum(tables, 0).astype(np.int32)  # [T*nv, nwin, 8, 128]
    shifts = (10 + 3 * np.arange(nwin, dtype=np.int32))[:, None, None]
    tab_bits = (tab_sl << shifts).sum(axis=1)  # [T*nv, 8, 128]
    meta |= tab_bits.transpose(1, 0, 2).reshape(8, T * nv * 128)

    # ---- values (sublane-permuted to match the assignment) -------------
    ofs0 = B.ofs[:-1].astype(np.int64)
    vbase = ofs0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1) * w
    val_i = np.zeros((8 * w, T * ng), dtype=np.float32)
    val_safe = B.val if B.val.size else np.zeros(1, B.val.dtype)
    for wi in range(w):
        v_w = np.where(
            real,
            val_safe[np.clip(vbase + wi, 0, val_safe.size - 1)].astype(
                np.float32),
            0.0,
        )
        val_i[wi * 8 + sub_assign, col_of_blk] = v_w
    return dict(val_i=val_i, meta=meta, xtile=xtile.reshape(-1), nwin=nwin)


def pack_stream3(B: VBC1D, ng=NG, ns=NS):
    """VBC1D -> chained-stream format; None if the format is multi-class,
    too wide for the slot buffer, or the A-table matching fails."""
    assert ng % 128 == 0 and ns % 128 == 0 and ns <= ng
    widths = B.Phi.widths()
    if widths.size == 0 or not (widths == widths[0]).all():
        return None
    w = int(widths[0])
    if w > 8:
        return None
    spl = B.Phi.spl.astype(np.int64)
    extra = np.zeros(spl.size - 1, dtype=np.int64)
    packed = None
    for _attempt in range(4):
        plan = _chunk_plan(B, ng, ns, extra)
        T, S, P = plan["T"], plan["S"], plan["P"]

        X = T * ns
        nat_lanes = 128 * (-(-(-(-B.m // 8)) // 128))  # ceil(m/8) to 128
        X = max(X, nat_lanes)
        if X > MAX_X:
            return None

        natural = bool(
            B.m == B.n
            and w == 8
            and np.array_equal(P, np.arange(S))
            and np.array_equal(spl, np.arange(S + 1) * 8)
        )

        # x-targets: natural (r&7, r>>3) vs slot (r-spl[stripe], P[stripe])
        if natural:
            t_sub = (np.arange(B.m) & 7).astype(np.int64)
            t_lane = (np.arange(B.m) >> 3).astype(np.int64)
        else:
            stripe_of = np.repeat(np.arange(S), np.diff(spl))
            t_sub = (np.arange(B.n) - spl[stripe_of]).astype(np.int64)
            t_lane = P[stripe_of].astype(np.int64)
            if B.m != B.n:
                return None  # chain requires a square operator
        packed = _pack_mode(B, plan, w, t_sub, t_lane, X, ng)
        if packed is None:
            return None
        if isinstance(packed, dict):
            break
        # reflow: split the unplaceable stripes into more groups
        fail = np.asarray(sorted(packed), dtype=np.int64)
        extra[fail] += np.maximum(1, plan["ngr"][fail])
        packed = None
    if packed is None:
        return None

    # entry/exit index maps (slot mode only; natural = reshape)
    entry_sub = entry_lane = exit_sub = exit_lane = None
    if not natural:
        e_sub = np.zeros((8, X), dtype=np.int32)
        e_lane = np.zeros((8, X), dtype=np.int32)
        # entry: xbuf[t_sub[j], t_lane[j]] = x[j]; build inverse gather
        g_idx = np.full((8, X), -1, dtype=np.int64)
        g_idx[t_sub, t_lane] = np.arange(B.n)
        entry_sub = np.clip(g_idx, 0, B.n - 1).astype(np.int32)
        entry_lane = (g_idx >= 0).astype(np.int32)  # validity mask
        exit_sub = t_sub.astype(np.int32)
        exit_lane = t_lane.astype(np.int32)

    ge = None if plan["identity"] else _gseg_ends(plan, T, ng, ns)
    fmt = StreamFormat3(
        w=w,
        num_chunks=int(T),
        nwin=int(packed["nwin"]),
        scan_steps=int(plan["scan_steps"]),
        identity=bool(plan["identity"]),
        has_straddle=bool(plan["straddle"].any()),
        m=B.m,
        n=B.n,
        X=int(X),
        natural=natural,
        ng=int(ng),
        ns=int(ns),
        val_i=packed["val_i"],
        meta=packed["meta"],
        xtile=packed["xtile"].astype(np.int32),
        nslots=plan["nslots"].astype(np.int32),
        straddle=plan["straddle"].astype(np.int32),
        gseg=None if ge is None else ge[0],
        ends=None if ge is None else ge[1],
        entry_sub=entry_sub,
        entry_lane=entry_lane,
        exit_sub=exit_sub,
        exit_lane=exit_lane,
    )
    return jax.device_put(fmt)


def _gseg_ends(plan, T, ng=NG, ns=NS):
    gseg = np.zeros((1, T * ng), dtype=np.int32)
    ends = np.zeros((1, T * ns), dtype=np.int32)
    grp_col, grp_run = plan["grp_col"], plan["grp_run"]
    gseg[0, grp_col] = grp_run
    used = np.zeros(T * ng, dtype=bool)
    used[grp_col] = True
    gs, us = gseg[0].reshape(T, ng), used.reshape(T, ng)
    lastrun = np.maximum.accumulate(np.where(us, gs, -1), axis=1)
    gseg[0] = np.where(us, gs, np.maximum(lastrun, 0)).reshape(-1)
    end_chunk, end_lane = plan["end_chunk"], plan["end_lane"]
    first_end = np.searchsorted(end_chunk, np.arange(T), side="left")
    slot = np.arange(plan["S"]) - first_end[end_chunk]
    ends[0, end_chunk * ns + slot] = end_lane
    return gseg, ends


# --------------------------------------------------------------------------
# kernel


def _chain_kernel(w, nwin, scan_steps, identity, has_straddle, n_iters, T,
                  ng=NG, ns=NS):
    nv = ng // 128

    def kernel(xtile_ref, alpha_ref, nslots_ref, straddle_ref, val_ref,
               meta_ref, *rest):
        if identity:
            xin_ref, out_ref, xy, carry = rest
            gseg_ref = ends_ref = None
        else:
            gseg_ref, ends_ref, xin_ref, out_ref, xy, carry = rest
        i = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((i == 0) & (t == 0))
        def _():
            xy[0] = xin_ref[...]
            carry[...] = jnp.zeros_like(carry)

        p = jax.lax.rem(i, jnp.asarray(2, i.dtype))
        meta = meta_ref[...]
        lo = jax.lax.bitwise_and(meta, jnp.int32(127))
        dwin = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(meta, jnp.int32(7)), jnp.int32(7)
        )

        # ---- exact 2-take windowed gather ------------------------------
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128:(v_ + 1) * 128]
            d_s = dwin[:, v_ * 128:(v_ + 1) * 128]
            m_s = meta[:, v_ * 128:(v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for dd in range(nwin):
                b = xtile_ref[(t * nv + v_) * nwin + dd]
                win = xy[p, :, pl.ds(pl.multiple_of(b, 128), 128)]
                Ad = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(
                        m_s, jnp.int32(10 + 3 * dd)),
                    jnp.int32(7),
                )
                t0 = jnp.take_along_axis(win, Ad, axis=0)
                cand = jnp.take_along_axis(t0, lo_s, axis=1)
                acc = jnp.where(d_s == dd, cand, acc) if nwin > 1 else cand
            xg_slices.append(acc)
        xg = jnp.concatenate(xg_slices, axis=1)  # [8, ng]

        # ---- product + within-group reduction --------------------------
        xg_t = jnp.concatenate([xg] * w, axis=0)
        prod = val_ref[...] * xg_t
        red = prod.reshape(w, 8, ng).sum(axis=1)  # [w, ng]

        # ---- segmented scan + run-end extraction (non-identity) --------
        if identity or scan_steps == 0:
            tot = red
        else:
            seg = gseg_ref[...]
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, ng), 1)
            sc = red
            k = 1
            for _ in range(scan_steps):
                same = (seg == pltpu.roll(seg, k, 1)) & (lane1 >= k)
                sc = sc + jnp.where(same, pltpu.roll(sc, k, 1), 0.0)
                k *= 2
            ends_all = ends_ref[...]
            wq = 8 if w == 1 else w
            tot_parts = []
            for j in range(ns // 128):
                ej = ends_all[:, j * 128:(j + 1) * 128]
                ehi = jax.lax.shift_right_logical(ej, jnp.int32(7))
                elo = jax.lax.bitwise_and(ej, jnp.int32(127))
                elo_b = jnp.broadcast_to(elo, (wq, 128))
                acc = jnp.zeros((wq, 128), jnp.float32)
                for q in range(nv):
                    scq = sc[:, q * 128:(q + 1) * 128]
                    if wq != w:
                        scq = jnp.broadcast_to(scq, (wq, 128))
                    cand = jnp.take_along_axis(scq, elo_b, axis=1)
                    acc = jnp.where(
                        jnp.broadcast_to(ehi == q, (wq, 128)), cand, acc)
                tot_parts.append(acc[:w])
            tot = jnp.concatenate(tot_parts, axis=1)  # [w, ns]
            laneN = jax.lax.broadcasted_iota(jnp.int32, (w, ns), 1)
            tot = jnp.where(laneN < nslots_ref[t], tot, 0.0)

        # ---- carry chain (stripes straddling a chunk boundary) ---------
        if has_straddle:
            laneN = jax.lax.broadcasted_iota(jnp.int32, (w, ns), 1)
            prev_str = jax.lax.select(
                t > 0,
                straddle_ref[jnp.maximum(t - 1, 0)],
                jnp.zeros((), jnp.int32),
            )
            nsl = nslots_ref[t]
            carry_vec = carry[:w, 0:1]
            tot = tot + jnp.where(
                (laneN == 0) & (prev_str == 1) & (nsl > 0), carry_vec, 0.0)
            tail = (red if identity else sc)[:, ng - 1:ng]
            carry_new = tail + jnp.where(
                (prev_str == 1) & (nsl == 0), carry_vec, 0.0)
            carry[:w, 0:1] = jnp.where(straddle_ref[t] == 1, carry_new, 0.0)

        # Mosaic bitcast needs a vector operand; broadcast the scalar
        alpha = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(alpha_ref[0], (1, 1)), jnp.float32)
        tot = tot * alpha

        xy[1 - p, 0:w, pl.ds(t * ns, ns)] = tot

        @pl.when(i == n_iters - 1)
        def _():
            out_ref[...] = tot

    return kernel


def _chain_call(fmt: StreamFormat3, n_iters: int):
    w, T, nwin, X = fmt.w, fmt.num_chunks, fmt.nwin, fmt.X
    ng, ns = fmt.ng, fmt.ns
    identity = fmt.identity
    in_specs = [
        pl.BlockSpec((8 * w, ng), lambda i, t, *_: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, ng), lambda i, t, *_: (0, t),
                     memory_space=pltpu.VMEM),
    ]
    if not identity:
        in_specs += [
            pl.BlockSpec((1, ng), lambda i, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns), lambda i, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ]
    in_specs.append(
        pl.BlockSpec((8, X), lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_iters, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (w, ns),
            lambda i, t, *_: (0, jnp.where(i == n_iters - 1, t, 0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, X), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _chain_kernel(w, nwin, fmt.scan_steps, identity, fmt.has_straddle,
                      n_iters, T, ng, ns),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w, T * ns), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )


def entry3(fmt: StreamFormat3, x: jax.Array) -> jax.Array:
    """Natural x [m] -> slot buffer (8, X)."""
    x = x.astype(jnp.float32)
    if fmt.natural:
        xp = jnp.zeros(8 * fmt.X, jnp.float32).at[: fmt.m].set(x)
        return xp.reshape(fmt.X, 8).T
    g = x[fmt.entry_sub] * fmt.entry_lane.astype(jnp.float32)
    return g


def exit3(fmt: StreamFormat3, out: jax.Array) -> jax.Array:
    """Kernel output (w, T*NS) -> natural y [n]."""
    if fmt.natural:
        return out.T.reshape(-1)[: fmt.n]
    return out[fmt.exit_sub, fmt.exit_lane]


def tr_spmv_chain3(fmt: StreamFormat3, x: jax.Array, n_iters: int = 1,
                   alpha=None) -> jax.Array:
    """y = (alpha * A.T)^n_iters @ x, natural order, fused on device.

    The whole chain is ONE Pallas grid; x/y slot vectors stay in VMEM
    between iterations (reference analog: repeated ``mul!(y, B', x)``,
    ``src/multiply_1DVBC.jl:136-180``, with the beta prescale fused as
    the kernel epilogue like ``:143-147``).
    """
    a = jnp.asarray(1.0 if alpha is None else alpha, jnp.float32)
    alpha_bits = jax.lax.bitcast_convert_type(a, jnp.int32).reshape(1)
    xin = entry3(fmt, x)
    args = [fmt.val_i, fmt.meta]
    if not fmt.identity:
        args += [fmt.gseg, fmt.ends]
    out = _chain_call(fmt, n_iters)(
        fmt.xtile, alpha_bits, fmt.nslots, fmt.straddle, *args, xin)
    return exit3(fmt, out)
