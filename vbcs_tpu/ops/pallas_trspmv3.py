"""Pallas TrSpMV v3 — fused chained SpMV at HBM-roofline rate.

The hot kernel for ``y = (alpha A^T)^k x`` (reference
``src/multiply_1DVBC.jl:90-180``), built from real-chip probe data
(``bench_tools/probe_kernel*.py``, ``probe_chain.py``) and generalized
in round 3 to the DP planner's *variable-width* partitions:

* ``take_along_axis`` works along *both* axes of an (8, 128) vreg on
  this Mosaic backend, enabling an **exact two-take gather**:
  ``t0 = take(win, A, axis=0); xg = take(t0, lo, axis=1)`` reads
  ``win[A[s, lo[s,l]], lo[s,l]]`` — with a pack-time *sublane table*
  ``A`` this gathers arbitrary elements of an aligned (8, 128) window
  at ~50 ns/chunk;
* a fused **chain grid** ``(n_iters, T)`` holds the x/y slot vectors
  in VMEM scratch (ping-pong), so an iterative SpMV re-reads only the
  value + metadata streams from HBM — no per-iteration x/y HBM
  traffic, no slot->natural permutation, no in-kernel transpose;
* **multi-class**: each exact stripe width ``w`` gets its own chunk
  segment of the grid (``offs[c] <= t < offs[c+1]`` guarded by
  ``pl.when``) with its own value stream ``vals[c] [8w, T_c*ng]``;
  the gather metadata, segmented-scan masks and slot bookkeeping are
  width-independent and stream as single global arrays.  This is the
  TPU analog of the reference's width-specialization if-chain
  (``src/multiply_1DVBC.jl:123-127`` via ``le_nest``) — the DP
  planner's mixed-width output runs the fast path, not a fallback;
* **dual meta**: iteration 0 gathers straight from the *natural*
  layout (``x`` padded and reshaped to (8, X) — a free reshape, no
  entry permutation), via a second meta stream ``meta_nat`` that is
  only fetched on the first grid iteration; iterations >= 1 gather
  from the slot layout the kernel itself writes;
* the final iteration stores **transposed (ns, 8) blocks**, so the
  flat HBM output is slot-major and the natural-order exit is a
  reshape (uniform natural formats) or one Clos-routed Pallas permute
  (``ops/windowed_gather``) — never an XLA gather/transpose pass.
  Non-natural formats pick their exit from a three-tier ladder at pack
  time: free sublane-major store + single-pass permute (w <= 4),
  slot-major Eklundh store + single-pass permute (w >= 5 multi-group /
  u-expanded views, where the sublane-major map needs w+1 windows per
  segment), and the multipass radix permute as the guaranteed floor —
  the XLA gather fallback is dead (measured ~0.6 GB/s, a flat ~280 us
  on a 40k-row FEM that round-5 ablation traced the whole multi-group
  "slow one-shot" cliff to).

Format contract: square matrices, all stripe widths <= 8, and
``8 * X <= 8 * MAX_X`` slot-buffer VMEM.  Anything else returns None
and the caller uses the v2 per-call kernel.

x slot layout: natural mode (iteration-0 input) places ``x[r]`` at
``(r // X, r % X)``; slot mode (the chain's own output layout) places
stripe ``l``'s column ``wi`` at ``(wi, P(l))`` where ``P`` is the
stripe's global slot lane — the *output* layout, so a square chain
composes with zero data movement.

Pack-time sublane assignment: the 8 blocks of each group are permuted
so that every block's window-d A-table cell ``(s, lo)`` is free or
already holds its x-sublane (blocks from different groups wanting the
same x element share cells).  A per-group DFS with window duplication
as a relief valve solves this; stripes where it fails are *reflowed*
(split over more groups) and the whole pack retried.
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
from . import windowed_gather as wg

__all__ = ["StreamFormat3", "pack_stream3", "tr_spmv_chain3",
           "tr_spmv_oneshot3"]

NG = 1024  # 8-block groups (lanes) per chunk
NS = 1024  # stripe slots per chunk
MAX_NWIN = 7  # window-id field bits 7-9; 7 x 3-bit tables at bits 10-30
MAX_X = 131072  # xy slot-buffer lanes cap (2*8*X*4 = 8 MB of VMEM)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "meta_nat", "meta_slot", "xtile_nat", "xtile_slot",
                 "nslots", "straddle", "gseg", "ends", "exit_plan",
                 "exit_idx", "exit_wi", "exit_lane", "entry_plan",
                 "entry_gidx", "entry_mask"],
    meta_fields=["ws", "offs", "scan_steps", "identities", "nwins",
                 "nwin", "num_chunks", "has_straddle", "has_scan",
                 "m", "n", "X", "natural", "ng", "ns", "entry_mode",
                 "slot_store"],
)
@dataclasses.dataclass(frozen=True)
class StreamFormat3:
    ws: tuple  # class widths (ascending)
    offs: tuple  # len C+1 global chunk offsets per class
    scan_steps: tuple  # per class
    identities: tuple  # per class
    nwins: tuple  # per class (max over nat/slot modes)
    nwin: int  # global xtile stride (max of nwins)
    num_chunks: int  # T total
    has_straddle: bool
    has_scan: bool  # any class non-identity -> gseg/ends present
    m: int
    n: int
    X: int  # slot-buffer lanes
    natural: bool  # uniform width-8 natural stripes: exit = reshape
    ng: int
    ns: int
    # entry_mode: how natural x becomes the (8, X) iteration-0 buffer:
    #   "tile"      tile-interleaved free relayout; meta_nat gathers it
    #   "transpose" xin = slot buffer via (X, 8) reshape-transpose
    #   "clos"      xin = slot buffer via one Clos-routed Pallas permute
    #   "gather"    xin = slot buffer via XLA gather (last resort)
    entry_mode: str
    vals: tuple  # per class [8*w_c, T_c*ng] f32
    meta_nat: jax.Array  # [8, T*ng] i32 (iteration-0 gather)
    meta_slot: jax.Array  # [8, T*ng] i32 (steady-state gather)
    xtile_nat: jax.Array  # [T*nv*nwin] i32 window base lanes
    xtile_slot: jax.Array
    nslots: jax.Array  # [T] i32
    straddle: jax.Array  # [T] i32
    gseg: object  # [1, T*ng] i32 or None
    ends: object  # [1, T*ns] i32 or None
    exit_plan: object  # windowed_gather plan (slot-major flat -> y) or None
    exit_idx: object  # [n] i32 flat slot-major index, or None (natural)
    exit_wi: object  # [n] i32 output column within stripe (SpMM exit)
    exit_lane: object  # [n] i32 global slot lane (SpMM exit)
    entry_plan: object  # windowed_gather 2-D Clos plan or None
    entry_gidx: object  # [8, X] i32 (entry_mode == "gather") or None
    entry_mask: object  # [8, X] f32 or None
    # non-natural store layout: False -> sublane-major (8, T*ns);
    # True -> slot-major (T*ns, 8) via an in-kernel transpose, which
    # makes the exit map ~monotone (stride 8/w) and usually SINGLE-pass
    # routable where the sublane-major map needs w+1 windows per output
    # segment (w >= 5 multi-group formats, u-expanded 2-D views)
    slot_store: bool = False


# --------------------------------------------------------------------------
# pack


def _chunk_plan(nb: np.ndarray, ng=NG, ns=NS, extra=None):
    """Chunk layout for one width class (``nb`` = blocks per stripe).

    ``extra[stripe]`` adds padding groups — the reflow relief valve
    when the A-table matcher cannot place a stripe's blocks."""
    S = nb.size
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
    # stripe -> (local chunk, slot); global slot lane = (off+chunk)*ns+slot
    max_run = int(plen.max(initial=1))
    scan_steps = 0
    while (1 << scan_steps) < max_run:
        scan_steps += 1
    return dict(
        S=S, nb=nb, T=T, straddle=straddle, nslots=nslots,
        grp_stripe=grp_stripe, grp_in_stripe=grp_in_stripe,
        grp_chunk=grp_chunk, grp_col=grp_col, grp_run=grp_run,
        end_chunk=end_chunk, end_lane=end_lane, slot=slot, ngr=ngr,
        scan_steps=scan_steps,
        identity=bool(max_run == 1),
    )


def _match_joint(T, nv, vreg_of_blk, modes, real, stripe_of_grp=None):
    """Assign block slots to sublanes so the A-table cells of EVERY
    x-layout mode are simultaneously consistent.

    ``modes``: list of ``(hs, tile, lo)`` triples, one per x layout
    (natural first, then slot; or just slot).  All modes share ONE
    block->sublane assignment — the value stream is laid out once —
    while each mode keeps its own per-vreg window list (an aligned
    128-lane tile of its x buffer) and A-table ``tab[win, s, lo]`` =
    x-sublane served at that cell.  A group's 8 slots need 8 distinct
    sublanes (the in-group sum is order-free, reference
    ``src/multiply_1DVBC.jl:99-105``).  When a group cannot be placed,
    the vreg is retried with the most-starved mode's contended tile
    pre-duplicated, then with deterministically rotated group orders;
    when retries exhaust, the vreg's stripes are returned for reflow.

    Returns ``(sub_assign, [(win_assign, win_tiles [T*nv, nwin], nwin,
    tables)] per mode)`` or a set of stripes to reflow.  The C++ fast
    path (``native.match_joint``) implements the same algorithm.
    """
    from ..native import match_joint_native

    res = match_joint_native(T, nv, vreg_of_blk, modes, real,
                             stripe_of_grp)
    if res is not None:
        return res
    M = len(modes)
    nblk = real.size
    ngrp = nblk // 8
    nvreg = T * nv
    tables = [np.full((nvreg, MAX_NWIN, 8, 128), -1, dtype=np.int16)
              for _ in range(M)]
    win_tiles = [np.full((nvreg, MAX_NWIN), -1, dtype=np.int64)
                 for _ in range(M)]
    nwin_v = [np.zeros(nvreg, dtype=np.int64) for _ in range(M)]
    sub_assign = np.zeros(nblk, dtype=np.int64)
    win_assign = [np.zeros(nblk, dtype=np.int64) for _ in range(M)]

    hs_g = [m[0].reshape(ngrp, 8) for m in modes]
    t_g = [m[1].reshape(ngrp, 8) for m in modes]
    lo_g = [m[2].reshape(ngrp, 8) for m in modes]
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
        dup_hints = [[] for _ in range(M)]
        shuffles = 0
        for _retry in range(MAX_NWIN + 4):
            tabs = [tables[mo][v] for mo in range(M)]
            wts = [win_tiles[mo][v] for mo in range(M)]
            nw = [0] * M
            for mo in range(M):
                tabs[mo][:] = -1
                wts[mo][:] = -1
                for tb in dup_hints[mo]:
                    if nw[mo] < MAX_NWIN:
                        wts[mo][nw[mo]] = tb
                        nw[mo] += 1
            vreg_ok = True
            hard = None  # (mode, tile) to duplicate on retry
            order = list(range(g0, g1))
            if shuffles > 0:  # deterministic rotated restarts
                r = (shuffles * 37) % max(1, len(order))
                order = order[r:] + order[:r]
                order.reverse()
            for g in order:
                reals = np.flatnonzero(real_g[g])
                if reals.size == 0:
                    continue
                # ensure a window exists for every block tile, per mode
                for mo in range(M):
                    for b in reals:
                        tb = int(t_g[mo][g, b])
                        if not (wts[mo][: nw[mo]] == tb).any():
                            if nw[mo] >= MAX_NWIN:
                                vreg_ok = False
                                break
                            wts[mo][nw[mo]] = tb
                            nw[mo] += 1
                    if not vreg_ok:
                        break
                if not vreg_ok:
                    break
                # candidate (si, window-per-mode) options per block
                cands = []
                for b in reals:
                    keys = [(int(hs_g[mo][g, b]), int(t_g[mo][g, b]),
                             int(lo_g[mo][g, b])) for mo in range(M)]
                    opts = []
                    starve = [0] * M
                    for si in range(8):
                        wsets = []
                        for mo, (hsb, tb, lob) in enumerate(keys):
                            js = [j for j in range(nw[mo])
                                  if wts[mo][j] == tb
                                  and tabs[mo][j, si, lob] in (-1, hsb)]
                            starve[mo] += len(js)
                            wsets.append(js)
                        if all(wsets):
                            if M == 1:
                                opts += [(si, (j0,)) for j0 in wsets[0]]
                            else:
                                opts += [(si, (j0, j1)) for j0 in wsets[0]
                                         for j1 in wsets[1]]
                    cands.append((len(opts), keys, starve, int(b), opts))
                cands.sort(key=lambda c: c[0])
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
                    _, keys, _, b, opts = cands[k]
                    for si, combo in opts:
                        if used & (1 << si):
                            continue
                        wrote = []
                        ok = True
                        for mo in range(M):
                            hsb, tb, lob = keys[mo]
                            j = combo[mo]
                            cell = tabs[mo][j, si, lob]
                            if cell != -1 and cell != hsb:
                                ok = False
                                break
                            if cell == -1:
                                tabs[mo][j, si, lob] = hsb
                                wrote.append((mo, j, lob, si))
                        if not ok:
                            for mo, j, lob, ss in wrote:
                                tabs[mo][j, ss, lob] = -1
                            continue
                        used |= 1 << si
                        chosen[b] = (si, combo)
                        if dfs(k + 1):
                            return True
                        used &= ~(1 << si)
                        for mo, j, lob, ss in wrote:
                            tabs[mo][j, ss, lob] = -1
                    return False

                if not dfs(0):
                    vreg_ok = False
                    # duplicate the most-starved mode's tile for the
                    # hardest block
                    _, keys, starve, _, _ = cands[0]
                    mo_h = int(np.argmin(starve))
                    hard = (mo_h, keys[mo_h][1])
                    break
                free = [si for si in range(8) if not (used & (1 << si))]
                fi = 0
                for b in range(8):
                    if real_g[g, b]:
                        si, combo = chosen[b]
                        sub_assign[g * 8 + b] = si
                        for mo in range(M):
                            win_assign[mo][g * 8 + b] = combo[mo]
                    else:
                        sub_assign[g * 8 + b] = free[fi]
                        fi += 1
            if vreg_ok:
                for mo in range(M):
                    nwin_v[mo][v] = max(nw[mo], 1)
                break
            if (hard is not None and shuffles == 0
                    and len(dup_hints[hard[0]]) < MAX_NWIN - 1):
                dup_hints[hard[0]].append(hard[1])
                continue
            shuffles += 1
            if shuffles <= 3:
                continue
            # out of retry room: mark this vreg's stripes for reflow
            for g in range(g0, g1):
                if stripe_of_grp is not None:
                    failed_stripes.add(int(stripe_of_grp[g]))
            for mo in range(M):
                nwin_v[mo][v] = max(nw[mo], 1)
            break

    if failed_stripes:
        return failed_stripes
    out = []
    for mo in range(M):
        nwin = max(1, int(nwin_v[mo].max(initial=1)))
        wt = win_tiles[mo]
        # unused window slots point at the vreg's first window (in-bounds)
        first = np.where(wt[:, 0] >= 0, wt[:, 0], 0)
        for j in range(MAX_NWIN):
            wt[:, j] = np.where(wt[:, j] >= 0, wt[:, j], first)
        out.append((win_assign[mo], wt[:, :nwin], nwin,
                    tables[mo][:, :nwin]))
    return sub_assign, out


def _pack_class(B: VBC1D, stripes, plan, w, mode_targets, X, ng=NG):
    """Build metas/win_tiles/val for one width class over one or two
    x-layout modes (jointly matched: one sublane assignment, per-mode
    windows/tables).

    ``mode_targets``: list of ``(target_sub, target_lane)`` per mode.
    Returns a dict with per-mode ``metas``/``win_bases``/``nwins``, a
    set of (global) stripe ids to reflow, or None if the class cannot
    ever route (too many windows per vreg even after full reflow)."""
    nb, T = plan["nb"], plan["T"]
    grp_stripe = plan["grp_stripe"]  # class-local stripe index
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

    pos0 = B.pos[stripes].astype(np.int64)
    gblk = pos0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1)
    idx_safe = B.idx if B.idx.size else np.zeros(1, B.idx.dtype)
    rows = np.where(real, idx_safe[np.clip(gblk, 0, idx_safe.size - 1)], 0)

    nv = ng // 128
    blk_vreg = (grp_col[blk_grp] // 128).astype(np.int64)
    modes = []
    for target_sub, target_lane in mode_targets:
        hs = np.where(real, target_sub[rows], 0)
        L = np.where(real, target_lane[rows], 0)
        tile = np.where(real, L >> 7, -1)
        lo = np.where(real, L & 127, 0)
        # infeasibility / reflow pre-check: vregs needing more distinct
        # tiles than MAX_NWIN either reflow (stripes split into more
        # groups) or, if already minimal, fail the class
        pair = blk_vreg * (int(tile.max(initial=0)) + 2) + tile
        uniq_v = np.unique(pair[real]) // (int(tile.max(initial=0)) + 2)
        over = np.flatnonzero(
            np.bincount(uniq_v, minlength=T * nv) > MAX_NWIN)
        if over.size:
            gsel = np.isin(blk_vreg[::8] * 1, over)  # group vreg over limit
            cand = np.unique(grp_stripe[gsel])
            # splitting stays useful (pad groups spread real blocks over
            # more lanes -> fewer tiles per vreg) until a whole vreg
            # holds a single real block
            splittable = cand[plan["ngr"][cand] < 128 * nb[cand]]
            if splittable.size == 0:
                return None
            return set(int(stripes[s]) for s in splittable)
        modes.append((hs, np.where(real, tile, 0), lo))

    # ---- joint sublane assignment / A-tables ---------------------------
    res = _match_joint(T, nv, blk_vreg, modes, real,
                       stripe_of_grp=grp_stripe)
    if isinstance(res, set):
        return set(int(stripes[s]) for s in res)  # stripes to reflow
    sub_assign, per_mode = res

    col_of_blk = grp_col[blk_grp]
    metas, win_bases, nwins = [], [], []
    for mo, (win_assign, win_tiles, nwin, tables) in enumerate(per_mode):
        lo = modes[mo][2]
        # ---- fused meta stream ------------------------------------------
        meta = np.zeros((8, T * ng), dtype=np.int32)
        meta[sub_assign, col_of_blk] = (
            lo | (win_assign << 7)).astype(np.int32)
        # table cells: element (s, vreg*128 + p) bits 10+3d
        tab_sl = np.maximum(tables, 0).astype(np.int32)
        shifts = (10 + 3 * np.arange(nwin, dtype=np.int32))[:, None, None]
        tab_bits = (tab_sl << shifts).sum(axis=1)  # [T*nv, 8, 128]
        meta |= tab_bits.transpose(1, 0, 2).reshape(8, T * nv * 128)
        metas.append(meta)
        # win_tiles are tile ids; convert to 128-aligned base lanes
        win_bases.append(
            np.clip(win_tiles * 128, 0, max(X - 128, 0)).astype(np.int32))
        nwins.append(nwin)

    # ---- values (sublane-permuted to match the assignment) -------------
    ofs0 = B.ofs[stripes].astype(np.int64)
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
    return dict(val_i=val_i, metas=metas, win_bases=win_bases, nwins=nwins,
                sub=sub_assign)


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
    ends[0, end_chunk * ns + plan["slot"]] = end_lane
    return gseg, ends


def pack_stream3(B: VBC1D, ng=NG, ns=NS, prefer_dual=False, mode="slot",
                 split_identity=True):
    """VBC1D -> chained-stream format; None if the matrix is non-square,
    a class is wider than 8, or the slot buffer exceeds VMEM.

    Matching modes.  ``mode="slot"`` (default, the chain): gather
    targets are the kernel's own output layout, so iterations compose
    in VMEM; the one-time entry permute is amortized over n_iters.
    ``prefer_dual=True`` additionally packs a natural-layout meta with
    one JOINT sublane assignment — entry is then a free tile-granular
    relayout, but the joint constraints inflate the per-class window
    count ``nwins[c]`` that the kernel pays on EVERY iteration
    (measured: flagship 113 vs 223 Gnnz/s), so it is opt-in.
    ``mode="nat"`` (the one-shot, ``tr_spmv_oneshot3``): gather targets
    are the tile-interleaved NATURAL layout — x enters as a pure
    reshape (no permute, no relayout) and the kernel reads (8, 128)
    windows of 1024 consecutive rows, which for banded matrices needs
    FEWER windows than the slot layout; the result exits slot-major
    through the usual Clos permute/reshape.  nat formats cannot chain
    (their output layout differs from their gather layout)."""
    assert ng % 128 == 0 and ns % 128 == 0 and ns <= ng
    widths = B.Phi.widths()
    if widths.size == 0 or int(widths.max(initial=0)) > 8:
        return None
    if B.m != B.n and mode != "nat":
        # slot-mode gather targets ARE the kernel's output layout, which
        # only composes when x and y share the index space (square);
        # nat-mode one-shots gather from x (m) and exit over y (n)
        # independently, so rectangular matrices are fine
        return None
    spl = B.Phi.spl.astype(np.int64)
    S_all = spl.size - 1
    nb_all = (B.pos[1:] - B.pos[:-1]).astype(np.int64)
    # classes split by width AND by single-group vs multi-group: a
    # class where every stripe fits one 8-block group is an IDENTITY
    # class (slot lane == group lane) and skips the whole segmented-
    # scan + run-end-extraction machinery — on the RCM'd FEM bench
    # matrix >99% of stripes are single-group but one multi-group
    # stripe used to drag the entire class through the scan path
    # (~200 vector ops/chunk of end extraction).
    ws, cls_stripes = [], []
    for w in sorted(int(w) for w in np.unique(widths)):
        st = np.flatnonzero(widths == w)
        if not split_identity:
            ws.append(w)
            cls_stripes.append(st)
            continue
        single = st[nb_all[st] <= 8]
        multi = st[nb_all[st] > 8]
        if single.size:
            ws.append(w)
            cls_stripes.append(single)
        if multi.size:
            ws.append(w)
            cls_stripes.append(multi)

    def layout(extra):
        plans = []
        offs = [0]
        for st in cls_stripes:
            plan = _chunk_plan(nb_all[st], ng, ns, extra[st])
            plans.append(plan)
            offs.append(offs[-1] + plan["T"])
        T = offs[-1]
        X = T * ns
        nat_lanes = 128 * (-(-B.m // 1024))  # 8*X >= m, 128-aligned
        X = max(X, nat_lanes)
        if X > MAX_X:
            return None
        # stripe -> global slot lane
        P = np.zeros(S_all, dtype=np.int64)
        for c, st in enumerate(cls_stripes):
            pc = plans[c]
            P[st] = (offs[c] + pc["end_chunk"]) * ns + pc["slot"]
        natural = bool(
            len(ws) == 1
            and ws[0] == 8
            and np.array_equal(P, np.arange(S_all))
            and np.array_equal(spl, np.arange(S_all + 1) * 8)
        )
        # x-layout targets (indexed by row id 0..m-1 == column id).
        # Natural layout is tile-interleaved: x[r] at
        # ((r>>7)&7, (r>>10)*128 + (r&127)) — 1024 consecutive elements
        # fill exactly one aligned (8, 128) window (gather locality), and
        # the entry relayout is tile-granular (lane dim preserved), which
        # XLA performs as cheap (8,128)-vreg moves, not an element
        # transpose.
        r = np.arange(B.m)
        nat_sub = ((r >> 7) & 7).astype(np.int64)
        nat_lane = ((r >> 10) * 128 + (r & 127)).astype(np.int64)
        stripe_of = np.repeat(np.arange(S_all), np.diff(spl))
        slot_sub = (np.arange(B.n) - spl[stripe_of]).astype(np.int64)
        slot_lane = P[stripe_of].astype(np.int64)
        return dict(plans=plans, offs=offs, T=T, X=X, P=P, natural=natural,
                    nat=(nat_sub, nat_lane), slot=(slot_sub, slot_lane))

    def try_pack(dual: bool, max_attempts: int):
        extra = np.zeros(S_all, dtype=np.int64)
        for _attempt in range(max_attempts):
            lay = layout(extra)
            if lay is None:
                return None
            fail = set()
            packed = []
            for c, st in enumerate(cls_stripes):
                if mode == "nat":
                    targets = [lay["nat"]]
                elif dual:
                    targets = [lay["nat"], lay["slot"]]
                else:
                    targets = [lay["slot"]]
                p = _pack_class(B, st, lay["plans"][c], ws[c], targets,
                                lay["X"], ng)
                if p is None:
                    return None
                if isinstance(p, set):
                    fail |= p
                    packed.append(None)
                    continue
                packed.append(p)
            if not fail:
                return lay, packed
            # geometric reflow: scattered thin classes need their
            # stripes spread over ~2x fewer lanes per round for the
            # per-vreg window count to converge (pad groups are cheap:
            # one chunk lane each)
            fidx = np.asarray(sorted(fail), dtype=np.int64)
            grown = np.maximum(
                (extra[fidx] + 1) * 2 - 1,
                extra[fidx] + np.maximum(1, -(-nb_all[fidx] // 8)))
            extra[fidx] = grown
        return None

    # phase 1: dual meta (free tile-interleaved entry)
    result = (try_pack(True, 6) if prefer_dual and mode == "slot"
              else None)
    dual = result is not None
    if not dual:
        # phase 2: single-target (slot, or nat for the one-shot).
        # 20 reflow rounds: mixed-width DP plans (e.g. min-blocks on an
        # RCM'd FEM: 12.5k w=8 stripes + 7 thin classes) converge
        # slowly because re-layout shifts every class's slot lanes
        result = try_pack(False, 20)
        if result is None:
            return None
    lay, packed = result
    plans, offs, T, X, natural = (lay["plans"], lay["offs"], lay["T"],
                                  lay["X"], lay["natural"])
    slot_sub, slot_lane = lay["slot"]

    nv = ng // 128
    nwins = tuple(max(packed[c]["nwins"]) for c in range(len(ws)))
    nwin = max(nwins)

    meta_nat = np.zeros((8, T * ng), dtype=np.int32)
    meta_slot = meta_nat if not dual else np.zeros((8, T * ng),
                                                   dtype=np.int32)
    xt_nat = np.zeros((T * nv, nwin), dtype=np.int32)
    xt_slot = xt_nat if not dual else np.zeros((T * nv, nwin),
                                               dtype=np.int32)
    nslots = np.zeros(T, dtype=np.int32)
    straddle = np.zeros(T, dtype=np.int32)
    has_scan = any(not p["identity"] for p in plans)
    gseg = np.zeros((1, T * ng), dtype=np.int32) if has_scan else None
    ends = np.zeros((1, T * ns), dtype=np.int32) if has_scan else None
    vals = []
    for c, w in enumerate(ws):
        pc = packed[c]
        t0, t1 = offs[c], offs[c + 1]
        Tc = t1 - t0
        meta_nat[:, t0 * ng:t1 * ng] = pc["metas"][0]
        if dual:
            meta_slot[:, t0 * ng:t1 * ng] = pc["metas"][1]

        def fill_xt(dst, wb):
            dst[t0 * nv:t1 * nv, :wb.shape[1]] = wb
            if wb.shape[1] < nwin:  # pad with window 0 (in-bounds)
                dst[t0 * nv:t1 * nv, wb.shape[1]:] = wb[:, :1]

        fill_xt(xt_nat, pc["win_bases"][0])
        if dual:
            fill_xt(xt_slot, pc["win_bases"][1])
        nslots[t0:t1] = plans[c]["nslots"]
        straddle[t0:t1] = plans[c]["straddle"]
        if has_scan:
            ge = _gseg_ends(plans[c], Tc, ng, ns)
            gseg[:, t0 * ng:t1 * ng] = ge[0]
            ends[:, t0 * ns:t1 * ns] = ge[1]
        vals.append(pc["val_i"])

    # entry: how natural x reaches the iteration-0 buffer
    entry_plan = entry_gidx = entry_mask = None
    if mode == "nat":
        entry_mode = "reshape"  # one-shot: x enters as (R*8, 128)
    elif dual:
        entry_mode = "tile"
    elif natural:
        # slot buffer == reshape(X, 8).T — route it as a wblk-1 Clos
        # permute (each (8, 128) output window reads exactly one
        # aligned source tile) instead of the XLA transpose the chain
        # used to pay (~37 us/call on the flagship)
        perm2d = (8 * np.arange(X, dtype=np.int64)[None, :]
                  + np.arange(8, dtype=np.int64)[:, None])
        mask2d = perm2d < B.m
        entry_plan = wg.pack_permute2d(perm2d, mask2d, B.m)
        entry_mode = "clos" if entry_plan is not None else "transpose"
    else:
        perm2d = np.zeros((8, X), dtype=np.int64)
        mask2d = np.zeros((8, X), dtype=bool)
        perm2d[slot_sub, slot_lane] = np.arange(B.n)
        mask2d[slot_sub, slot_lane] = True
        entry_plan = wg.pack_permute2d(perm2d, mask2d, B.m)
        if entry_plan is None:
            entry_mode = "gather"
            entry_gidx = perm2d.astype(np.int32)
            entry_mask = mask2d.astype(np.float32)
        else:
            entry_mode = "clos"

    # exit: non-natural formats store (8, T*ns) sublane-major, so
    # y[j] = out.flat[wi*(T*ns) + P(stripe)] — consecutive j hit
    # consecutive lanes (stride <= 1), which the Clos permute routes
    # with one window per output vreg.  (A slot-major (T*ns, 8) store
    # would dilate the map 8x and defeat the windowed permute.)
    exit_plan = exit_idx = None
    exit_wi = exit_lane = None
    slot_store = False
    if not natural:
        # two candidate store layouts.  Sublane-major (flat index =
        # wi*(T*ns) + P) is preferred: the (8, ns) store is free, but
        # its exit needs w+1 windows per output segment (unroutable
        # single-pass for w >= 5 / u-expanded views).  Slot-major
        # (flat = P*8 + wi, the Eklundh padded store) makes the exit
        # ~monotone and single-pass routable, but the in-kernel
        # relayout costs ~0.9 us/chunk — so it is the MIDDLE tier,
        # ahead only of the multi-pass radix exit.
        eidx_sub = (slot_sub * (T * ns) + slot_lane).astype(np.int64)
        eidx_slot = (slot_lane * 8 + slot_sub).astype(np.int64)
        exit_plan = wg.pack_permute(eidx_sub, T * ns * 8)
        if exit_plan is None:
            exit_plan = wg.pack_clos(eidx_sub, T * ns * 8,
                                     max_w=MAX_NWIN)
        if exit_plan is None:
            exit_plan = wg.pack_permute(eidx_slot, T * ns * 8)
            slot_store = exit_plan is not None
        if exit_plan is None:
            exit_plan = wg.pack_clos(eidx_slot, T * ns * 8,
                                     max_w=MAX_NWIN)
            slot_store = exit_plan is not None
        if exit_plan is None:
            # multipass radix permute: routes ANY exit map in <= 4-5
            # near-HBM-rate passes.  NEVER fall to the XLA gather: it
            # runs at ~0.6 GB/s, a flat ~280 us on a 40k-row FEM —
            # round-5 ablation traced the entire "slow multi-group
            # one-shot" cliff (0.66 vs 8.9 Gnnz/s at w=4) to exactly
            # this fallback, not to the kernel.
            from . import multipass as mp

            exit_plan = mp.pack_multipass(eidx_sub, T * ns * 8)
        eidx = eidx_slot if slot_store else eidx_sub
        exit_idx = eidx.astype(np.int32)
        exit_wi = slot_sub.astype(np.int32)
        exit_lane = slot_lane.astype(np.int32)

    fmt = StreamFormat3(
        ws=tuple(ws),
        offs=tuple(offs),
        scan_steps=tuple(p["scan_steps"] for p in plans),
        identities=tuple(bool(p["identity"]) for p in plans),
        nwins=nwins,
        nwin=int(nwin),
        num_chunks=int(T),
        has_straddle=bool(straddle.any()),
        has_scan=bool(has_scan),
        m=B.m,
        n=B.n,
        X=int(X),
        natural=natural,
        ng=int(ng),
        ns=int(ns),
        vals=tuple(vals),
        meta_nat=meta_nat,
        meta_slot=meta_slot,
        xtile_nat=xt_nat.reshape(-1),
        xtile_slot=xt_slot.reshape(-1),
        nslots=nslots,
        straddle=straddle,
        gseg=gseg,
        ends=ends,
        exit_plan=exit_plan,
        exit_idx=exit_idx,
        exit_wi=exit_wi,
        exit_lane=exit_lane,
        entry_mode=entry_mode,
        entry_plan=entry_plan,
        entry_gidx=entry_gidx,
        entry_mask=entry_mask,
        slot_store=slot_store,
    )
    return jax.device_put(fmt)


# --------------------------------------------------------------------------
# kernel


def _gather_reduce(fmt, c, meta, lo, dwin, fetch_base, fetch_win,
                   val_ref, nv):
    """Exact two-take windowed gather + product + in-group reduction
    for one width class.  ``fetch_base(v_, dd)`` -> window base lane;
    ``fetch_win(b)`` -> the (8, 128) window holding that base.
    Returns ``red [w, ng]`` (per-group partial sums)."""
    w = fmt.ws[c]
    nwin_c = fmt.nwins[c]
    ng = fmt.ng
    xg_slices = []
    for v_ in range(nv):
        lo_s = lo[:, v_ * 128:(v_ + 1) * 128]
        d_s = dwin[:, v_ * 128:(v_ + 1) * 128]
        m_s = meta[:, v_ * 128:(v_ + 1) * 128]
        acc = jnp.zeros((8, 128), jnp.float32)
        for dd in range(nwin_c):
            b = fetch_base(v_, dd)
            win = fetch_win(b)
            Ad = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(
                    m_s, jnp.int32(10 + 3 * dd)),
                jnp.int32(7),
            )
            t0 = jnp.take_along_axis(win, Ad, axis=0)
            cand = jnp.take_along_axis(t0, lo_s, axis=1)
            acc = (jnp.where(d_s == dd, cand, acc)
                   if nwin_c > 1 else cand)
        xg_slices.append(acc)
    xg = jnp.concatenate(xg_slices, axis=1)  # [8, ng]
    xg_t = jnp.concatenate([xg] * w, axis=0)
    prod = val_ref[...] * xg_t
    return prod.reshape(w, 8, ng).sum(axis=1)  # [w, ng]


def _segscan_carry(fmt, c, red, gseg_ref, ends_ref, nslots_ref,
                   straddle_ref, carry, t, alpha):
    """Segmented scan + run-end extraction + straddle carry chain +
    alpha epilogue for one width class: ``red [w, ng]`` -> ``tot
    [w, ns]`` (stripe totals at their slot lanes)."""
    w = fmt.ws[c]
    ng, ns, nv = fmt.ng, fmt.ns, fmt.ng // 128
    scan_steps = fmt.scan_steps[c]
    identity = fmt.identities[c]
    off = fmt.offs[c]
    if identity or scan_steps == 0:
        tot = red[:, :ns]
        sc = red
    else:
        seg = gseg_ref[...]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, ng), 1)
        sc = red
        kk = 1
        for _ in range(scan_steps):
            same = (seg == pltpu.roll(seg, kk, 1)) & (lane1 >= kk)
            sc = sc + jnp.where(same, pltpu.roll(sc, kk, 1), 0.0)
            kk *= 2
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

    if fmt.has_straddle:
        laneN = jax.lax.broadcasted_iota(jnp.int32, (w, ns), 1)
        prev_str = jax.lax.select(
            t > off,  # straddles never cross class segments
            straddle_ref[jnp.maximum(t - 1, 0)],
            jnp.zeros((), jnp.int32),
        )
        nsl = nslots_ref[t]
        carry_vec = carry[:w, 0:1]
        tot = tot + jnp.where(
            (laneN == 0) & (prev_str == 1) & (nsl > 0),
            carry_vec, 0.0)
        tail = sc[:, ng - 1:ng]
        carry_new = tail + jnp.where(
            (prev_str == 1) & (nsl == 0), carry_vec, 0.0)
        carry[:w, 0:1] = jnp.where(
            straddle_ref[t] == 1, carry_new, 0.0)

    return tot * alpha


def _chain_kernel(fmt: StreamFormat3, n_iters: int):
    ng, ns, nv = fmt.ng, fmt.ns, fmt.ng // 128
    NW = fmt.nwin
    T = fmt.num_chunks
    C = len(fmt.ws)
    # dual metas only when iteration 0 gathers a different (natural
    # tile-interleaved) layout than the steady state; entry-permute
    # formats use ONE meta/xtile stream for every iteration
    dual = fmt.entry_mode == "tile" and n_iters > 1
    has_scan = fmt.has_scan
    has_straddle = fmt.has_straddle

    def kernel(xtn_ref, xts_ref, alpha_ref, nslots_ref, straddle_ref,
               *rest):
        k = 0
        meta_nat_ref = rest[k]; k += 1
        meta_slot_ref = None
        if dual:
            meta_slot_ref = rest[k]; k += 1
        gseg_ref = ends_ref = None
        if has_scan:
            gseg_ref, ends_ref = rest[k], rest[k + 1]; k += 2
        val_refs = rest[k:k + C]; k += C
        xin_ref = rest[k]; k += 1
        out_ref, xy, carry = rest[k], rest[k + 1], rest[k + 2]

        i = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((i == 0) & (t == 0))
        def _():
            xy[0] = xin_ref[...]
            carry[...] = jnp.zeros_like(carry)

        p = jax.lax.rem(i, jnp.asarray(2, i.dtype))
        if dual:
            meta = jnp.where(i == 0, meta_nat_ref[...], meta_slot_ref[...])
        else:
            meta = meta_nat_ref[...]
        lo = jax.lax.bitwise_and(meta, jnp.int32(127))
        dwin = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(meta, jnp.int32(7)), jnp.int32(7)
        )
        alpha = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(alpha_ref[0], (1, 1)), jnp.float32)

        def class_body(c):
            w = fmt.ws[c]
            val_ref = val_refs[c]

            def fetch_base(v_, dd):
                bn = xtn_ref[(t * nv + v_) * NW + dd]
                if dual:
                    bs = xts_ref[(t * nv + v_) * NW + dd]
                    return jnp.where(i == 0, bn, bs)
                return bn

            def fetch_win(b):
                return xy[p, :, pl.ds(pl.multiple_of(b, 128), 128)]

            red = _gather_reduce(fmt, c, meta, lo, dwin, fetch_base,
                                 fetch_win, val_ref, nv)
            tot = _segscan_carry(fmt, c, red, gseg_ref, ends_ref,
                                 nslots_ref, straddle_ref, carry, t,
                                 alpha)
            xy[1 - p, 0:w, pl.ds(t * ns, ns)] = tot

            @pl.when(i == n_iters - 1)
            def _():
                if w < 8:
                    tot8 = jnp.concatenate(
                        [tot, jnp.zeros((8 - w, ns), jnp.float32)], axis=0)
                else:
                    tot8 = tot
                # natural formats: slot-major (ns, 8) store -> exit is a
                # reshape; others: sublane-major (8, ns) -> Clos permute
                out_ref[...] = (tot8.T if fmt.natural or fmt.slot_store
                                else tot8)

        for c in range(C):
            if C == 1:
                class_body(c)
            else:
                pl.when((t >= fmt.offs[c]) & (t < fmt.offs[c + 1]))(
                    lambda c=c: class_body(c))

    return kernel


def _chain_call(fmt: StreamFormat3, n_iters: int):
    T, X = fmt.num_chunks, fmt.X
    ng, ns = fmt.ng, fmt.ns
    dual = fmt.entry_mode == "tile" and n_iters > 1
    if dual:
        in_specs = [
            # meta_nat: streams on iteration 0, frozen afterwards
            pl.BlockSpec((8, ng),
                         lambda i, t, *_: (0, jnp.where(i == 0, t, T - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ng),
                         lambda i, t, *_: (0, jnp.where(i == 0, 0, t)),
                         memory_space=pltpu.VMEM),
        ]
    else:
        # one meta stream for every iteration
        in_specs = [
            pl.BlockSpec((8, ng), lambda i, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ]
    if fmt.has_scan:
        in_specs += [
            pl.BlockSpec((1, ng), lambda i, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns), lambda i, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ]
    for c, w in enumerate(fmt.ws):
        off, Tc = fmt.offs[c], fmt.offs[c + 1] - fmt.offs[c]
        in_specs.append(
            pl.BlockSpec(
                (8 * w, ng),
                (lambda off=off, Tc=Tc: (
                    lambda i, t, *_: (0, jnp.clip(t - off, 0, Tc - 1))
                ))(),
                memory_space=pltpu.VMEM,
            ))
    in_specs.append(
        pl.BlockSpec((8, X), lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM))
    if fmt.natural or fmt.slot_store:
        out_spec = pl.BlockSpec(
            (ns, 8),
            lambda i, t, *_: (jnp.where(i == n_iters - 1, t, 0), 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((T * ns, 8), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (8, ns),
            lambda i, t, *_: (0, jnp.where(i == n_iters - 1, t, 0)),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((8, T * ns), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_iters, T),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 8, X), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _chain_kernel(fmt, n_iters),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )


def _tile_relayout_call(Rb: int):
    """(Rb*64, 128) natural-padded x -> (8, Rb*1024) tile-interleaved.

    Every in-kernel slice is STATIC; the grid pipeline's block DMAs do
    all the dynamic addressing.  (In-kernel dynamic-lane STORES lower
    to predicated writes over every tile of the target — measured
    ~1 us per copy step and ~170 s of Mosaic compile on a 320-tile
    buffer — so the relayout lives in its own tiny kernel instead of a
    copy phase inside the gather grid.)"""

    def kern(xin_ref, out_ref):
        for j in range(8):
            out_ref[:, j * 128:(j + 1) * 128] = xin_ref[j * 8:(j + 1) * 8, :]

    return pl.pallas_call(
        kern,
        grid=(Rb,),
        in_specs=[pl.BlockSpec((64, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 1024), lambda k: (0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Rb * 1024), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _oneshot_kernel(fmt: StreamFormat3, nat_rows: int, grid_axis: int = 0,
                    with_y: bool = False):
    """Single-pass TrSpMV over grid (T,): the chain's lane-dynamic
    two-take gather against the x input held whole in VMEM.

    ``nat_rows > 0`` (mode="nat" formats): x arrives PADDED NATURAL as
    ``(nat_rows, 128)`` — rows ``[8q : 8q+8]`` ARE the tile-interleaved
    (8, 128) window of elements ``[1024q, 1024q+1024)`` (element r sits
    at row ``r>>7``, lane ``r&127``), so windows are dynamic SUBLANE
    slices and no relayout kernel or XLA transpose ever runs.  Natural
    formats also STORE padded-natural ``(64, 128)`` blocks via a
    constant-index intra-vreg shuffle (chunk t's totals are exactly
    y[8192t : 8192(t+1)]), making natural-in -> natural-out free of
    layout passes; iterated calls compose with zero data movement.

    ``nat_rows == 0``: x is the (8, X) slot buffer (windows = lane
    slices) and output stores sublane-major (8, ns) for the Clos exit."""
    ns, nv = fmt.ns, fmt.ng // 128
    NW = fmt.nwin
    C = len(fmt.ws)
    has_scan = fmt.has_scan
    # the Eklundh padded store writes flat index 8*slot + wi — which is
    # natural y for natural formats AND exactly the slot-major exit
    # layout for slot_store formats (a plain in-kernel .T measured
    # ~0.9 us/chunk and ate the single-pass-exit gains)
    nat_store = nat_rows > 0 and (fmt.natural or fmt.slot_store)

    def kernel(xtn_ref, alpha_ref, nslots_ref, straddle_ref, *rest):
        k = 0
        meta_ref = rest[k]; k += 1
        gseg_ref = ends_ref = None
        if has_scan:
            gseg_ref, ends_ref = rest[k], rest[k + 1]; k += 2
        val_refs = rest[k:k + C]; k += C
        xin_ref = rest[k]; k += 1
        y_ref = None
        if with_y:
            y_ref = rest[k]; k += 1
        out_ref, carry = rest[k], rest[k + 1]

        t = pl.program_id(grid_axis)

        @pl.when(t == 0)
        def _init():
            carry[...] = jnp.zeros_like(carry)

        meta = meta_ref[...]
        lo = jax.lax.bitwise_and(meta, jnp.int32(127))
        dwin = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(meta, jnp.int32(7)), jnp.int32(7)
        )
        alpha = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(alpha_ref[0], (1, 1)), jnp.float32)

        def class_body(c):
            w = fmt.ws[c]
            val_ref = val_refs[c]

            def fetch_base(v_, dd):
                return xtn_ref[(t * nv + v_) * NW + dd]

            if nat_rows > 0:
                def fetch_win(b):
                    # b = 128*q -> rows [8q : 8q+8] of the padded
                    # natural input are the (8, 128) window
                    r0 = jax.lax.shift_right_logical(b, jnp.int32(4))
                    return xin_ref[pl.ds(pl.multiple_of(r0, 8), 8), :]
            else:
                def fetch_win(b):
                    return xin_ref[:, pl.ds(pl.multiple_of(b, 128), 128)]

            red = _gather_reduce(fmt, c, meta, lo, dwin, fetch_base,
                                 fetch_win, val_ref, nv)
            tot = _segscan_carry(fmt, c, red, gseg_ref, ends_ref,
                                 nslots_ref, straddle_ref, carry, t,
                                 alpha)
            if w < 8:
                tot8 = jnp.concatenate(
                    [tot, jnp.zeros((8 - w, ns), jnp.float32)], axis=0)
            else:
                tot8 = tot
            if nat_store:
                # padded-natural (ns/16, 128) store: chunk t's totals
                # are exactly y[8*ns*t : 8*ns*(t+1)] and
                # y_local[128a + 8k + wi] = tot8[wi, 16a + k].  Done
                # in-VMEM as (1) a constant lane permute
                # idx1[j] = 16*(j&7) + (j>>3), then (2) an 8x8
                # transpose of every aligned 8-lane tile (sublane i <->
                # lane&7) via 3 Eklundh butterfly stages (roll+select;
                # lane-XOR moves never cross a tile), then (3) static
                # (8,128) stores to rows [8c : 8c+8].  ~19 vector ops
                # per vreg, full-lane output DMA — replaces the XLA
                # (8, N) transpose that measured ~37 us/call fused
                # with the next call's pad.
                lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                idx1 = (16 * jax.lax.bitwise_and(lane_i, jnp.int32(7))
                        + jax.lax.shift_right_logical(lane_i, jnp.int32(3)))
                masks = []
                for s in (4, 2, 1):
                    a_sw = (jax.lax.bitwise_and(sub_i, jnp.int32(s)) == 0) & (
                        jax.lax.bitwise_and(lane_i, jnp.int32(s)) != 0)
                    b_sw = (jax.lax.bitwise_and(sub_i, jnp.int32(s)) != 0) & (
                        jax.lax.bitwise_and(lane_i, jnp.int32(s)) == 0)
                    masks.append((s, a_sw, b_sw))
                for cc in range(ns // 128):
                    u = jnp.take_along_axis(
                        tot8[:, 128 * cc:128 * (cc + 1)], idx1, axis=1)
                    for s, a_sw, b_sw in masks:
                        ua = pltpu.roll(pltpu.roll(u, 8 - s, 0), s, 1)
                        ub = pltpu.roll(pltpu.roll(u, s, 0), 128 - s, 1)
                        u = jnp.where(a_sw, ua, jnp.where(b_sw, ub, u))
                    if with_y:
                        # fused beta epilogue (reference prescales y by
                        # beta before accumulating,
                        # src/multiply_1DVBC.jl:143-147; here the
                        # natural-layout store makes beta*y a single
                        # in-kernel FMA on the output block)
                        beta = jax.lax.bitcast_convert_type(
                            jnp.broadcast_to(alpha_ref[1], (1, 1)),
                            jnp.float32)
                        u = u + beta * y_ref[8 * cc:8 * (cc + 1), :]
                    out_ref[8 * cc:8 * (cc + 1), :] = u
            elif fmt.slot_store:
                # slot-major (ns, 8): in-kernel transpose buys a
                # ~monotone exit map (single-pass permute where the
                # sublane-major layout needed w+1 windows per segment)
                out_ref[...] = tot8.T
            else:
                # sublane-major (8, ns): full-lane DMA; exits through
                # the Clos permute (non-natural) or an XLA transpose
                out_ref[...] = tot8

        for c in range(C):
            if C == 1:
                class_body(c)
            else:
                pl.when((t >= fmt.offs[c]) & (t < fmt.offs[c + 1]))(
                    lambda c=c: class_body(c))

    return kernel


def _oneshot_call(fmt: StreamFormat3, xin_lanes: int, nat_rows: int = 0,
                  with_y: bool = False):
    T = fmt.num_chunks
    ng, ns = fmt.ng, fmt.ns
    nat_store = nat_rows > 0 and (fmt.natural or fmt.slot_store)
    in_specs = [
        pl.BlockSpec((8, ng), lambda t, *_: (0, t),
                     memory_space=pltpu.VMEM),
    ]
    if fmt.has_scan:
        in_specs += [
            pl.BlockSpec((1, ng), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ]
    for c, w in enumerate(fmt.ws):
        off, Tc = fmt.offs[c], fmt.offs[c + 1] - fmt.offs[c]
        in_specs.append(
            pl.BlockSpec(
                (8 * w, ng),
                (lambda off=off, Tc=Tc: (
                    lambda t, *_: (0, jnp.clip(t - off, 0, Tc - 1))
                ))(),
                memory_space=pltpu.VMEM,
            ))
    if nat_rows > 0:
        in_specs.append(
            pl.BlockSpec((nat_rows, 128), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM))
    else:
        in_specs.append(
            pl.BlockSpec((8, xin_lanes), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM))
    if nat_store:
        rows_c = ns * 8 // 128
        if with_y:
            in_specs.append(
                pl.BlockSpec((rows_c, 128), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((rows_c, 128), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T * rows_c, 128), jnp.float32)
    elif fmt.slot_store:
        assert not with_y
        out_spec = pl.BlockSpec((ns, 8), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T * ns, 8), jnp.float32)
    else:
        assert not with_y  # beta fusion: natural-store formats only
        out_spec = pl.BlockSpec((8, ns), lambda t, *_: (0, t),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8, T * ns), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return pl.pallas_call(
        _oneshot_kernel(fmt, nat_rows, with_y=with_y),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def tr_spmv_oneshot3(fmt: StreamFormat3, x: jax.Array,
                     alpha=None, beta=None, y=None) -> jax.Array:
    """y = alpha * A.T @ x in two kernel passes for ``mode="nat"``
    formats: a tiny tile-relayout kernel turns the padded natural x
    (a pure reshape) into the (8, Lx) tile-interleaved buffer, then
    the gather grid reads it whole from VMEM; y exits through one XLA
    transpose (natural formats) or the Clos permute.  This is the
    per-call op the reference benchmarks (``bin/test_table.jl:80``).

    Accepts BOTH pack modes.  ``mode="nat"`` formats gather from the
    tile-interleaved natural buffer (free relayout in, but the natural
    A-tables typically need more windows — measured nwin=4 vs the slot
    mode's 1-2 on the banded flagship, and the gather is compute-
    bound at ~50 ns/window/group).  Slot-mode (chain) formats gather
    from the (8, X) slot buffer the chain itself uses: x enters via
    ``entry3`` (an XLA transpose for natural formats, one Clos permute
    otherwise) and the fewer windows make the grid faster — so the
    chain format doubles as the fast per-call format, one pack."""
    a = jnp.asarray(1.0 if alpha is None else alpha, jnp.float32)
    b = jnp.asarray(0.0 if beta is None else beta, jnp.float32)
    alpha_bits = jax.lax.bitcast_convert_type(
        jnp.stack([a, b]), jnp.int32).reshape(2)
    nat_rows = 0
    if fmt.entry_mode == "reshape":
        R = -(-fmt.m // 1024)
        Rb = -(-R // 8)
        nat_rows = Rb * 64
        xp = jnp.zeros(Rb * 8192, jnp.float32).at[: fmt.m].set(
            x.astype(jnp.float32))
        xin = xp.reshape(nat_rows, 128)  # rows [8q:8q+8] = window q
        meta, xtile, lanes = fmt.meta_nat, fmt.xtile_nat, Rb * 1024
    elif fmt.entry_mode == "tile":
        # dual-meta format: iteration-0 meta targets the tile buffer
        xin = entry3(fmt, x)
        meta, xtile, lanes = fmt.meta_nat, fmt.xtile_nat, fmt.X
    else:
        xin = entry3(fmt, x)  # (8, X) slot buffer
        meta, xtile, lanes = fmt.meta_slot, fmt.xtile_slot, fmt.X
    # beta*y fuses into the kernel's output store on natural-store
    # formats (y streamed in the out block's layout); other formats
    # apply it post-exit in XLA
    with_y = (y is not None and beta is not None
              and nat_rows > 0 and fmt.natural)
    args = [meta]
    if fmt.has_scan:
        args += [fmt.gseg, fmt.ends]
    args += list(fmt.vals)
    args.append(xin)
    if with_y:
        T = fmt.num_chunks
        rows_c = fmt.ns * 8 // 128
        yp = jnp.zeros(T * rows_c * 128, jnp.float32).at[: fmt.n].set(
            y.astype(jnp.float32))
        args.append(yp.reshape(T * rows_c, 128))
    out = _oneshot_call(fmt, lanes, nat_rows, with_y=with_y)(
        xtile, alpha_bits, fmt.nslots, fmt.straddle, *args)
    if nat_rows > 0 and fmt.natural:
        # padded-natural (T*64, 128) store: flat IS natural y
        out = out.reshape(-1)[: fmt.n]
        if y is not None and beta is not None and not with_y:
            out = out + beta * y
        return out
    if fmt.natural:
        # sublane-major (8, T*ns) store -> natural y is one XLA
        # transpose; only slot/tile formats reach this
        out = out.T.reshape(-1)[: fmt.n]
    else:
        out = exit3(fmt, out)
    if y is not None and beta is not None:
        out = out + jnp.asarray(beta, jnp.float32) * y.astype(jnp.float32)
    return out


def entry3(fmt: StreamFormat3, x: jax.Array) -> jax.Array:
    """Natural x [m] -> the (8, X) iteration-0 buffer.

    ``tile``: x[r] at ((r>>7)&7, (r>>10)*128 + (r&127)) — a free
    tile-granular relayout (lane dim preserved: vreg moves only).
    Other modes produce the *slot* buffer directly: ``transpose``
    (natural formats, slot == reshape(X, 8).T), ``clos`` (one routed
    Pallas permute), ``gather`` (XLA gather, last resort)."""
    x = x.astype(jnp.float32)
    if fmt.entry_mode == "tile":
        R = fmt.X // 128
        xp = jnp.zeros(R * 1024, jnp.float32).at[: fmt.m].set(x)
        return xp.reshape(R, 8, 128).transpose(1, 0, 2).reshape(8, fmt.X)
    if fmt.entry_mode == "transpose":
        xp = jnp.zeros(8 * fmt.X, jnp.float32).at[: fmt.m].set(x)
        return xp.reshape(fmt.X, 8).T
    if fmt.entry_mode == "clos":
        buf = wg.apply_clos(fmt.entry_plan, x)  # (8, >=X)
        return buf[:, : fmt.X]
    # "gather"
    xp = jnp.concatenate([x, jnp.zeros(1, jnp.float32)])
    return xp[jnp.minimum(fmt.entry_gidx, fmt.m)] * fmt.entry_mask


def exit3(fmt: StreamFormat3, out: jax.Array) -> jax.Array:
    """Kernel output -> natural y [n].  Chain natural formats store
    (T*NS, 8) slot-major (flat IS natural y); everything else stores
    (8, T*NS) sublane-major and exits through a windowed permute —
    single-pass Clos when the map routes, multipass radix otherwise
    (the XLA-gather fallback is dead: ~0.6 GB/s measured)."""
    from . import multipass as mp

    flat = out.reshape(-1)
    if isinstance(fmt.exit_plan, mp.MultipassPlan):
        return mp.apply_multipass(fmt.exit_plan, flat)
    if fmt.exit_plan is not None:
        return wg.apply_permute(fmt.exit_plan, flat)
    if fmt.exit_idx is not None:
        return flat[fmt.exit_idx]
    return flat[: fmt.n]


def tr_spmv_chain3(fmt: StreamFormat3, x: jax.Array, n_iters: int = 1,
                   alpha=None) -> jax.Array:
    """y = (alpha * A.T)^n_iters @ x, natural order, fused on device.

    The whole chain is ONE Pallas grid; x/y slot vectors stay in VMEM
    between iterations (reference analog: repeated ``mul!(y, B', x)``,
    ``src/multiply_1DVBC.jl:136-180``, with the alpha scale fused as
    the kernel epilogue like the beta prescale at ``:143-147``).  The
    first iteration gathers straight from the reshaped natural x (no
    entry permutation); the exit is a reshape (natural formats) or one
    Clos-routed Pallas permute.
    """
    assert n_iters >= 1
    assert fmt.entry_mode != "reshape", \
        "mode='nat' formats are one-shot only (tr_spmv_oneshot3)"
    a = jnp.asarray(1.0 if alpha is None else alpha, jnp.float32)
    alpha_bits = jax.lax.bitcast_convert_type(a, jnp.int32).reshape(1)
    xin = entry3(fmt, x)
    args = [fmt.meta_nat]
    if fmt.entry_mode == "tile" and n_iters > 1:
        args.append(fmt.meta_slot)
    if fmt.has_scan:
        args += [fmt.gseg, fmt.ends]
    args += list(fmt.vals)
    out = _chain_call(fmt, n_iters)(
        fmt.xtile_nat, fmt.xtile_slot, alpha_bits, fmt.nslots,
        fmt.straddle, *args, xin)
    return exit3(fmt, out)
