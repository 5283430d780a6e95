"""Pallas TrSpMV v2 — fully fused: windowed x-gather + VPU segmented scan.

The TPU-native hot kernel for ``y = A.T x`` on the 1D-VBC format
(reference ``src/multiply_1DVBC.jl:90-180``), designed around the Mosaic
constraints probed on this backend (dynamic gather limited to one vreg
along the gather axis; dynamic lane slices must be 128-aligned; XLA
gather/scatter/segment-sum lower to ~per-element loops):

* **Exact-width classes** — stripes grouped by exact width ``w``; one
  kernel instance per class, no width padding.
* **Interleaved-8 block layout** — a stripe's blocks are padded to a
  multiple of 8 and stored as ``val_i [8*w, NG]``: lane ``j`` holds an
  8-block *group* (sublanes = blocks, one sublane band per output
  column), so the segmented reduction runs over lane-groups — 8x fewer
  elements than blocks.
* **Chunked sequential grid** — each grid step consumes ``NG`` groups
  (``8*NG`` blocks) covering at most ``NS`` stripes; big chunks amortize
  the ~300ns/step Pallas overhead measured on this chip.
* **In-kernel windowed x-gather** — a chunk's rows must lie inside
  ``wblk`` aligned 1024-element windows of x (pack-time per-class bound,
  rows reordered upstream for locality); the gather decomposes into
  ``8*wblk`` (sublane-broadcast, 128-lane dynamic-gather, select) steps.
* **VPU segmented scan** over lane-groups (Hillis-Steele with run
  masks — masks precomputed off the critical chain) + per-vreg
  lane-gather extraction of run ends.
* **Slot-space output + carry chain** — each chunk owns an aligned slot
  block; a straddling stripe's partial is carried in VMEM scratch and
  merged into the chunk where the stripe ends, so every stripe's total
  lands in exactly one slot.  Natural-order y is a static permutation
  (pack-time); chained SpMV can stay in slot space.
* **Transposed (slot-major) output store** — classes with ``w > 1``
  transpose ``tot`` in-register and store ``[NS, w]`` blocks, so the
  flat HBM output is already slot-major ``(slot, wi)`` — the layout the
  slot→natural permutation consumes.  This removes a full XLA transpose
  pass (~26us/iter measured on v5e for the flagship matrix); when the
  slot→natural map is the identity (stripes in natural order, single
  class), the kernel output *is* y and the permutation is skipped
  entirely (``StreamFormat2.natural``).

Classes whose chunks violate the x-window bound fall back to the v1
MXU one-hot kernel (pre-gathered x).  The x-span is a TPU-specific
locality cost the reference never modeled — its CPU analog is the
L2-resident x working set its autotuner sizes against
(``src/costs.jl:44-60``).
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
from . import pallas_trspmv as v1
from . import windowed_gather as wg

__all__ = ["StreamClass2", "StreamFormat2", "pack_stream2", "tr_spmv_pallas2"]

NG = 1024  # 8-block groups (lanes) per chunk => 8192 blocks/chunk
NS = 1024  # stripe slots per chunk (<= NG)
MAX_WBLK = 6  # max aligned 1024-element x windows per chunk


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "val_i",
        "row_i",
        "gseg",
        "ends",
        "xtile",
        "nslots",
        "straddle",
    ],
    meta_fields=["w", "num_chunks", "num_stripes", "wblk", "scan_steps", "identity"],
)
@dataclasses.dataclass(frozen=True)
class StreamClass2:
    w: int
    num_chunks: int
    num_stripes: int
    wblk: int  # x windows per chunk (static, per class)
    scan_steps: int  # log2-rounded max run length in groups
    identity: bool  # every run is one group: slots == lanes, no scan
    val_i: jax.Array  # [8*w, T*NG] f32, interleaved groups
    row_i: jax.Array  # [8, T*NG] int32
    gseg: jax.Array  # [1, T*NG] int32, group -> in-chunk run id
    ends: jax.Array  # [1, T*NS] int32, lane of each ended stripe's last group
    xtile: jax.Array  # [T] int32, 1024-aligned x window base index
    nslots: jax.Array  # [T] int32, ended stripes in chunk
    straddle: jax.Array  # [T] int32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["classes", "y_perm", "fallback", "y_plan", "fb_gather"],
    meta_fields=["m", "n", "total_slots", "natural"],
)
@dataclasses.dataclass(frozen=True)
class StreamFormat2:
    m: int
    n: int
    total_slots: int
    natural: bool  # slot order == natural order: y = slots[:n]
    classes: tuple
    fallback: object  # v1 StreamFormat or None
    y_perm: jax.Array  # [n] int32 into [v2 slots | v1 slots]
    y_plan: object  # windowed-gather PermutePlan or None (XLA fallback)
    fb_gather: tuple = ()  # per fallback class: permute plan or None


def _pack_class(B: VBC1D, stripes: np.ndarray, w: int):
    """Vectorized chunk planning + materialization for one width class."""
    S = stripes.size
    nb = (B.pos[stripes + 1] - B.pos[stripes]).astype(np.int64)
    ngr = np.maximum(1, -(-nb // 8))

    # ---- chunk planning (C++ fast path; Python loop is the oracle) -----
    from ..native import stream_chunk_plan_native

    planned = stream_chunk_plan_native(ngr, NG, NS)
    if planned is not None:
        pieces_arr, straddle, nslots = planned
        T = straddle.size
    else:
        g_in_chunk = 0
        s_in_chunk = 0
        chunk = 0
        pieces = []
        straddle = []
        nslots_l = []
        for i in range(S):
            left = int(ngr[i])
            g0 = 0
            if s_in_chunk >= NS or g_in_chunk >= NG:
                straddle.append(0)
                nslots_l.append(s_in_chunk)
                chunk += 1
                g_in_chunk = 0
                s_in_chunk = 0
            while left > 0:
                room = NG - g_in_chunk
                take = min(room, left)
                pieces.append((i, g0, g0 + take, chunk))
                g_in_chunk += take
                g0 += take
                left -= take
                if left > 0:
                    straddle.append(1)
                    nslots_l.append(s_in_chunk)
                    chunk += 1
                    g_in_chunk = 0
                    s_in_chunk = 0
            s_in_chunk += 1
        straddle.append(0)
        nslots_l.append(s_in_chunk)
        T = chunk + 1
        straddle = np.asarray(straddle, dtype=np.int32)
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
    grp_col = grp_chunk * NG + lane0[grp_piece] + within
    grp_run = run_id[grp_piece]

    blk_grp = np.repeat(np.arange(grp_piece.size), 8)
    blk_sub = np.tile(np.arange(8), grp_piece.size)
    blk_in_stripe = grp_in_stripe[blk_grp] * 8 + blk_sub
    blk_stripe = grp_stripe[blk_grp]
    real = blk_in_stripe < nb[blk_stripe]

    pos0 = B.pos[stripes].astype(np.int64)
    gblk = pos0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1)
    # clamp: stripes with zero blocks produce gblk = pos0 - 1 (possibly -1,
    # or any index when idx is empty); `real` masks those lanes out
    idx_safe = B.idx if B.idx.size else np.zeros(1, B.idx.dtype)
    rows_full = np.where(real, idx_safe[np.clip(gblk, 0, idx_safe.size - 1)], 0)

    ofs0 = B.ofs[stripes].astype(np.int64)
    vbase = ofs0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1) * w

    # ---- per-(chunk, vreg) window bases & locality ----------------------
    # Each vreg (128 lane-groups) gets up to MAX_WBLK *independent*
    # aligned 1024-element x windows — the locality requirement is "rows
    # fall in <= MAX_WBLK distinct aligned tiles per vreg", far weaker
    # than a contiguous span bound, and banded matrices need one fewer
    # window (less gather work) than with consecutive windows.
    nv = NG // 128
    blk_chunk = grp_chunk[blk_grp]
    blk_vreg = blk_chunk * nv + (grp_col[blk_grp] % NG) // 128
    tile_of_blk = rows_full >> 10
    ntile_tot = int(tile_of_blk.max(initial=0)) + 1
    pair = blk_vreg * ntile_tot + tile_of_blk
    uniq = np.unique(pair[real]) if real.any() else np.zeros(0, np.int64)
    uv = uniq // ntile_tot
    ut = uniq % ntile_tot
    counts = np.bincount(uv, minlength=T * nv)
    wblk = int(max(1, counts.max(initial=1)))
    if wblk > MAX_WBLK:
        return None, None, False
    start = np.zeros(T * nv + 1, dtype=np.int64)
    np.cumsum(counts, out=start[1:])
    d_of_uniq = np.arange(uniq.size) - start[uv]
    xtile = np.zeros((T * nv, wblk), dtype=np.int32)
    xtile[uv, d_of_uniq] = ut
    # unused window slots point at the vreg's first USED window (meta
    # never selects them): re-fetching an already-resident tile beats
    # DMA-ing tile 0, and the distributed halo/overlap planners read
    # xtile as "tiles this chunk touches" — phantom tile-0 entries made
    # every chunk on devices > 0 look non-local (plan_overlap k=0)
    used = np.zeros((T * nv, wblk), dtype=bool)
    used[uv, d_of_uniq] = True
    first = xtile[:, 0]  # slot 0 is used whenever the vreg has any tile
    # vregs with NO used windows (all-pad) inherit the nearest
    # preceding real vreg's tile (forward-fill, then backward for a
    # leading run): tail-pad vregs then point at tiles local to the
    # same device instead of phantom tile 0, which made plan_overlap
    # classify their chunks remote and plan_halo ship tile 0 around
    has_any = counts > 0
    if not has_any.all() and has_any.any():
        idxs = np.where(has_any, np.arange(T * nv), -1)
        ff = np.maximum.accumulate(idxs)
        bf_src = np.where(has_any, np.arange(T * nv), T * nv)
        bf = np.minimum.accumulate(bf_src[::-1])[::-1]
        src = np.where(ff >= 0, ff, bf)
        first = first[np.clip(src, 0, T * nv - 1)]
    xtile = np.where(used, xtile, first[:, None])
    xtile = xtile.reshape(-1)  # [T*nv*wblk], window d of vreg v at v*wblk+d

    if real.any():
        u_idx = np.searchsorted(uniq, pair)
        d_blk = np.where(real, d_of_uniq[np.minimum(u_idx, uniq.size - 1)], 0)
    else:
        d_blk = np.zeros_like(rows_full)
    # store rows as LOCAL offsets: window slot d*1024 + row % 1024
    rows_full = np.where(real, d_blk * 1024 + (rows_full & 1023), 0)

    # ---- materialize arrays --------------------------------------------
    val_i = np.zeros((8 * w, T * NG), dtype=np.float32)
    row_i = np.zeros((8, T * NG), dtype=np.int32)
    gseg = np.zeros((1, T * NG), dtype=np.int32)
    ends = np.zeros((1, T * NS), dtype=np.int32)

    row_i[blk_sub, grp_col[blk_grp]] = rows_full
    val_safe = B.val if B.val.size else np.zeros(1, B.val.dtype)
    for wi in range(w):
        v_w = np.where(
            real,
            val_safe[np.clip(vbase + wi, 0, val_safe.size - 1)].astype(
                np.float32
            ),
            0.0,
        )
        val_i[wi * 8 + blk_sub, grp_col[blk_grp]] = v_w

    gseg[0, grp_col] = grp_run
    used = np.zeros(T * NG, dtype=bool)
    used[grp_col] = True
    gs = gseg[0].reshape(T, NG)
    us = used.reshape(T, NG)
    lastrun = np.maximum.accumulate(np.where(us, gs, -1), axis=1)
    gseg[0] = np.where(us, gs, np.maximum(lastrun, 0)).reshape(-1)

    # ---- ends & slots ----------------------------------------------------
    last_piece = np.searchsorted(pi, np.arange(S), side="right") - 1
    end_chunk = pchunk[last_piece]
    end_lane = lane0[last_piece] + plen[last_piece] - 1
    first_end = np.searchsorted(end_chunk, np.arange(T), side="left")
    slot = np.arange(S) - first_end[end_chunk]
    ends[0, end_chunk * NS + slot] = end_lane
    slot_of_stripe = np.stack([end_chunk, slot], axis=1)

    max_run = int(plen.max(initial=1))
    scan_steps = 0
    while (1 << scan_steps) < max_run:
        scan_steps += 1
    arrays = dict(
        val_i=val_i,
        row_i=row_i,
        gseg=gseg,
        ends=ends,
        xtile=xtile,
        nslots=nslots,
        straddle=straddle,
        T=T,
        wblk=wblk,
        scan_steps=scan_steps,
        identity=bool(max_run == 1),
    )
    return arrays, slot_of_stripe, True


def pack_stream2(B: VBC1D, device: bool = True) -> StreamFormat2:
    """Host packer: VBC1D -> interleaved chunked streams (+ v1 fallback).

    ``device=False`` keeps host arrays (callers that post-process and
    re-put, e.g. the 2-D bundle packer, avoid tunnel round trips)."""
    widths = B.Phi.widths()
    classes = []
    fallback_stripes = []
    flat_base = 0
    y_perm = np.zeros(B.n, dtype=np.int64)

    for w in range(1, B.W + 1):
        stripes = np.flatnonzero(widths == w)
        if stripes.size == 0:
            continue
        arrays, slot_of_stripe, local = _pack_class(B, stripes, w)
        if not local:
            fallback_stripes.extend(int(l) for l in stripes)
            continue
        T = arrays.pop("T")
        wblk = arrays.pop("wblk")
        scan_steps = arrays.pop("scan_steps")
        identity = arrays.pop("identity")
        g_arr, s_arr = slot_of_stripe[:, 0], slot_of_stripe[:, 1]
        j0s = B.Phi.spl[stripes].astype(np.int64)
        bases = flat_base + (g_arr * NS + s_arr) * w
        cols = (j0s[:, None] + np.arange(w)[None, :]).reshape(-1)
        y_perm[cols] = (bases[:, None] + np.arange(w)[None, :]).reshape(-1)
        classes.append(
            StreamClass2(
                w=w,
                num_chunks=int(T),
                num_stripes=int(stripes.size),
                wblk=int(wblk),
                scan_steps=int(scan_steps),
                identity=bool(identity),
                **arrays,
            )
        )
        flat_base += T * NS * w

    fallback = None
    fb_gather = ()
    if fallback_stripes:
        sub = _subset_vbc(B, sorted(fallback_stripes))
        # host arrays: the gather plans read c.row below, and pulling a
        # device array back through the TPU tunnel stalls for minutes
        fb = v1.pack_stream(sub.B, device=False)
        y_perm[sub.cols] = flat_base + fb.y_perm
        flat_base += int(fb.total_slots)
        fb_gather = tuple(
            wg.pack_permute(np.asarray(c.row, dtype=np.int64), B.m)
            for c in fb.classes
        )
        fallback = fb  # host arrays; the final device_put covers it

    natural = bool(np.array_equal(y_perm, np.arange(B.n)))
    y_plan = None if natural else wg.pack_permute(y_perm, max(1, flat_base))
    fmt = StreamFormat2(
        m=B.m,
        n=B.n,
        total_slots=flat_base,
        natural=natural,
        classes=tuple(classes),
        fallback=fallback,
        y_perm=y_perm.astype(np.int32),
        y_plan=y_plan,
        fb_gather=fb_gather,
    )
    return jax.device_put(fmt) if device else fmt


@dataclasses.dataclass
class _Subset:
    B: VBC1D
    cols: np.ndarray


def _subset_vbc(B: VBC1D, stripe_ids) -> _Subset:
    """Extract a sub-VBC1D containing only the given stripes."""
    stripe_ids = np.asarray(stripe_ids, dtype=np.int64)
    widths = B.Phi.widths()[stripe_ids]
    spl = np.zeros(stripe_ids.size + 1, dtype=np.int64)
    np.cumsum(widths, out=spl[1:])
    nblocks = (B.pos[stripe_ids + 1] - B.pos[stripe_ids]).astype(np.int64)
    pos = np.zeros(stripe_ids.size + 1, dtype=np.int64)
    np.cumsum(nblocks, out=pos[1:])
    from ..formats.partition import SplitPartition

    idx = (
        np.concatenate([B.idx[B.pos[l] : B.pos[l + 1]] for l in stripe_ids])
        if stripe_ids.size
        else np.zeros(0, dtype=B.idx.dtype)
    )
    val = (
        np.concatenate(
            [
                B.val[
                    B.ofs[l] : B.ofs[l]
                    + (B.pos[l + 1] - B.pos[l])
                    * (B.Phi.spl[l + 1] - B.Phi.spl[l])
                ]
                for l in stripe_ids
            ]
        )
        if stripe_ids.size
        else np.zeros(0, dtype=B.val.dtype)
    )
    ofs = np.zeros(stripe_ids.size + 1, dtype=np.int64)
    np.cumsum(nblocks * widths, out=ofs[1:])
    sub = VBC1D(
        m=B.m,
        n=int(spl[-1]),
        W=B.W,
        Phi=SplitPartition(spl),
        pos=pos,
        idx=idx,
        ofs=ofs,
        val=val,
    )
    cols = np.concatenate(
        [np.arange(B.Phi.spl[l], B.Phi.spl[l + 1]) for l in stripe_ids]
    ).astype(np.int64)
    return _Subset(B=sub, cols=cols)


def _class_kernel2(
    w: int, wblk: int, scan_steps: int, identity: bool, nat_out: bool = False
):
    nv = NG // 128  # lane vregs per chunk

    def kernel(xtile_ref, nslots_ref, straddle_ref, val_ref, row_ref,
               gseg_ref, ends_ref, *rest):
        nwin = nv * wblk
        win_refs = rest[:nwin]
        out_ref = rest[nwin]
        carry = rest[nwin + 1]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        # ---- windowed gather: xg[8, NG] = x[row] ----------------------
        # row_ref holds pack-time local offsets into per-vreg windows.
        local = row_ref[...]  # [8, NG]
        hi = jax.lax.shift_right_logical(local, jnp.int32(7))
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            hi_s = hi[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for wi_ in range(wblk):
                wv = win_refs[v_ * wblk + wi_][...]
                for s in range(8):
                    tbl = jnp.broadcast_to(wv[s : s + 1, :], (8, 128))
                    cand = jnp.take_along_axis(tbl, lo_s, axis=1)
                    acc = jnp.where(hi_s == wi_ * 8 + s, cand, acc)
            xg_slices.append(acc)
        xg = jnp.concatenate(xg_slices, axis=1)  # [8, NG]

        # ---- product + within-group (sublane) reduction ---------------
        xg_t = jnp.concatenate([xg] * w, axis=0)  # [8w, NG]
        prod = val_ref[...] * xg_t
        red = prod.reshape(w, 8, NG).sum(axis=1)  # [w, NG]

        # ---- segmented inclusive scan over lane groups ----------------
        # Per-class static scan depth: runs are at most 2**scan_steps
        # groups long (identity classes skip the scan entirely).
        if identity or scan_steps == 0:
            sc = red
        else:
            seg = gseg_ref[...]  # [1, NG]
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, NG), 1)
            sames = []
            k = 1
            for _ in range(scan_steps):
                sames.append((seg == pltpu.roll(seg, k, 1)) & (lane1 >= k))
                k *= 2
            sc = red
            k = 1
            for same in sames:
                sc = sc + jnp.where(same, pltpu.roll(sc, k, 1), 0.0)
                k *= 2

        # ---- extract ended-stripe totals ------------------------------
        if identity:
            tot = sc  # slots == lanes (every run is one group)
        else:
            ends_all = ends_ref[...]  # [1, NS]
            # Mosaic's dynamic lane gather rejects 1-sublane operands;
            # widen w==1 extractions to the native 8 sublanes and keep
            # row 0 (observed "Shape mismatch in input, indices and
            # output" on TPU for (1, 128) take_along_axis).
            wq = 8 if w == 1 else w
            tot_parts = []
            for j in range(NS // 128):
                ej = ends_all[:, j * 128 : (j + 1) * 128]  # [1, 128]
                ehi = jax.lax.shift_right_logical(ej, jnp.int32(7))
                elo = jax.lax.bitwise_and(ej, jnp.int32(127))
                elo_b = jnp.broadcast_to(elo, (wq, 128))
                acc = jnp.zeros((wq, 128), jnp.float32)
                for i in range(nv):
                    sci = sc[:, i * 128 : (i + 1) * 128]
                    if wq != w:
                        sci = jnp.broadcast_to(sci, (wq, 128))
                    cand = jnp.take_along_axis(sci, elo_b, axis=1)
                    acc = jnp.where(
                        jnp.broadcast_to(ehi == i, (wq, 128)), cand, acc
                    )
                tot_parts.append(acc[:w])
            tot = jnp.concatenate(tot_parts, axis=1)  # [w, NS]
        laneN = jax.lax.broadcasted_iota(jnp.int32, (w, NS), 1)
        nsl = nslots_ref[g]
        tot = jnp.where(laneN < nsl, tot, 0.0)

        # ---- carry chain ----------------------------------------------
        prev_str = jax.lax.select(
            g > 0,
            straddle_ref[jnp.maximum(g - 1, 0)],
            jnp.zeros((), straddle_ref.dtype),
        )
        carry_vec = carry[:w, 0:1]
        tot = tot + jnp.where(
            (laneN == 0) & (prev_str == 1) & (nsl > 0), carry_vec, 0.0
        )
        tail = sc[:, NG - 1 : NG]
        carry_new = tail + jnp.where(
            (prev_str == 1) & (nsl == 0), carry_vec, 0.0
        )
        is_str = straddle_ref[g] == 1
        carry[:w, 0:1] = jnp.where(is_str, carry_new, 0.0)

        # Transposed [NS, w] store: flat HBM order becomes slot-major
        # (slot, wi) — the natural order within the class, no XLA
        # transpose needed downstream.  The in-register transpose +
        # strided DMA measured ~7us/chunk-grid vs ~26us for the XLA
        # transpose pass it replaces (v5e, 40-chunk flagship).
        out_ref[...] = tot.T if nat_out else tot

    return kernel


def _run_class2(c: StreamClass2, x2d: jax.Array) -> jax.Array:
    """Run one width class; returns flat slot-major output [T*NS*w]."""
    w, T, wblk = c.w, c.num_chunks, c.wblk
    nv = NG // 128
    nat_out = w > 1  # w==1: [1, T*NS] flat is already slot order
    win_specs = [
        pl.BlockSpec(
            (8, 128),
            (
                lambda v, d: (
                    lambda g, xtile, *_: (
                        xtile[(g * nv + v) * wblk + d],
                        0,
                    )
                )
            )(v, d),
            memory_space=pltpu.VMEM,
        )
        for v in range(nv)
        for d in range(wblk)
    ]
    if nat_out:
        out_spec = pl.BlockSpec(
            (NS, w), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((T * NS, w), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (w, NS), lambda g, *_: (0, g), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((w, T * NS), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8 * w, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NS), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            *win_specs,
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        _class_kernel2(w, wblk, c.scan_steps, c.identity, nat_out),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        c.xtile,
        c.nslots,
        c.straddle,
        c.val_i,
        c.row_i,
        c.gseg,
        c.ends,
        *([x2d] * ((NG // 128) * wblk)),
    )
    return out.reshape(-1)


def _x_2d(x: jax.Array, m: int) -> jax.Array:
    """x as [8k + pad, 128] rows (1024-element aligned window tiles)."""
    rows = 8 * (-(-m // 1024) + MAX_WBLK)
    xp = jnp.zeros(rows * 128, jnp.float32).at[:m].set(x.astype(jnp.float32))
    return xp.reshape(rows, 128)


def tr_spmv_slots(fmt: StreamFormat2, x: jax.Array) -> jax.Array:
    """Slot-space TrSpMV (no final permutation)."""
    x2d = _x_2d(x, fmt.m)
    outs = [_run_class2(c, x2d) for c in fmt.classes]  # flat slot-major
    if fmt.fallback is not None:
        fbg = fmt.fb_gather
        if len(fbg) != len(fmt.fallback.classes):
            # format built without fb_gather (e.g. dataclasses.replace on
            # an old instance): fall back to the plain XLA gather per class
            fbg = (None,) * len(fmt.fallback.classes)
        for c, gplan in zip(fmt.fallback.classes, fbg):
            if gplan is not None:
                # Pallas windowed pre-gather (Clos 3-take) — the XLA
                # gather below runs ~0.6 GB/s on this backend
                xg = wg.apply_permute(gplan, x)
            else:
                xg = x[c.row].astype(jnp.float32)
            out = v1._run_class(c, xg)
            outs.append(out.T.reshape(-1))
    if not outs:
        return jnp.zeros(0, jnp.float32)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def tr_spmv_pallas2(fmt: StreamFormat2, x: jax.Array) -> jax.Array:
    """y = A.T @ x in natural order.

    Fast paths in order: identity slot map (kernel output *is* y),
    Pallas windowed permute when the slot->natural map is local, XLA
    gather fallback otherwise."""
    slots = tr_spmv_slots(fmt, x)
    if fmt.natural:
        return slots[: fmt.n]
    if fmt.y_plan is not None:
        return wg.apply_permute(fmt.y_plan, slots)
    return slots[fmt.y_perm]
