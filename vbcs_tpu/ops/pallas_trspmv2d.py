"""Dedicated u-blocked Pallas TrSpMV for the 2-D VBC format.

The stream path executes 2-D matrices by expanding every u x w tile into
u one-row blocks (``VBC2D.to_1d_view``) — correct, but it pays one row
index and one scan lane per *row* instead of per *tile*.  This kernel
keeps tiles whole (reference 2-D kernels ``src/multiply_VBC.jl:104-189``
unroll the u x w tile the same way):

* stripes whose tiles all share one height ``u`` bin into exact (u, w)
  classes — a group is 8 tiles in sublanes, ``val_i`` is ``[8*u*w, NG]``
  (band ``wi*u*8 + r*8 + sub`` = tile row r, column wi), and the row
  metadata is one *base* per tile (u x less than the stream expansion);
* the in-kernel windowed gather produces ``u`` bands per window ladder
  (``x[base + r]``, r = 0..u-1) — same gather work as the expansion, but
  the segmented scan and ended-stripe extraction run over u x fewer
  lanes;
* a tile whose rows straddle an aligned 1024-element x-tile boundary
  just requires the successor tile in the vreg's window set: windows are
  sorted, so tile t+1 is adjacent to tile t and ``local + r`` crossing
  the 1024 edge lands exactly in the next window's sublanes;
* stripes with mixed tile heights fall back to the stream expansion
  (``pack_stream2`` on the 1-D view subset) — both slot spaces
  concatenate under one natural-order permutation.

Scan / extraction / carry / transposed store are structurally identical
to :mod:`pallas_trspmv2`; see there for the layout rationale.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.vbc2d import VBC2D
from . import pallas_trspmv2 as pk2

__all__ = ["StreamClass2D", "Stream2DBundle", "pack_stream_vbc2d", "tr_spmv_pallas_2d"]

NG, NS = pk2.NG, pk2.NS
MAX_WBLK = pk2.MAX_WBLK


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_i", "row_i", "gseg", "ends", "xtile", "nslots", "straddle"],
    meta_fields=["u", "w", "num_chunks", "wblk", "scan_steps", "identity"],
)
@dataclasses.dataclass(frozen=True)
class StreamClass2D:
    u: int
    w: int
    num_chunks: int
    wblk: int
    scan_steps: int
    identity: bool
    val_i: jax.Array  # [8*u*w, T*NG] f32
    row_i: jax.Array  # [8, T*NG] int32 window-local tile bases
    gseg: jax.Array  # [1, T*NG]
    ends: jax.Array  # [1, T*NS]
    xtile: jax.Array  # [T*nv*wblk]
    nslots: jax.Array  # [T]
    straddle: jax.Array  # [T]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["classes2d", "fmt1d", "y_perm", "y_plan"],
    meta_fields=["m", "n", "total_slots", "natural"],
)
@dataclasses.dataclass(frozen=True)
class Stream2DBundle:
    m: int
    n: int
    total_slots: int
    natural: bool
    classes2d: tuple  # StreamClass2D
    fmt1d: object  # StreamFormat2 for mixed-height stripes, or None
    y_perm: jax.Array
    y_plan: object


def _pack_class2d(B2: VBC2D, stripes: np.ndarray, u: int, w: int):
    """Chunk-plan + materialize one exact (u, w) class (tile granularity;
    mirrors pallas_trspmv2._pack_class at block granularity)."""
    from ..native import stream_chunk_plan_native

    S = stripes.size
    nb = (B2.pos[stripes + 1] - B2.pos[stripes]).astype(np.int64)
    ngr = np.maximum(1, -(-nb // 8))

    planned = stream_chunk_plan_native(ngr, NG, NS)
    if planned is None:  # pure-python fallback
        g_in, s_in, chunk = 0, 0, 0
        pieces, straddle_l, nslots_l = [], [], []
        for i in range(S):
            left = int(ngr[i])
            g0 = 0
            if s_in >= NS or g_in >= NG:
                straddle_l.append(0)
                nslots_l.append(s_in)
                chunk += 1
                g_in = 0
                s_in = 0
            while left > 0:
                take = min(NG - g_in, left)
                pieces.append((i, g0, g0 + take, chunk))
                g_in += take
                g0 += take
                left -= take
                if left > 0:
                    straddle_l.append(1)
                    nslots_l.append(s_in)
                    chunk += 1
                    g_in = 0
                    s_in = 0
            s_in += 1
        straddle_l.append(0)
        nslots_l.append(s_in)
        pieces_arr = np.asarray(pieces, dtype=np.int64)
        straddle = np.asarray(straddle_l, dtype=np.int32)
        nslots = np.asarray(nslots_l, dtype=np.int32)
        T = straddle.size
    else:
        pieces_arr, straddle, nslots = planned
        T = straddle.size

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

    pos0 = B2.pos[stripes].astype(np.int64)
    gtile = pos0[blk_stripe] + np.minimum(blk_in_stripe, nb[blk_stripe] - 1)
    bases_full = np.where(real, B2.Pi.spl[B2.idx[gtile]], 0).astype(np.int64)
    ofs0 = B2.ofs[stripes].astype(np.int64)
    vbase = ofs0[blk_stripe] + np.minimum(
        blk_in_stripe, nb[blk_stripe] - 1
    ) * (u * w)

    # ---- per-vreg window sets (tile bases may straddle an aligned
    # boundary: also require the successor x-tile, which sorting makes
    # adjacent in the window list) ----------------------------------------
    nv = NG // 128
    blk_chunk = grp_chunk[blk_grp]
    blk_vreg = blk_chunk * nv + (grp_col[blk_grp] % NG) // 128
    t_lo = bases_full >> 10
    t_hi = (bases_full + u - 1) >> 10  # == t_lo or t_lo + 1
    ntile_tot = int(t_hi.max(initial=0)) + 1
    pair = np.concatenate(
        [blk_vreg[real] * ntile_tot + t_lo[real],
         blk_vreg[real] * ntile_tot + t_hi[real]]
    ) if real.any() else np.zeros(0, np.int64)
    uniq = np.unique(pair)
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
    xtile = xtile.reshape(-1)

    if real.any():
        u_idx = np.searchsorted(uniq, blk_vreg * ntile_tot + t_lo)
        d_blk = np.where(real, d_of_uniq[np.minimum(u_idx, max(uniq.size - 1, 0))], 0)
    else:
        d_blk = np.zeros_like(bases_full)
    local = np.where(real, d_blk * 1024 + (bases_full & 1023), 0)

    # ---- materialize -----------------------------------------------------
    val_i = np.zeros((8 * u * w, T * NG), dtype=np.float32)
    row_i = np.zeros((8, T * NG), dtype=np.int32)
    gseg = np.zeros((1, T * NG), dtype=np.int32)
    ends = np.zeros((1, T * NS), dtype=np.int32)

    row_i[blk_sub, grp_col[blk_grp]] = local
    for wi in range(w):
        for r in range(u):
            vv = np.where(
                real, B2.val[vbase + r * w + wi].astype(np.float32), 0.0
            )
            val_i[(wi * u + r) * 8 + blk_sub, grp_col[blk_grp]] = vv

    gseg[0, grp_col] = grp_run
    used = np.zeros(T * NG, dtype=bool)
    used[grp_col] = True
    gs = gseg[0].reshape(T, NG)
    us_ = used.reshape(T, NG)
    lastrun = np.maximum.accumulate(np.where(us_, gs, -1), axis=1)
    gseg[0] = np.where(us_, gs, np.maximum(lastrun, 0)).reshape(-1)

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


def pack_stream_vbc2d(B2: VBC2D) -> Stream2DBundle:
    """Pack a 2-D VBC into u-blocked stream classes (+ 1-D stream
    fallback for mixed-height / non-local stripes)."""
    heights = B2.Pi.widths()
    widths = B2.Phi.widths()
    # per stripe: uniform tile height (or -1 for mixed / empty handling)
    stripe_u = np.full(B2.L, -1, dtype=np.int64)
    for l in range(B2.L):
        ks = B2.idx[B2.pos[l] : B2.pos[l + 1]]
        if ks.size == 0:
            stripe_u[l] = 0  # empty stripes are trivially uniform
            continue
        hs = heights[ks]
        if np.all(hs == hs[0]):
            stripe_u[l] = hs[0]

    classes2d = []
    assigned = np.zeros(B2.L, dtype=bool)
    fallback_stripes = []
    flat_base = 0
    y_perm = np.zeros(B2.n, dtype=np.int64)

    keys = sorted(
        {
            (int(stripe_u[l]), int(widths[l]))
            for l in range(B2.L)
            if stripe_u[l] > 0 and widths[l] > 0
        }
    )
    for u, w in keys:
        stripes = np.flatnonzero((stripe_u == u) & (widths == w))
        arrays, slot_of_stripe, local = _pack_class2d(B2, stripes, u, w)
        if not local:
            fallback_stripes.extend(int(l) for l in stripes)
            continue
        assigned[stripes] = True
        T = arrays.pop("T")
        wblk = arrays.pop("wblk")
        scan_steps = arrays.pop("scan_steps")
        identity = arrays.pop("identity")
        g_arr, s_arr = slot_of_stripe[:, 0], slot_of_stripe[:, 1]
        j0s = B2.Phi.spl[stripes].astype(np.int64)
        bases = flat_base + (g_arr * NS + s_arr) * w
        cols = (j0s[:, None] + np.arange(w)[None, :]).reshape(-1)
        y_perm[cols] = (bases[:, None] + np.arange(w)[None, :]).reshape(-1)
        classes2d.append(
            StreamClass2D(
                u=u,
                w=w,
                num_chunks=int(T),
                wblk=int(wblk),
                scan_steps=int(scan_steps),
                identity=bool(identity),
                **arrays,
            )
        )
        flat_base += T * NS * w

    # everything not in a 2-D class (mixed heights, empty stripes,
    # non-local classes) goes through the 1-D stream expansion so its
    # columns still own slots
    fallback_stripes.extend(int(l) for l in np.flatnonzero(~assigned))
    fallback_stripes = sorted(set(fallback_stripes))
    fmt1d = None
    if fallback_stripes:
        view = B2.to_1d_view()
        sub = pk2._subset_vbc(view, fallback_stripes)
        fmt1d = pk2.pack_stream2(sub.B, device=False)
        sub_perm = np.asarray(fmt1d.y_perm)
        y_perm[sub.cols] = flat_base + sub_perm
        flat_base += int(fmt1d.total_slots)

    from . import windowed_gather as wg

    natural = bool(np.array_equal(y_perm, np.arange(B2.n)))
    y_plan = None if natural else wg.pack_permute(y_perm, max(1, flat_base))
    return jax.device_put(
        Stream2DBundle(
            m=B2.m,
            n=B2.n,
            total_slots=flat_base,
            natural=natural,
            classes2d=tuple(classes2d),
            fmt1d=fmt1d,
            y_perm=y_perm.astype(np.int32),
            y_plan=y_plan,
        )
    )


def _class_kernel2d(
    u: int, w: int, wblk: int, scan_steps: int, identity: bool, nat_out: bool
):
    nv = NG // 128

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

        # ---- windowed gather, u bands: xg[u*8, NG] = x[base + r] -------
        local = row_ref[...]  # [8, NG] tile bases (window-local)
        band_slices = []  # per vreg: [u*8, 128]
        for v_ in range(nv):
            loc_v = local[:, v_ * 128 : (v_ + 1) * 128]
            bands = []
            for r in range(u):
                lr = loc_v + jnp.int32(r)
                hi_s = jax.lax.shift_right_logical(lr, jnp.int32(7))
                lo_s = jax.lax.bitwise_and(lr, jnp.int32(127))
                acc = jnp.zeros((8, 128), jnp.float32)
                for wi_ in range(wblk):
                    wv = win_refs[v_ * wblk + wi_][...]
                    for s in range(8):
                        tbl = jnp.broadcast_to(wv[s : s + 1, :], (8, 128))
                        cand = jnp.take_along_axis(tbl, lo_s, axis=1)
                        acc = jnp.where(hi_s == wi_ * 8 + s, cand, acc)
                bands.append(acc)
            band_slices.append(jnp.concatenate(bands, axis=0))  # [u*8,128]
        xg = jnp.concatenate(band_slices, axis=1)  # [u*8, NG]

        # ---- product + within-tile reduction ---------------------------
        xg_t = jnp.concatenate([xg] * w, axis=0)  # [w*u*8, NG]
        prod = val_ref[...] * xg_t
        red = prod.reshape(w, u * 8, NG).sum(axis=1)  # [w, NG]

        # ---- segmented scan / extraction / carry: same as v2 -----------
        if identity or scan_steps == 0:
            sc = red
        else:
            seg = gseg_ref[...]
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

        if identity:
            tot = sc
        else:
            ends_all = ends_ref[...]
            wq = 8 if w == 1 else w
            tot_parts = []
            for j in range(NS // 128):
                ej = ends_all[:, j * 128 : (j + 1) * 128]
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
            tot = jnp.concatenate(tot_parts, axis=1)
        laneN = jax.lax.broadcasted_iota(jnp.int32, (w, NS), 1)
        nsl = nslots_ref[g]
        tot = jnp.where(laneN < nsl, tot, 0.0)

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

        out_ref[...] = tot.T if nat_out else tot

    return kernel


def _run_class2d(c: StreamClass2D, x2d: jax.Array) -> jax.Array:
    """Run one (u, w) class; returns flat slot-major output [T*NS*w]."""
    u, w, T, wblk = c.u, c.w, c.num_chunks, c.wblk
    nv = NG // 128
    nat_out = w > 1
    win_specs = [
        pl.BlockSpec(
            (8, 128),
            (
                lambda v, d: (
                    lambda g, xtile, *_: (xtile[(g * nv + v) * wblk + d], 0)
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
            pl.BlockSpec(
                (8 * u * w, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NS), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            *win_specs,
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        _class_kernel2d(u, w, wblk, c.scan_steps, c.identity, nat_out),
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
        *([x2d] * (nv * wblk)),
    )
    return out.reshape(-1)


def tr_spmv_pallas_2d(bundle: Stream2DBundle, x: jax.Array) -> jax.Array:
    """y = A.T @ x in natural order on the u-blocked 2-D stream."""
    from . import windowed_gather as wg

    x2d = pk2._x_2d(x, bundle.m)
    outs = [_run_class2d(c, x2d) for c in bundle.classes2d]
    if bundle.fmt1d is not None:
        outs.append(pk2.tr_spmv_slots(bundle.fmt1d, x))
    slots = (
        outs[0]
        if len(outs) == 1
        else jnp.concatenate(outs)
        if outs
        else jnp.zeros(0, jnp.float32)
    )
    if bundle.natural:
        return slots[: bundle.n]
    if bundle.y_plan is not None:
        return wg.apply_permute(bundle.y_plan, slots)
    return slots[bundle.y_perm]
