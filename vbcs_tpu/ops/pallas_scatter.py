"""Routed TrSpMV for unstructured (scattered) matrices.

The reference's planner correctly chooses NO blocking for matrices
like Schmid/thermal1, landing on its CSC baseline at 0.81 Gnnz/s on a
CPU (``/root/reference/src/ref.out:120``, ``src/TrSpMV.jl:1-20``).
The TPU analogs available so far lose that regime: the v2/v3 stream
kernels need windowed x locality that a scatter does not have
(measured 0.113 Gnnz/s in BENCH_r03), and an XLA gather runs at
~0.6 GB/s.  This module is the fast landing spot:

* each column takes ``ceil(cnt/8)`` consecutive LANES (sub-columns)
  of an (8, Np) buffer, capped at 8 (entries beyond 64 spill to a
  tiny COO side list); a column's lanes never cross a 1024-lane chunk
  boundary (pack pads <= 7 lanes per boundary), so no carry chain;
* the per-call gather ``z[s, l] = x[row(s, l)]`` — the part that is
  hopeless for single-pass windowed routing — runs through the
  MULTIPASS radix-routed permute (``ops/multipass``): 1 monotone
  dup-gather + ceil(log_R tiles) Clos passes, each at near-HBM rate,
  and the whole radix chain lowers to ONE scanned Mosaic kernel;
* the compute kernel streams val/z/seg blocks: multiply, reduce the
  8 sublanes, then a 3-step segmented lane scan (runs <= 8) — column
  totals land on each column's LAST sub-column lane;
* the exit ``y[c] = out[end_lane(c)]`` is monotone increasing — one
  windowed permute.

Works for ANY VBC1D (wide stripes expand to their member columns with
explicit fill), but pays ~8 slots per sub-column — the caller should
prefer it only when blocking failed (stripe widths ~1).  There is no
VMEM cap on m or n: x is consumed by the router, never held whole.
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
from . import multipass as mp
from . import windowed_gather as wg

__all__ = ["ScatterFormat", "pack_scatter", "tr_spmv_scatter"]

MAX_SUBCOLS = 8  # lanes per column (64 slots); beyond spills to COO
MAX_MEAN_WIDTH = 2.0  # refuse blocky packs: slot fill would waste


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val2d", "seg", "entry", "exit_plan", "sp_row", "sp_col",
                 "sp_val"],
    meta_fields=["m", "n", "np_lanes", "n_spill"],
)
@dataclasses.dataclass(frozen=True)
class ScatterFormat:
    m: int
    n: int
    np_lanes: int  # buffer lanes (multiple of 1024)
    n_spill: int
    val2d: jax.Array  # [8, np_lanes] f32
    seg: jax.Array  # [1, np_lanes] i32 column id per lane (pads unique)
    entry: object  # MultipassPlan: x -> (8, np_lanes) routed buffer
    exit_plan: object  # windowed permute: out flat -> y[n]
    sp_row: object  # [n_spill] i32 or None
    sp_col: object
    sp_val: object


def _column_entries(B: VBC1D):
    """Flatten a VBC1D into per-column (row, val) entry lists:
    (col, j_within_col, row, val) arrays, j unbounded."""
    spl = B.Phi.spl.astype(np.int64)
    S = spl.size - 1
    pos = B.pos.astype(np.int64)
    ofs = B.ofs.astype(np.int64)
    stripe_w = (spl[1:] - spl[:-1]).astype(np.int64)
    nb = (pos[1:] - pos[:-1]).astype(np.int64)
    # entry (stripe l, block b, wi) -> column spl[l]+wi, row idx[pos[l]+b],
    # val[ofs[l] + b*w + wi]; enumerate blocks once, then per-width fan out
    tot = int((nb * stripe_w).sum())
    cols = np.empty(tot, np.int64)
    js = np.empty(tot, np.int64)
    rows = np.empty(tot, np.int64)
    vidx = np.empty(tot, np.int64)
    off = 0
    for w in np.unique(stripe_w):
        st = np.flatnonzero(stripe_w == w)
        nb_w = nb[st]
        nblk = int(nb_w.sum())
        if nblk == 0:
            continue
        e_str = np.repeat(np.arange(st.size), nb_w)
        e_blk = np.arange(nblk) - np.repeat(np.cumsum(nb_w) - nb_w, nb_w)
        gblk = pos[st][e_str] + e_blk
        vbase = ofs[st][e_str] + e_blk * w
        for wi in range(int(w)):
            sl = slice(off, off + nblk)
            cols[sl] = spl[st][e_str] + wi
            js[sl] = e_blk
            rows[sl] = B.idx[gblk]
            vidx[sl] = vbase + wi
            off += nblk
    return cols[:off], js[:off], rows[:off], vidx[:off]


def pack_scatter(B: VBC1D):
    """VBC1D -> routed scatter format; None when the pack is too
    blocky for the slot budget to make sense (mean stripe width
    > MAX_MEAN_WIDTH) or the router fails (never observed)."""
    widths = B.Phi.widths()
    if widths.size == 0 or float(widths.mean()) > MAX_MEAN_WIDTH:
        return None
    n, m = B.n, B.m
    cols, js, rows, vidx = _column_entries(B)
    vals = np.asarray(B.val, dtype=np.float32)[vidx] if cols.size else \
        np.zeros(0, np.float32)

    cnt = np.bincount(cols, minlength=n) if cols.size else np.zeros(n, int)
    sc = np.clip(-(-cnt // 8), 1, MAX_SUBCOLS)  # lanes per column
    # lane layout: sequential, never crossing a 1024 boundary (so the
    # in-kernel lane scan needs no cross-chunk carry); <= 7 pad lanes
    # per boundary.  Chunk-greedy: each 1024-lane chunk takes the
    # maximal run of columns whose lane counts sum <= 1024 (equivalent
    # to the bump-at-boundary walk, but vectorized — one searchsorted
    # per CHUNK instead of interpreted Python per COLUMN, which grew
    # linearly in n for the large unstructured matrices this kernel
    # targets).
    lane_c = np.empty(n, dtype=np.int64)
    csum = np.cumsum(sc, dtype=np.int64)
    i = 0
    chunk = 0
    while i < n:
        base = csum[i - 1] if i else 0
        j = int(np.searchsorted(csum, base + 1024, side="right"))
        lane_c[i:j] = chunk * 1024 + (csum[i:j] - sc[i:j] - base)
        chunk += 1
        i = j
    Np = max(1024, chunk * 1024)

    rows2d = np.zeros((8, Np), dtype=np.int64)
    mask2d = np.zeros((8, Np), dtype=bool)
    val2d = np.zeros((8, Np), dtype=np.float32)
    seg = np.arange(Np, dtype=np.int64) + n  # pads: unique ids
    seg_fill_c = np.repeat(np.arange(n), sc)
    seg_lane = np.repeat(lane_c, sc) + (
        np.arange(int(sc.sum())) - np.repeat(np.cumsum(sc) - sc, sc))
    seg[seg_lane] = seg_fill_c

    keep = js < 8 * MAX_SUBCOLS
    lane_e = lane_c[cols[keep]] + (js[keep] >> 3)
    sub_e = js[keep] & 7
    rows2d[sub_e, lane_e] = rows[keep]
    mask2d[sub_e, lane_e] = True
    val2d[sub_e, lane_e] = vals[keep]
    ov = ~keep
    n_spill = int(ov.sum())

    g = rows2d.T.reshape(-1)  # pack_clos element order (see pack_permute2d)
    gmask = mask2d.T.reshape(-1)
    entry = mp.pack_multipass(g, m, mask=gmask, layout="2d")
    if entry is None:
        return None
    end_lane = (lane_c + sc[:n] - 1).astype(np.int64)
    exit_plan = wg.pack_permute(end_lane, Np)
    if exit_plan is None:
        return None  # monotone increasing: should always route
    fmt = ScatterFormat(
        m=m, n=n, np_lanes=Np, n_spill=n_spill,
        val2d=val2d,
        seg=seg.astype(np.int32).reshape(1, Np),
        entry=entry,
        exit_plan=exit_plan,
        sp_row=rows[ov].astype(np.int32) if n_spill else None,
        sp_col=cols[ov].astype(np.int32) if n_spill else None,
        sp_val=vals[ov] if n_spill else None,
    )
    return jax.device_put(fmt)


def _scatter_kernel(val_ref, z_ref, seg_ref, out_ref):
    prod = val_ref[...] * z_ref[...]  # [8, 1024]
    red = jnp.sum(prod, axis=0, keepdims=True)  # [1, 1024] sub-col sums
    seg = seg_ref[...]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1024), 1)
    kk = 1
    for _ in range(3):  # runs <= MAX_SUBCOLS = 8
        same = (seg == pltpu.roll(seg, kk, 1)) & (lane1 >= kk)
        red = red + jnp.where(same, pltpu.roll(red, kk, 1), 0.0)
        kk *= 2
    out_ref[...] = red  # column total at each column's LAST lane


def tr_spmv_scatter(fmt: ScatterFormat, x: jax.Array) -> jax.Array:
    """y = A.T @ x for the routed scatter format (f32)."""
    z = mp.apply_multipass(fmt.entry, x.astype(jnp.float32))  # (8, Np)
    T = fmt.np_lanes // 1024
    out = pl.pallas_call(
        _scatter_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, 1024), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1024), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1024), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1024), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, fmt.np_lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(fmt.val2d, z, fmt.seg)
    y = wg.apply_permute(fmt.exit_plan, out.reshape(-1))
    if fmt.n_spill:
        contrib = fmt.sp_val * x.astype(jnp.float32)[fmt.sp_row]
        y = y + jax.ops.segment_sum(contrib, fmt.sp_col,
                                    num_segments=fmt.n)
    return y
