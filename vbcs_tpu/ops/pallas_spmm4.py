"""Pallas SpMM v4: Y = A.T @ X for dense RHS, k <= 128, streaming FMA.

Replaces the v3 SpMM's per-column two-take gather (compute-bound at
~50 ns per (vreg, window, column): measured 0.05x of the (val+2X+Y)
roofline at k=128, BENCH_r02/r03) with a design where k fills the LANE
dimension, so every vector op touches all k RHS columns at once:

* chunks are FIXED runs of ``SL`` consecutive stripes, so the output
  block is natural Y rows — no exit permutation, no transpose;
* per chunk the kernel streams ``NT`` consecutive (H, 128) tiles of
  the zero-padded RHS starting at a dynamic 128-aligned base row
  (scalar prefetch; H is sized so NT-1 tiles cover the widest chunk
  row span) and copies them into a (NT*H, 128) VMEM window — the TPU
  analog of the reference's per-stripe x locality
  (``src/multiply_VBC.jl:126-135``);
* per stripe: ``NB`` dynamic (1, 128) row slices from the window and
  ``NB`` outer-product FMAs ``acc[wi, k] += val[j, wi] * xrow[k]``
  into an (8, 128) accumulator (sublane = wi, lane = k) — ~2 vector
  ops per block, each covering all 128 RHS columns.

Scope: single width class w <= 8 with uniform stripes (y rows
consecutive per stripe).  ``pack_spmm4`` returns None otherwise (or
when block padding would inflate work > 2x, or rows are too scattered
for the window scheme) and the caller falls back to the v3/v2 SpMM.
Padded blocks read window row 0 with val = 0.
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

__all__ = ["SpmmFormat4", "pack_spmm4", "tr_spmm_pallas4"]

SL = 448  # stripes per chunk (kernel unroll = SL * NB block slices)
NT = 6  # window tiles per chunk
MAX_WIN_BYTES = 7 << 20  # NT * H * 512 cap (VMEM)
MAX_NB = 16  # blocks-per-stripe cap (padding relief)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val", "rowloc", "xwbase"],
    meta_fields=["w", "nb", "num_chunks", "h", "sl", "m", "n", "ntiles"],
)
@dataclasses.dataclass(frozen=True)
class SpmmFormat4:
    w: int
    nb: int  # padded blocks per stripe
    num_chunks: int
    h: int  # window tile rows (128-mult; window = NT tiles)
    sl: int
    m: int
    n: int
    ntiles: int  # tiles needed in the padded RHS
    val: jax.Array  # [T*SL*NB, 8] f32, row (t, s, j)
    rowloc: jax.Array  # [T*SL*NB] i32 window-local X row per block
    xwbase: jax.Array  # [T] i32 window base (in H-row tiles)


def pack_spmm4(B: VBC1D, sl: int = SL):
    widths = B.Phi.widths()
    if widths.size == 0:
        return None
    ws = np.unique(widths)
    if ws.size != 1 or int(ws[0]) > 8:
        return None
    w = int(ws[0])
    spl = B.Phi.spl.astype(np.int64)
    S = spl.size - 1
    if not np.array_equal(spl, np.arange(S + 1) * w):
        return None  # y rows must be consecutive per stripe
    nb_all = (B.pos[1:] - B.pos[:-1]).astype(np.int64)
    nnz_blocks = int(nb_all.sum())
    NB = max(1, int(nb_all.max(initial=1)))
    if NB > MAX_NB or (nnz_blocks and NB * S > 2 * nnz_blocks):
        return None
    T = -(-S // sl)
    S_pad = T * sl

    idx_safe = B.idx if B.idx.size else np.zeros(1, B.idx.dtype)
    val_safe = B.val if B.val.size else np.zeros(1, B.val.dtype)
    pos0 = B.pos[:-1].astype(np.int64)
    ofs0 = B.ofs[:-1].astype(np.int64)

    rows = np.zeros((S_pad, NB), dtype=np.int64)
    has = np.zeros((S_pad, NB), dtype=bool)
    valm = np.zeros((S_pad, NB, 8), dtype=np.float32)
    for j in range(NB):
        st = np.flatnonzero(nb_all > j)
        has[st, j] = True
        rows[st, j] = idx_safe[pos0[st] + j]
        vbase = ofs0[st] + j * w
        for wi in range(w):
            valm[st, j, wi] = val_safe[vbase + wi].astype(np.float32)

    rows_c = rows.reshape(T, sl * NB)
    has_c = has.reshape(T, sl * NB)
    any_c = has_c.any(axis=1)
    lo = np.where(any_c, np.where(has_c, rows_c, np.iinfo(np.int64).max)
                  .min(1), 0)
    hi = np.where(any_c, np.where(has_c, rows_c, -1).max(1), 0)
    span = int((hi - lo).max(initial=0)) + 1
    H = -(-max(1, -(-span // (NT - 1))) // 128) * 128
    if NT * H * 512 > MAX_WIN_BYTES:
        return None
    base = (lo // H) * H  # window start row; NT tiles cover [base, +NT*H)
    assert int((hi - base).max(initial=0)) < NT * H
    rowloc = np.where(has_c, rows_c - base[:, None], 0).astype(np.int32)

    fmt = SpmmFormat4(
        w=w, nb=NB, num_chunks=T, h=H, sl=sl, m=B.m, n=B.n,
        ntiles=int(base.max(initial=0) // H) + NT,
        val=valm.reshape(-1, 8),
        rowloc=rowloc.reshape(-1),
        xwbase=(base // H).astype(np.int32),
    )
    return jax.device_put(fmt)


def _spmm4_kernel(fmt: SpmmFormat4):
    sl, NB, H = fmt.sl, fmt.nb, fmt.h

    def kernel(rowloc_ref, xwbase_ref, val_ref, *rest):
        xt_refs = rest[:NT]
        out_ref, xwin = rest[NT], rest[NT + 1]
        t = pl.program_id(0)
        for i in range(NT):  # assemble the window (vreg copies)
            xwin[i * H:(i + 1) * H, :] = xt_refs[i][...]
        for s in range(sl):
            acc = jnp.zeros((8, 128), jnp.float32)
            for j in range(NB):
                bi = (t * sl + s) * NB + j
                r = rowloc_ref[bi]
                row = xwin[pl.ds(r, 1), :]
                vcol = val_ref[s * NB + j, :].reshape(8, 1)
                acc = acc + vcol * row
            out_ref[s * 8:(s + 1) * 8, :] = acc

    return kernel


def tr_spmm_pallas4(fmt: SpmmFormat4, X: jax.Array) -> jax.Array:
    """Y = A.T @ X, [n, k] for k <= 128 (loop panels at the caller for
    wider RHS)."""
    m, k = X.shape
    assert k <= 128
    sl, NB, T, H, w = fmt.sl, fmt.nb, fmt.num_chunks, fmt.h, fmt.w
    m_pad = max(fmt.ntiles * H, -(-m // H) * H)
    Xp = jnp.zeros((m_pad, 128), jnp.float32)
    Xp = Xp.at[:m, :k].set(X.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((sl * NB, 8), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    for i in range(NT):
        in_specs.append(
            pl.BlockSpec(
                (H, 128),
                (lambda i=i: (
                    lambda t, rowloc, xwbase: (xwbase[t] + i, 0)
                ))(),
                memory_space=pltpu.VMEM,
            ))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((sl * 8, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NT * H, 128), jnp.float32)],
    )
    call = pl.pallas_call(
        _spmm4_kernel(fmt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * sl * 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    out = call(fmt.rowloc, fmt.xwbase, fmt.val, *([Xp] * NT))
    if w == 8:
        return out[: fmt.n, :k]
    y = out.reshape(T * sl, 8, 128)[:, :w, :]
    return y.reshape(-1, 128)[: fmt.n, :k]
