"""Pallas SpMM: Y = A.T @ X for dense RHS, k-tiled over the stream format.

BASELINE.json config 4 ("VBC SpMM with k=32/128 dense RHS columns —
reuse block panels").  The SpMV stream kernel
(:mod:`vbcs_tpu.ops.pallas_trspmv2`) generalizes: one grid pass streams
each chunk's block values *once* and multiplies them against ``KT``
RHS columns simultaneously — the gather index math (lo/hi decomposition
of pack-time local offsets) is shared across columns; only the window
*data* differs per column, read from a k-major reshaped RHS
(``Xt [KT * rows, 128]``) through per-(column, vreg) window blocks.

Larger ``k`` runs as an outer loop over KT-tiles (value stream re-read
``k / KT`` times instead of ``k`` times for the naive column loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_trspmv2 as pk2
from . import windowed_gather as wg

__all__ = ["tr_spmm_pallas", "KT"]

NS, NG = pk2.NS, pk2.NG
KT = 4  # RHS columns per kernel pass


def _class_kernel_spmm(w: int, wblk: int, scan_steps: int, identity: bool):
    nv = NG // 128

    def kernel(xtile_ref, nslots_ref, straddle_ref, val_ref, row_ref,
               gseg_ref, ends_ref, *rest):
        nwin = KT * nv * wblk
        win_refs = rest[:nwin]
        out_ref = rest[nwin]  # [KT*w, NS]
        carry = rest[nwin + 1]  # [8*KT, 128] scratch rows: comp-major
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        local = row_ref[...]  # [8, NG] pack-time local offsets
        hi = jax.lax.shift_right_logical(local, jnp.int32(7))
        lo = jax.lax.bitwise_and(local, jnp.int32(127))

        seg = gseg_ref[...]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, NG), 1)
        if not (identity or scan_steps == 0):
            sames = []
            k = 1
            for _ in range(scan_steps):
                sames.append((seg == pltpu.roll(seg, k, 1)) & (lane1 >= k))
                k *= 2

        laneN = jax.lax.broadcasted_iota(jnp.int32, (w, NS), 1)
        nsl = nslots_ref[g]
        prev_str = jax.lax.select(
            g > 0,
            straddle_ref[jnp.maximum(g - 1, 0)],
            jnp.zeros((), straddle_ref.dtype),
        )
        is_str = straddle_ref[g] == 1

        tot_rows = []
        for kk in range(KT):
            # gather this column's values through its own windows
            xg_slices = []
            for v_ in range(nv):
                lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
                hi_s = hi[:, v_ * 128 : (v_ + 1) * 128]
                acc = jnp.zeros((8, 128), jnp.float32)
                for wi_ in range(wblk):
                    wv = win_refs[(kk * nv + v_) * wblk + wi_][...]
                    for s in range(8):
                        tbl = jnp.broadcast_to(wv[s : s + 1, :], (8, 128))
                        cand = jnp.take_along_axis(tbl, lo_s, axis=1)
                        acc = jnp.where(hi_s == wi_ * 8 + s, cand, acc)
                xg_slices.append(acc)
            xg = jnp.concatenate(xg_slices, axis=1)  # [8, NG]

            xg_t = jnp.concatenate([xg] * w, axis=0)
            prod = val_ref[...] * xg_t
            red = prod.reshape(w, 8, NG).sum(axis=1)  # [w, NG]

            if identity or scan_steps == 0:
                sc = red
            else:
                sc = red
                k = 1
                for same in sames:
                    sc = sc + jnp.where(same, pltpu.roll(sc, k, 1), 0.0)
                    k *= 2

            if identity:
                tot = sc
            else:
                ends_all = ends_ref[...]
                # w==1 widened to 8 sublanes for the lane gather (Mosaic
                # rejects 1-sublane take_along_axis; see pallas_trspmv2)
                wq = 8 if w == 1 else w
                parts = []
                for j in range(NS // 128):
                    ej = ends_all[:, j * 128 : (j + 1) * 128]
                    ehi = jax.lax.shift_right_logical(ej, jnp.int32(7))
                    elo = jax.lax.bitwise_and(ej, jnp.int32(127))
                    elo_b = jnp.broadcast_to(elo, (wq, 128))
                    accp = jnp.zeros((wq, 128), jnp.float32)
                    for i in range(nv):
                        sci = sc[:, i * 128 : (i + 1) * 128]
                        if wq != w:
                            sci = jnp.broadcast_to(sci, (wq, 128))
                        cand = jnp.take_along_axis(sci, elo_b, axis=1)
                        accp = jnp.where(
                            jnp.broadcast_to(ehi == i, (wq, 128)), cand, accp
                        )
                    parts.append(accp[:w])
                tot = jnp.concatenate(parts, axis=1)
            tot = jnp.where(laneN < nsl, tot, 0.0)

            carry_vec = carry[kk * 8 : kk * 8 + w, 0:1]
            tot = tot + jnp.where(
                (laneN == 0) & (prev_str == 1) & (nsl > 0), carry_vec, 0.0
            )
            tail = sc[:, NG - 1 : NG]
            carry_new = tail + jnp.where(
                (prev_str == 1) & (nsl == 0), carry_vec, 0.0
            )
            carry[kk * 8 : kk * 8 + w, 0:1] = jnp.where(
                is_str, carry_new, 0.0
            )
            tot_rows.append(tot)

        out_ref[...] = jnp.concatenate(tot_rows, axis=0)  # [KT*w, NS]

    return kernel


def _xt_2d(X: jax.Array, m: int) -> jax.Array:
    """RHS KT-tile as [KT * rows, 128] (per-column x2d layouts stacked)."""
    rows = 8 * (-(-m // 1024) + pk2.MAX_WBLK)
    cols = []
    for kk in range(KT):
        xp = (
            jnp.zeros(rows * 128, jnp.float32)
            .at[:m]
            .set(X[:, kk].astype(jnp.float32))
        )
        cols.append(xp.reshape(rows, 128))
    return jnp.concatenate(cols, axis=0), rows


def _run_class_spmm(c: pk2.StreamClass2, xt2d: jax.Array, rows: int):
    w, T, wblk = c.w, c.num_chunks, c.wblk
    nv = NG // 128
    rb = rows // 8  # window tiles per column in xt2d

    win_specs = [
        pl.BlockSpec(
            (8, 128),
            (lambda kk, v, d: (
                lambda g, xtile, *_: (
                    kk * rb + xtile[(g * nv + v) * wblk + d],
                    0,
                )
            ))(kk, v, d),
            memory_space=pltpu.VMEM,
        )
        for kk in range(KT)
        for v in range(nv)
        for d in range(wblk)
    ]
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
        out_specs=pl.BlockSpec(
            (KT * w, NS), lambda g, *_: (0, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8 * KT, 128), jnp.float32)],
    )
    return pl.pallas_call(
        _class_kernel_spmm(w, wblk, c.scan_steps, c.identity),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KT * w, T * NS), jnp.float32),
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
        *([xt2d] * (KT * nv * wblk)),
    )


def tr_spmm_pallas(fmt: pk2.StreamFormat2, X: jax.Array) -> jax.Array:
    """Y = A.T @ X in natural order, [n, k]."""
    m, k = X.shape
    k_pad = -(-k // KT) * KT
    if k_pad != k:
        X = jnp.concatenate(
            [X, jnp.zeros((m, k_pad - k), X.dtype)], axis=1
        )
    y_cols = []
    for k0 in range(0, k_pad, KT):
        xt2d, rows = _xt_2d(X[:, k0 : k0 + KT], fmt.m)
        slot_cols = [[] for _ in range(KT)]
        for c in fmt.classes:
            out = _run_class_spmm(c, xt2d, rows)  # [KT*w, T*NS]
            for kk in range(KT):
                slot_cols[kk].append(
                    out[kk * c.w : (kk + 1) * c.w].T.reshape(-1)
                )
        if fmt.fallback is not None:
            from . import pallas_trspmv as v1

            for c in fmt.fallback.classes:
                for kk in range(KT):
                    xg = X[:, k0 + kk][c.row]
                    o = v1._run_class(c, xg.astype(jnp.float32))
                    slot_cols[kk].append(o.T.reshape(-1))
        for kk in range(KT):
            flat = jnp.concatenate(slot_cols[kk])
            if fmt.y_plan is not None:
                y_cols.append(wg.apply_permute(fmt.y_plan, flat))
            else:
                y_cols.append(flat[fmt.y_perm])
    return jnp.stack(y_cols, axis=1)[:, :k]
