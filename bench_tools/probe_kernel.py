"""Probe: per-chunk cost of TrSpMV kernel components on the real chip.

Measures isolated Pallas kernel variants over the flagship chunk shape
(val stream [64, NG] f32 per chunk, NG=1024, T chunks) with the
difference method, to locate where the 39%-of-roofline kernel burns
time and which redesigns pay.

Run:  python bench_tools/probe_kernel.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NG = 1024
W = 8
T = 39  # flagship chunk count


def periter(make_chained, n_lo=20, n_hi=220, reps=6):
    f_lo, f_hi = make_chained(n_lo), make_chained(n_hi)
    float(np.asarray(f_lo()))
    float(np.asarray(f_hi()))

    def best(f):
        b = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f()))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = best(f_lo), best(f_hi)
    return max(t_hi - t_lo, 1e-12) / (n_hi - n_lo)


def run_variant(name, body, extra_inputs=(), extra_specs=(), wblk=3):
    """body(val_ref, row_ref, win_refs, out_ref) over grid (T,)."""
    nv = NG // 128
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((8 * W, T * NG)), jnp.float32)
    row = jnp.asarray(rng.integers(0, wblk * 1024, (8, T * NG)), jnp.int32)
    x2d = jnp.asarray(rng.standard_normal((8 * (T + 8), 128)), jnp.float32)
    xtile = jnp.asarray(
        rng.integers(0, T, (T * nv * wblk,)), jnp.int32
    )

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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8 * W, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            *win_specs,
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
    )

    def kern(xtile_ref, val_ref, row_ref, *rest):
        nwin = nv * wblk
        win_refs = rest[:nwin]
        extras = rest[nwin:-1]
        out_ref = rest[-1]
        body(val_ref, row_ref, win_refs, out_ref, *extras)

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, T * NG), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def mk(n):
        def f(v):
            def it(i, acc):
                o = call(xtile, v * (1.0 + acc * 1e-30), row, *([x2d] * (nv * wblk)), *extra_inputs)
                return o[0, 0]

            return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

        g = jax.jit(f)
        return lambda: g(val)

    try:
        t = periter(mk)
        per_chunk_ns = t / T * 1e9
        nnz = T * NG * 8 * W
        print(f"{name:42s} {t*1e6:8.1f} us/iter  {per_chunk_ns:8.0f} ns/chunk  {nnz/t/1e9:7.1f} Gnnz/s")
        return t
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    nv = NG // 128

    # ---- 0. pure stream: read val, trivial compute ----------------------
    def body_stream(val_ref, row_ref, win_refs, out_ref):
        v = val_ref[...]
        out_ref[...] = v[:8] + v[8:16]

    run_variant("0 stream val only", body_stream)

    # ---- 1. current gather ladder (wblk=3) -------------------------------
    def body_gather_ladder(val_ref, row_ref, win_refs, out_ref, wblk=3):
        local = row_ref[...]
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
        xg = jnp.concatenate(xg_slices, axis=1)
        out_ref[...] = xg

    run_variant("1 gather ladder wblk=3 (current)", body_gather_ladder)

    # ---- 2. single within-sublane take per window (hi==sublane scheme) ---
    def body_gather_sub(val_ref, row_ref, win_refs, out_ref, wblk=3):
        local = row_ref[...]
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        dwin = jax.lax.shift_right_logical(local, jnp.int32(10))
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            d_s = dwin[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for wi_ in range(wblk):
                wv = win_refs[v_ * wblk + wi_][...]
                cand = jnp.take_along_axis(wv, lo_s, axis=1)
                acc = jnp.where(d_s == wi_, cand, acc) if wblk > 1 else cand
            xg_slices.append(acc)
        out_ref[...] = jnp.concatenate(xg_slices, axis=1)

    run_variant("2 sublane-aligned take x3 win", body_gather_sub)

    def body_gather_sub1(val_ref, row_ref, win_refs, out_ref):
        local = row_ref[...]
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            wv = win_refs[v_ * 3][...]
            xg_slices.append(jnp.take_along_axis(wv, lo_s, axis=1))
        out_ref[...] = jnp.concatenate(xg_slices, axis=1)

    run_variant("2b sublane-aligned take x1 win", body_gather_sub1)

    # ---- 2c. K-roll slack (K=2): take rolled window too ------------------
    def body_gather_roll2(val_ref, row_ref, win_refs, out_ref):
        local = row_ref[...]
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        k = jax.lax.shift_right_logical(local, jnp.int32(10))  # fake dk
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            k_s = k[:, v_ * 128 : (v_ + 1) * 128]
            wv = win_refs[v_ * 3][...]
            c0 = jnp.take_along_axis(wv, lo_s, axis=1)
            wr = pltpu.roll(wv, -1, 0)
            c1 = jnp.take_along_axis(wr, lo_s, axis=1)
            xg_slices.append(jnp.where(k_s == 0, c0, c1))
        out_ref[...] = jnp.concatenate(xg_slices, axis=1)

    run_variant("2c sublane take + 1 roll (K=2)", body_gather_roll2)

    # ---- 3. big take_along_axis (8, 1024) in one op ----------------------
    def body_gather_big(val_ref, row_ref, win_refs, out_ref):
        local = row_ref[...]
        lo = jax.lax.bitwise_and(local, jnp.int32(1023))
        wide = jnp.concatenate([win_refs[v_ * 3][...] for v_ in range(nv)], axis=1)
        out_ref[...] = jnp.take_along_axis(wide, lo, axis=1)

    run_variant("3 take_along_axis (8,1024) wide", body_gather_big)

    # ---- 3b. take_along_axis across sublanes (axis=0) ---------------------
    def body_gather_ax0(val_ref, row_ref, win_refs, out_ref):
        local = row_ref[...]
        hi = jax.lax.bitwise_and(jax.lax.shift_right_logical(local, jnp.int32(7)), jnp.int32(7))
        xg_slices = []
        for v_ in range(nv):
            hi_s = hi[:, v_ * 128 : (v_ + 1) * 128]
            wv = win_refs[v_ * 3][...]
            xg_slices.append(jnp.take_along_axis(wv, hi_s, axis=0))
        out_ref[...] = jnp.concatenate(xg_slices, axis=1)

    run_variant("3b take_along_axis axis=0 sublane", body_gather_ax0)

    # ---- 4. full current kernel (gather + prod + red) ---------------------
    def body_full_current(val_ref, row_ref, win_refs, out_ref, wblk=3):
        local = row_ref[...]
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
        xg = jnp.concatenate(xg_slices, axis=1)
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        red = prod.reshape(W, 8, NG).sum(axis=1)
        out_ref[...] = red

    run_variant("4 current full (gthr+prod+red)", body_full_current)

    # ---- 5. prod+red only (feed xg = const) -------------------------------
    def body_prodred(val_ref, row_ref, win_refs, out_ref):
        xg = win_refs[0][...]
        xg = jnp.broadcast_to(xg[:, :128], (8, 128))
        xg = jnp.tile(xg, (1, nv))
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        red = prod.reshape(W, 8, NG).sum(axis=1)
        out_ref[...] = red

    run_variant("5 prod+red only (reshape-sum)", body_prodred)

    # ---- 5b. prod+red via MXU const matrix --------------------------------
    red_mat = np.zeros((W, 8 * W), np.float32)
    for wi in range(W):
        red_mat[wi, wi * 8 : (wi + 1) * 8] = 1.0
    red_mat_j = jnp.asarray(red_mat)

    def body_prodred_mxu(val_ref, row_ref, win_refs, out_ref, rmat_ref):
        xg = win_refs[0][...]
        xg = jnp.tile(xg[:, :128], (1, nv))
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        red = jax.lax.dot_general(
            rmat_ref[...], prod, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[...] = red

    run_variant(
        "5b prod+red via MXU", body_prodred_mxu,
        extra_inputs=(red_mat_j,),
        extra_specs=(pl.BlockSpec((W, 8 * W), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),),
    )

    # ---- 5c. prod+red via strided slice adds ------------------------------
    def body_prodred_slices(val_ref, row_ref, win_refs, out_ref):
        xg = win_refs[0][...]
        xg = jnp.tile(xg[:, :128], (1, nv))
        v = val_ref[...]
        acc = jnp.zeros((W, NG), jnp.float32)
        # val rows wi*8+s ; sum over s via 8 slices: rows [s::8]? use
        # reshape-free: v[s*W:(s+1)*W]? layout is wi*8+s so slice rows
        # s, 8+s, ... -> strided; try per-s contiguous reinterpret:
        for s in range(8):
            acc = acc + v[s::8, :] * xg[s : s + 1, :]
        out_ref[...] = acc

    run_variant("5c prod+red strided slices", body_prodred_slices)

    # ---- 6. full redesigned: sublane-take gather + MXU red ----------------
    def body_full_new(val_ref, row_ref, win_refs, out_ref, rmat_ref, wblk=3):
        local = row_ref[...]
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        dwin = jax.lax.shift_right_logical(local, jnp.int32(10))
        xg_slices = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            d_s = dwin[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for wi_ in range(wblk):
                wv = win_refs[v_ * wblk + wi_][...]
                cand = jnp.take_along_axis(wv, lo_s, axis=1)
                acc = jnp.where(d_s == wi_, cand, acc) if wblk > 1 else cand
            xg_slices.append(acc)
        xg = jnp.concatenate(xg_slices, axis=1)
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        red = jax.lax.dot_general(
            rmat_ref[...], prod, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[...] = red

    run_variant(
        "6 new full (subtake+MXU red)", body_full_new,
        extra_inputs=(red_mat_j,),
        extra_specs=(pl.BlockSpec((W, 8 * W), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),),
    )


if __name__ == "__main__":
    main()
