"""Probe 2: v3 kernel design pieces on the real chip.

Questions:
  a. whole-x-in-VMEM input + dynamic sublane-slice windows: cost?
  b. exact 2-take gather (take_axis0 w/ A-array, take_axis1 w/ lo): cost?
  c. int16 metadata loads + upcast: cost vs int32?
  d. full v3 body (gather + prod + reshape-sum red): ns/chunk?
  e. negative roll via positive shift (8-k): works?

Run:  python bench_tools/probe_kernel2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NG = 1024
W = 8
T = 39
NV = NG // 128


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


def run_variant(name, body, meta_dtype=jnp.int32, wblk=2, xrows=2504):
    """body(val_ref, loA_ref, hiA_ref, wbase_ref(smem), x_ref, out_ref).

    val [8W, NG]/chunk; loA/hiA [8, NG]/chunk metadata; x full VMEM;
    wbase [T*NV*wblk] scalar-prefetch window bases (sublane-rows).
    """
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((8 * W, T * NG)), jnp.float32)
    loA = jnp.asarray(rng.integers(0, 128, (8, T * NG)), meta_dtype)
    hiA = jnp.asarray(rng.integers(0, 8, (8, T * NG)), meta_dtype)
    x2d = jnp.asarray(rng.standard_normal((xrows, 128)), jnp.float32)
    wbase = jnp.asarray(
        rng.integers(0, (xrows - 8) // 8, (T * NV * wblk,)) * 8, jnp.int32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8 * W, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole
        ],
        out_specs=pl.BlockSpec((8, NG), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
    )

    def kern(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref):
        body(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref)

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
                o = call(wbase, v * (1.0 + acc * 1e-30), loA, hiA, x2d)
                return o[0, 0]

            return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

        g = jax.jit(f)
        return lambda: g(val)

    try:
        t = periter(mk)
        per_chunk_ns = t / T * 1e9
        nnz = T * NG * 8 * W
        print(f"{name:44s} {t*1e6:8.1f} us/iter  {per_chunk_ns:8.0f} ns/chunk  {nnz/t/1e9:7.1f} Gnnz/s")
        return t
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    # ---- a. floor: stream val + meta, slice x once -----------------------
    def body_floor(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref):
        v = val_ref[...]
        out_ref[...] = v[:8] + v[8:16] + x_ref[0:8, :].sum() * 0.0

    run_variant("a floor (val+meta int32, x vmem)", body_floor)

    # ---- b. window slices from VMEM x ------------------------------------
    def body_winslice(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref, wblk=2):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for v_ in range(NV):
            for d in range(wblk):
                b = wbase_ref[(g * NV + v_) * wblk + d]
                acc = acc + x_ref[pl.ds(b, 8), :]
        out_ref[...] = jnp.tile(acc, (1, NV))

    run_variant("b 16 dyn window slices from x", body_winslice)

    # ---- c. exact 2-take gather wblk=2 ------------------------------------
    def body_take2(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref, wblk=2):
        g = pl.program_id(0)
        lo = loA_ref[...].astype(jnp.int32)
        hiA = hiA_ref[...].astype(jnp.int32)
        dwin = jax.lax.shift_right_logical(lo, jnp.int32(7))
        lo = jax.lax.bitwise_and(lo, jnp.int32(127))
        xg_slices = []
        for v_ in range(NV):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            d_s = dwin[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for d in range(wblk):
                b = wbase_ref[(g * NV + v_) * wblk + d]
                win = x_ref[pl.ds(b, 8), :]
                A = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(
                        hiA[:, v_ * 128 : (v_ + 1) * 128], jnp.int32(3 * d)
                    ),
                    jnp.int32(7),
                )
                a0 = jnp.take_along_axis(win, A, axis=0)
                cand = jnp.take_along_axis(a0, lo_s, axis=1)
                acc = jnp.where(d_s == d, cand, acc) if wblk > 1 else cand
            xg_slices.append(acc)
        out_ref[...] = jnp.concatenate(xg_slices, axis=1)

    run_variant("c 2-take exact gather wblk=2", body_take2)

    # ---- d. full v3 body ---------------------------------------------------
    def body_v3(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref, wblk=2):
        g = pl.program_id(0)
        lo = loA_ref[...].astype(jnp.int32)
        hiA = hiA_ref[...].astype(jnp.int32)
        dwin = jax.lax.shift_right_logical(lo, jnp.int32(7))
        lo = jax.lax.bitwise_and(lo, jnp.int32(127))
        xg_slices = []
        for v_ in range(NV):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            d_s = dwin[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for d in range(wblk):
                b = wbase_ref[(g * NV + v_) * wblk + d]
                win = x_ref[pl.ds(b, 8), :]
                A = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(
                        hiA[:, v_ * 128 : (v_ + 1) * 128], jnp.int32(3 * d)
                    ),
                    jnp.int32(7),
                )
                a0 = jnp.take_along_axis(win, A, axis=0)
                cand = jnp.take_along_axis(a0, lo_s, axis=1)
                acc = jnp.where(d_s == d, cand, acc) if wblk > 1 else cand
            xg_slices.append(acc)
        xg = jnp.concatenate(xg_slices, axis=1)
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        out_ref[...] = prod.reshape(W, 8, NG).sum(axis=1)

    run_variant("d FULL v3 (2take gthr+prod+red)", body_v3)

    # ---- d16. same with int16 metadata ------------------------------------
    run_variant("d16 FULL v3, int16 metadata", body_v3, meta_dtype=jnp.int16)

    # ---- dw1. v3 with wblk=1 ----------------------------------------------
    def body_v3w1(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref):
        body_v3(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref, wblk=1)

    run_variant("dw1 FULL v3 wblk=1", body_v3w1, wblk=1)

    # ---- e. roll with positive shift (sublane) ----------------------------
    def body_roll(wbase_ref, val_ref, loA_ref, hiA_ref, x_ref, out_ref):
        w0 = x_ref[0:8, :]
        r = pltpu.roll(w0, 7, 0)  # == roll -1
        out_ref[...] = jnp.tile(r, (1, NV)) + val_ref[:8]

    run_variant("e pltpu.roll(+7) sublane", body_roll)

    # ---- f. big x (4MB) still ok in VMEM? ---------------------------------
    run_variant("f v3 with 4MB x in VMEM", body_v3, xrows=8192)


if __name__ == "__main__":
    main()
