"""Probe 3: fused chained-SpMV kernel shape (the v3 design) on the real chip.

Design under test: ONE pallas_call with grid (n_iters, T);
  * x/y slot buffers (8, T*NS) f32 ping-pong in VMEM scratch,
  * val [8W, NG] + ONE meta [8, NG] int32 stream re-read per iteration,
  * exact 2-take gather: lo/d in meta low bits, per-window sublane
    tables A_d in meta high bits,
  * reshape-sum reduction, masked store to the write buffer,
  * out written only on the last iteration (index_map trick).

The difference method over n_iters measures the pure marginal per-iter
cost — no per-iter XLA passes at all (unlike probe 1/2, which paid an
input-scaling pass per iteration).

Run:  python bench_tools/probe_chain.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NG = 1024
NS = 1024
W = 8
T = 40
NV = NG // 128
X = T * NS  # slot lanes


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


def run_variant(name, body, wblk=2, with_carry=True):
    """body(val, meta, win_list, carry) -> [W, NS] result to store."""
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((8 * W, T * NG)), jnp.float32)
    lo = rng.integers(0, 128, (8, T * NG)).astype(np.int32)
    d = rng.integers(0, wblk, (8, T * NG)).astype(np.int32)
    A = rng.integers(0, 8, (8, T * NG, 2)).astype(np.int32)
    meta = jnp.asarray(lo | (d << 7) | (A[..., 0] << 16) | (A[..., 1] << 19))
    xin = jnp.asarray(rng.standard_normal((8, X)), jnp.float32)
    # window base lanes, 128-aligned
    wbase = jnp.asarray(
        rng.integers(0, X // 128, (T * NV * wblk,)) * 128, jnp.int32
    )

    def make_call(n_iters):
        def kernel(wbase_ref, val_ref, meta_ref, xin_ref, out_ref, xy, carry):
            i = pl.program_id(0)
            t = pl.program_id(1)

            @pl.when((i == 0) & (t == 0))
            def _():
                xy[0] = xin_ref[...]
                carry[...] = jnp.zeros_like(carry)

            p = jax.lax.rem(i, 2)
            res = body(wbase_ref, val_ref, meta_ref, xy, carry, p, t)

            xy[1 - p, :, pl.ds(t * NS, NS)] = res

            @pl.when(i == n_iters - 1)
            def _():
                out_ref[...] = res

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_iters, T),
            in_specs=[
                pl.BlockSpec((8 * W, NG), lambda i, t, *_: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, NG), lambda i, t, *_: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, X), lambda i, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (W, NS),
                lambda i, t, *_: (0, jnp.where(i == n_iters - 1, t, 0)),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 8, X), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, T * NS), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )

    def mk(n):
        call = make_call(n)

        def f(v):
            return call(wbase, v, meta, xin)[0, 0]

        g = jax.jit(f)
        return lambda: g(val)

    try:
        t = periter(mk)
        per_chunk_ns = t / T * 1e9
        nnz = T * NG * 8 * W
        print(
            f"{name:44s} {t*1e6:8.1f} us/iter  {per_chunk_ns:8.0f} ns/chunk"
            f"  {nnz/t/1e9:7.1f} Gnnz/s"
        )
        return t
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def gather2take(wbase_ref, meta_ref, xy, p, t, wblk):
    """Exact 2-take windowed gather from the VMEM read buffer."""
    meta = meta_ref[...]
    lo = jax.lax.bitwise_and(meta, jnp.int32(127))
    dwin = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(meta, jnp.int32(7)), jnp.int32(3)
    )
    xg_slices = []
    for v_ in range(NV):
        lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
        d_s = dwin[:, v_ * 128 : (v_ + 1) * 128]
        acc = jnp.zeros((8, 128), jnp.float32)
        for dd in range(wblk):
            b = wbase_ref[(t * NV + v_) * wblk + dd]
            win = xy[p, :, pl.ds(pl.multiple_of(b, 128), 128)]
            Ad = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(
                    meta[:, v_ * 128 : (v_ + 1) * 128],
                    jnp.int32(16 + 3 * dd),
                ),
                jnp.int32(7),
            )
            t0 = jnp.take_along_axis(win, Ad, axis=0)
            cand = jnp.take_along_axis(t0, lo_s, axis=1)
            acc = jnp.where(d_s == dd, cand, acc) if wblk > 1 else cand
        xg_slices.append(acc)
    return jnp.concatenate(xg_slices, axis=1)  # [8, NG]


def main():
    # ---- A. chain floor: stream val+meta, 2 window reads, no gather ------
    def body_floor(wbase_ref, val_ref, meta_ref, xy, carry, p, t):
        v = val_ref[...]
        b = wbase_ref[t * NV * 2]
        win = xy[p, :, pl.ds(pl.multiple_of(b, 128), 128)]
        red = v.reshape(W, 8, NG).sum(axis=1)
        return red + jnp.tile(win, (1, NV // 1))[:W, :NS] * 0.0

    run_variant("A chain floor (val+meta+red, no gthr)", body_floor)

    # ---- B. full v3 body ---------------------------------------------------
    def body_full(wbase_ref, val_ref, meta_ref, xy, carry, p, t, wblk=2):
        xg = gather2take(wbase_ref, meta_ref, xy, p, t, wblk)
        xg_t = jnp.concatenate([xg] * W, axis=0)
        prod = val_ref[...] * xg_t
        red = prod.reshape(W, 8, NG).sum(axis=1)  # [W, NG]; identity: NS==NG
        laneN = jax.lax.broadcasted_iota(jnp.int32, (W, NS), 1)
        red = jnp.where(laneN < NS, red * jnp.float32(0.999), 0.0)
        return red

    run_variant("B FULL v3 chain (2take,wblk=2)", body_full)

    # ---- C. wblk=1 ---------------------------------------------------------
    def body_w1(wbase_ref, val_ref, meta_ref, xy, carry, p, t):
        return body_full(wbase_ref, val_ref, meta_ref, xy, carry, p, t, wblk=1)

    run_variant("C FULL v3 chain (2take,wblk=1)", body_w1, wblk=1)

    # ---- D. B + carry chain ------------------------------------------------
    def body_carry(wbase_ref, val_ref, meta_ref, xy, carry, p, t):
        red = body_full(wbase_ref, val_ref, meta_ref, xy, carry, p, t)
        carry_vec = carry[:W, 0:1]
        laneN = jax.lax.broadcasted_iota(jnp.int32, (W, NS), 1)
        red = red + jnp.where((laneN == 0) & (t > 0), carry_vec, 0.0)
        carry[:W, 0:1] = red[:, NS - 1 : NS]
        return red

    run_variant("D FULL v3 + carry chain", body_carry)


if __name__ == "__main__":
    main()
