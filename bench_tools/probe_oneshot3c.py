"""Probe: progressive composition of the one-shot pipeline (nat mode),
with REAL data dependencies between loop iterations.

L1: pad + relayout, fed back via xin[0, :m-slice] (serial on data)
L2: L1 + grid (out feeds a dummy add into next x)
L3: full one-shot (out -> transpose -> next x)  [the bench number]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import vbcs_tpu as v
    from bench import blocky_matrix
    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.utils.timing import periter

    A = blocky_matrix()
    C = v.CSC.from_scipy(A)
    Phi = v.pack_stripe(C, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8))
    B = v.vbc1d(C, 8, Phi)
    fmt = pk3.pack_stream3(B, mode="nat")
    x = jnp.asarray(np.random.default_rng(1).standard_normal(A.shape[0]),
                    jnp.float32)
    m = fmt.m
    R = -(-m // 1024)
    Rb = -(-R // 8)
    args = [fmt.meta_nat]
    if fmt.has_scan:
        args += [fmt.gseg, fmt.ends]
    args += list(fmt.vals)
    call = pk3._oneshot_call(fmt, Rb * 1024)
    ab = jax.lax.bitcast_convert_type(jnp.float32(0.999), jnp.int32).reshape(1)

    def relayout(xc):
        xp = jnp.zeros(Rb * 8192, jnp.float32).at[:m].set(xc)
        return pk3._tile_relayout_call(Rb)(xp.reshape(Rb * 64, 128))

    def mk_l1(n):
        def f(x0, nn):
            def body(i, xc):
                xin = relayout(xc)
                # serial: next x = first m lanes of the tile buffer row 0
                return xin.reshape(-1)[:m] * 0.999
            return jax.lax.fori_loop(0, nn, body, x0)[0]
        g = jax.jit(f)
        return lambda: g(x, n)

    print(f"L1 pad+relayout serial: {periter(mk_l1, 20, 220, reps=5)*1e6:.2f} us")

    def mk_l2(n):
        def f(fmt, x0, nn):
            def body(i, xc):
                xin = relayout(xc)
                out = call(fmt.xtile_nat, ab, fmt.nslots, fmt.straddle,
                           *args, xin)
                return xc * 0.999 + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, x0)[0]
        g = jax.jit(f)
        return lambda: g(fmt, x, n)

    print(f"L2 +grid serial: {periter(mk_l2, 20, 220, reps=5)*1e6:.2f} us")

    def mk_l3(n):
        def f(fmt, x0, nn):
            def body(i, xc):
                return pk3.tr_spmv_oneshot3(fmt, xc, 0.999)
            return jax.lax.fori_loop(0, nn, body, x0)[0]
        g = jax.jit(f)
        return lambda: g(fmt, x, n)

    print(f"L3 full oneshot: {periter(mk_l3, 20, 220, reps=5)*1e6:.2f} us")


if __name__ == "__main__":
    main()
