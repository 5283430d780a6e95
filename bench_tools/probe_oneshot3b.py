"""Probe: component times inside tr_spmv_oneshot3 (nat mode).

(a) pad + reshape + tile relayout kernel
(b) the gather grid alone (xin held fixed; sequenced via alpha)
(c) exit transpose alone
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

    R = -(-fmt.m // 1024)
    Rb = -(-R // 8)

    # (a) pad + relayout
    def mk_a(n):
        def f(x0, nn):
            def body(i, s):
                xp = jnp.zeros(Rb * 8192, jnp.float32).at[: fmt.m].set(
                    x0 * (1.0 + s * 1e-30))
                xin = pk3._tile_relayout_call(Rb)(xp.reshape(Rb * 64, 128))
                return s + xin[0, 0]
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(x, n)

    t = periter(mk_a, 20, 220, reps=5)
    print(f"pad+relayout: {t*1e6:.2f} us")

    # (b) grid alone, xin fixed, sequenced via alpha
    xp = jnp.zeros(Rb * 8192, jnp.float32).at[: fmt.m].set(x)
    xin = pk3._tile_relayout_call(Rb)(xp.reshape(Rb * 64, 128))
    xin = jax.block_until_ready(xin)
    args = [fmt.meta_nat]
    if fmt.has_scan:
        args += [fmt.gseg, fmt.ends]
    args += list(fmt.vals)
    call = pk3._oneshot_call(fmt, Rb * 1024)

    def mk_b(n):
        def f(fmt, xin0, nn):
            def body(i, s):
                ab = jax.lax.bitcast_convert_type(
                    jnp.float32(1.0) + s * 1e-30, jnp.int32).reshape(1)
                out = call(fmt.xtile_nat, ab, fmt.nslots, fmt.straddle,
                           *args, xin0)
                return s + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(fmt, xin, n)

    t = periter(mk_b, 20, 220, reps=5)
    print(f"grid alone: {t*1e6:.2f} us")

    # (c) exit transpose
    out0 = jax.block_until_ready(
        call(fmt.xtile_nat,
             jax.lax.bitcast_convert_type(jnp.float32(1.0), jnp.int32
                                          ).reshape(1),
             fmt.nslots, fmt.straddle, *args, xin))

    def mk_c(n):
        def f(o, nn):
            def body(i, s):
                y = (o * (1.0 + s * 1e-30)).T.reshape(-1)[: fmt.n]
                return s + y[0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(out0, n)

    t = periter(mk_c, 20, 220, reps=5)
    print(f"exit transpose: {t*1e6:.2f} us")


if __name__ == "__main__":
    main()
