"""Probe: on-chip CORRECTNESS of the new one-shot (padded-natural
store path, cc>0 vregs), plus grid-alone timing through the new call.
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
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(jax.jit(pk3.tr_spmv_oneshot3)(fmt, jnp.asarray(x)))
    want = (A.T @ x.astype(np.float64)).astype(np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    err = np.abs(y / scale - want / scale).max()
    print(f"on-chip max rel err: {err:.2e}  ({'OK' if err < 2e-5 else 'FAIL'})")

    # grid alone (padded-natural input fixed, scalar-sequenced)
    m = fmt.m
    R = -(-m // 1024)
    Rb = -(-R // 8)
    nat_rows = Rb * 64
    xp = jnp.zeros(Rb * 8192, jnp.float32).at[:m].set(jnp.asarray(x))
    xin = jax.block_until_ready(xp.reshape(nat_rows, 128))
    args = [fmt.meta_nat]
    if fmt.has_scan:
        args += [fmt.gseg, fmt.ends]
    args += list(fmt.vals)
    call = pk3._oneshot_call(fmt, Rb * 1024, nat_rows)

    def mk(n):
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

    t = periter(mk, 20, 220, reps=5)
    print(f"new grid alone: {t*1e6:.2f} us")


if __name__ == "__main__":
    main()
