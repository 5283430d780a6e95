"""Probe for the SpMM v4 design: (a) XLA row-gather bandwidth on
(m, 128) f32, (b) streaming FMA kernel with (j, stripe, p) row order
(j-sum over big contiguous slices, one strided store per wi)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vbcs_tpu.utils.timing import periter

    m, k = 320001, 128
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    rows = jnp.asarray(rng.integers(0, m, 321536), jnp.int32)

    def mk_take(n):
        def f(X, rows, nn):
            def body(i, s):
                g = jnp.take(X * (1.0 + s * 1e-30), rows, axis=0)
                return s + g[0, 0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(X, rows, n)

    t = periter(mk_take, 2, 12, reps=4)
    nbytes = rows.size * k * 4 * 2
    print(f"XLA row gather: {t*1e6:.0f} us  ~{nbytes/t/1e9:.0f} GB/s (r+w)")

    # (b) FMA kernel, rows ordered (j, stripe-local, p): per chunk the
    # j-sum is 8 big contiguous (SL, 128) slices; out store strided by 8
    SL = 256  # stripes per chunk
    NB = 8   # blocks per stripe
    Rc = SL * NB

    def kern(xg_ref, val_ref, out_ref):
        for wi in range(8):
            acc = jnp.zeros((SL, 128), jnp.float32)
            for j in range(NB):
                acc = acc + (val_ref[j * SL:(j + 1) * SL, wi:wi + 1]
                             * xg_ref[j * SL:(j + 1) * SL, :])
            out_ref[wi:Rc:8, :] = acc

    T = 157
    Xg = jnp.asarray(rng.standard_normal((T * Rc, 128)), jnp.float32)
    Vl = jnp.asarray(rng.standard_normal((T * Rc, 8)), jnp.float32)
    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Rc, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rc, 8), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rc, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * Rc, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def mk_fma(n):
        def f(Xg, Vl, nn):
            def body(i, s):
                out = call(Xg * (1.0 + s * 1e-30), Vl)
                return s + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(Xg, Vl, n)

    t = periter(mk_fma, 2, 12, reps=4)
    bts = T * Rc * 128 * 4 * 2 + T * Rc * 8 * 4
    flops = T * Rc * 8 * 128
    print(f"FMA kernel: {t*1e6:.0f} us  ~{bts/t/1e9:.0f} GB/s  "
          f"~{flops/t/1e12:.2f} TFLOP/s(FMA)")


if __name__ == "__main__":
    main()
