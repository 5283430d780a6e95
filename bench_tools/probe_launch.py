"""Probe: fixed per-launch cost of a pallas_call inside a fori_loop,
plus the cost of the pad (at[].set) and reshape glue the one-shot does.
"""

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

    # tiny kernel: copy (8,128)
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    tiny = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x0 = jnp.ones((8, 128), jnp.float32)

    def mk_tiny(n):
        def f(x, nn):
            def body(i, xc):
                return tiny(xc) * 0.999
            return jax.lax.fori_loop(0, nn, body, x)[0, 0]
        g = jax.jit(f)
        return lambda: g(x0, n)

    t = periter(mk_tiny, 20, 220, reps=5)
    print(f"tiny pallas launch: {t*1e6:.2f} us")

    # two tiny launches per iter
    def mk_tiny2(n):
        def f(x, nn):
            def body(i, xc):
                return tiny(tiny(xc)) * 0.999
            return jax.lax.fori_loop(0, nn, body, x)[0, 0]
        g = jax.jit(f)
        return lambda: g(x0, n)

    t = periter(mk_tiny2, 20, 220, reps=5)
    print(f"two tiny pallas launches: {t*1e6:.2f} us")

    # XLA elementwise only
    def mk_xla(n):
        def f(x, nn):
            def body(i, xc):
                return xc * 0.999 + 1.0
            return jax.lax.fori_loop(0, nn, body, x)[0, 0]
        g = jax.jit(f)
        return lambda: g(x0, n)

    t = periter(mk_xla, 20, 220, reps=5)
    print(f"xla elementwise iter: {t*1e6:.2f} us")

    # pad at[].set of 320k into 327k zeros + slice back
    xb = jnp.ones(320000, jnp.float32)

    def mk_pad(n):
        def f(x, nn):
            def body(i, xc):
                xp = jnp.zeros(327680, jnp.float32).at[:320000].set(xc)
                return xp[:320000] * 0.999
            return jax.lax.fori_loop(0, nn, body, x)[0]
        g = jax.jit(f)
        return lambda: g(xb, n)

    t = periter(mk_pad, 20, 220, reps=5)
    print(f"pad+unpad iter: {t*1e6:.2f} us")


if __name__ == "__main__":
    main()
