"""Micro-probe: fused SpMM kernel pattern — per-stripe dynamic row
slices from a VMEM X window + outer-product FMA + static (8,128) store.

Per stripe (8 blocks, w=8): 8 dynamic (1,128) row reads, 8 outer FMAs
into an (8,128) acc (sublane=wi, lane=k), one (8,128) store to natural
Y rows.  Measures the achievable rate of the irreducible ~2 ops/block.
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

    SL = 256          # stripes per chunk
    NB = 8            # blocks per stripe
    WROWS = 6144      # X window rows per chunk
    T = 157
    rng = np.random.default_rng(0)

    # scalar-prefetch: per (chunk, stripe, j) local row in the window
    rowloc = jnp.asarray(
        rng.integers(0, WROWS, T * SL * NB), jnp.int32)
    xbase = jnp.asarray(rng.integers(0, 4, T), jnp.int32)  # window base idx
    Xfull = jnp.asarray(
        rng.standard_normal((WROWS + 4 * 128, 128)), jnp.float32)
    Vl = jnp.asarray(rng.standard_normal((T * SL * NB, 8)), jnp.float32)

    def kern(rowloc_ref, xbase_ref, xwin_ref, val_ref, out_ref):
        t = pl.program_id(0)
        for s in range(SL):
            acc = jnp.zeros((8, 128), jnp.float32)
            for j in range(NB):
                bi = (t * SL + s) * NB + j
                r = rowloc_ref[bi]
                row = xwin_ref[pl.ds(r, 1), :]          # (1, 128)
                vcol = val_ref[s * NB + j, :].reshape(8, 1)
                acc = acc + vcol * row                   # outer FMA
            out_ref[s * 8:(s + 1) * 8, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((WROWS, 128),
                         lambda t, xbase, *_: (xbase[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SL * NB, 8), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SL * 8, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * SL * 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    import time
    t0 = time.perf_counter()

    def mk(n):
        def f(Xf, Vl, nn):
            def body(i, s):
                out = call(rowloc, xbase, Xf * (1.0 + s * 1e-30), Vl)
                return s + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(Xfull, Vl, n)

    t = periter(mk, 2, 12, reps=4)
    print(f"(compile+run took {time.perf_counter()-t0:.0f}s)")
    nnzk = T * SL * NB * 8 * 128
    print(f"fused spmm pattern: {t*1e6:.0f} us  "
          f"{nnzk/t/1e12:.2f} T nnzk/s  "
          f"({T*SL*NB/t/1e9:.2f} Gblocks/s)")


if __name__ == "__main__":
    main()
