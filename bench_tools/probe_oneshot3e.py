"""Probe: separate per-LAUNCH overhead from per-CALL grid work.

Runs the one-shot kernel body under a (K, T) grid (K repetitions of the
full T-chunk sweep inside ONE pallas launch, same xin each k).  The
difference method over K isolates the launch-free per-sweep cost; the
single-launch fori_loop number minus that is the launch overhead.
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

    T = fmt.num_chunks
    ng, ns = fmt.ng, fmt.ns

    def ksweep_call(K):
        base = pk3._oneshot_kernel(fmt, nat_rows, grid_axis=1)
        in_specs = [
            pl.BlockSpec((8, ng), lambda k, t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ]
        if fmt.has_scan:
            in_specs += [
                pl.BlockSpec((1, ng), lambda k, t, *_: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), lambda k, t, *_: (0, t),
                             memory_space=pltpu.VMEM),
            ]
        for c, w in enumerate(fmt.ws):
            off, Tc = fmt.offs[c], fmt.offs[c + 1] - fmt.offs[c]
            in_specs.append(
                pl.BlockSpec(
                    (8 * w, ng),
                    (lambda off=off, Tc=Tc: (
                        lambda k, t, *_: (0, jnp.clip(t - off, 0, Tc - 1))
                    ))(),
                    memory_space=pltpu.VMEM,
                ))
        in_specs.append(
            pl.BlockSpec((nat_rows, 128), lambda k, t, *_: (0, 0),
                         memory_space=pltpu.VMEM))
        rows_c = ns * 8 // 128
        out_spec = pl.BlockSpec((rows_c, 128), lambda k, t, *_: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T * rows_c, 128), jnp.float32)

        def kernel(*a):
            base(*a)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(K, T),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )

    import time
    ab = jax.lax.bitcast_convert_type(jnp.float32(1.0), jnp.int32).reshape(1)

    def run(K):
        call = ksweep_call(K)
        g = jax.jit(lambda fmt, xin: call(
            fmt.xtile_nat, ab, fmt.nslots, fmt.straddle, *args, xin))
        out = g(fmt, xin)
        float(np.asarray(out)[0, 0])  # warm
        best = np.inf
        for _ in range(6):
            t0 = time.perf_counter()
            float(np.asarray(g(fmt, xin))[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t2, t42 = run(2), run(42)
    per_sweep = (t42 - t2) / 40
    print(f"per-sweep (launch-free): {per_sweep*1e6:.2f} us")
    print(f"K=2 wall {t2*1e3:.2f} ms (incl. RPC)")


if __name__ == "__main__":
    main()
