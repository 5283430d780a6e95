"""Probe: one-shot TrSpMV via nat-mode vs slot-mode (chain) v3 formats,
with component timings (entry transpose, grid, exit), on the real chip.

Decides which format the per-call op should use (VERDICT r2 item 4:
one-shot >= 0.8x roofline).

CONCLUSIONS from the retired probe_oneshot3{b,c,d,e} variants (pruned
in round 5; their findings live in ops/pallas_trspmv3.py's design
notes and here):
  * b (component split): pad+reshape entry is ~free; the gather grid
    dominates; the exit transpose measured ~37 us/call fused with the
    next call's pad -> replaced by the Eklundh padded store (natural)
    and the Clos/slot-store exits (non-natural).
  * c (layered serial chains): the bench's chained number composes
    linearly from the layers; no hidden pipeline stall between calls.
  * d: window-count sensitivity — nat-mode nwin 4 vs slot-mode 1-2 on
    the flagship; per-window gather cost ~50 ns/(vreg window).
  * e ((K, T) grid): per-launch overhead ~3-4 us; amortized to zero in
    the fused chain, the dominant per-call term only on tiny matrices
    (see TABLE_r05 can_292 notes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import vbcs_tpu as v
    from bench import blocky_matrix, hbm_bandwidth_bytes_per_s, stream_gbytes
    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.utils.timing import periter

    dev0 = jax.devices()[0]
    bw = hbm_bandwidth_bytes_per_s(dev0)
    A = blocky_matrix()
    C = v.CSC.from_scipy(A)
    Phi = v.pack_stripe(C, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8))
    B = v.vbc1d(C, 8, Phi)
    fmt_o = pk3.pack_stream3(B, mode="nat")
    fmt_c = pk3.pack_stream3(B)
    print("nat: nwins", fmt_o.nwins, "nwin", fmt_o.nwin, "T", fmt_o.num_chunks,
          "natural", fmt_o.natural, "entry", fmt_o.entry_mode)
    print("slot: nwins", fmt_c.nwins, "nwin", fmt_c.nwin, "T", fmt_c.num_chunks,
          "natural", fmt_c.natural, "entry", fmt_c.entry_mode)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(A.shape[0]),
                    jnp.float32)

    xy_bytes = 2 * A.shape[0] * 4
    for name, fmt in (("nat", fmt_o), ("slot", fmt_c)):
        bts = stream_gbytes(fmt, "nat" if name == "nat" else "slot") + xy_bytes

        def mk(n, fmt=fmt):
            def f(fmt, x0, nn):
                def body(i, xc):
                    return pk3.tr_spmv_oneshot3(fmt, xc, 0.999)
                return jax.lax.fori_loop(0, nn, body, x0)[0]
            g = jax.jit(f)
            return lambda: g(fmt, x, n)

        t = periter(mk, 20, 220, reps=6)
        print(f"{name}: oneshot {t*1e6:.1f} us  {A.nnz/t/1e9:.1f} Gnnz/s  "
              f"roofline {A.nnz/(bts/bw)/1e9:.1f}  frac {A.nnz/t/(A.nnz/(bts/bw)):.3f}")

    # component: entry transpose alone (slot natural: pad + (X,8).T)
    def mk_entry(n):
        def f(x0, nn):
            def body(i, s):
                buf = pk3.entry3(fmt_c, x * (1.0 + s * 1e-30))
                return s + buf[0, 0]
            return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))
        g = jax.jit(f)
        return lambda: g(x, n)

    t = periter(mk_entry, 20, 220, reps=5)
    print(f"entry3(slot) alone: {t*1e6:.2f} us")

    # component: chain iteration (grid only, amortized)
    def mkc(n):
        g = jax.jit(lambda fmt, x0: pk3.tr_spmv_chain3(fmt, x0, n, 0.999)[0])
        return lambda: g(fmt_c, x)

    t = periter(mkc, 200, 2000, reps=4)
    print(f"chain grid per-iter: {t*1e6:.2f} us")


if __name__ == "__main__":
    main()
