"""Device timing that survives broken async semantics.

On this machine's remote TPU platform (`axon`), ``jax.block_until_ready``
returns before device execution finishes, so wall-clock around a single
dispatch measures only the RPC floor (~60us).  Honest kernel timing
therefore uses the *difference method*: run the op chained N1 and N2
times inside one jit (data-dependent chain so nothing can be elided),
force completion by fetching a scalar element to the host, and report
``(T(N2) - T(N1)) / (N2 - N1)`` — dispatch and transfer constants cancel.

Validated against a known-cost bf16 matmul: reports ~174 TFLOP/s on a
TPU v5e (peak ~197), while naive block_until_ready timing reported an
impossible 4600 TFLOP/s.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["periter", "chain_spmv"]


def periter(make_chained, n_lo=4, n_hi=20, reps=5):
    """Per-iteration seconds of an op.

    ``make_chained(n)`` must return a 0-arg callable that runs the op
    chained ``n`` times on device and returns a scalar (fetched here to
    force completion).

    Endpoints are measured INTERLEAVED and differenced per rep, and
    the estimate is the median of the per-rep diffs.  The earlier
    min-over-reps-per-endpoint scheme silently collapsed when the
    shared chip's ambient load drifted between the two endpoints' rep
    sets (observed: a 2.5M-nnz SpMV "measured" 5.7 us — an impossible
    2.5 TB/s — because min(T_hi) landed in a quiet window and
    min(T_lo) in a loaded one).  Paired diffs are internally
    consistent under drift; the median rejects bursty outliers in
    both directions.
    """
    f_lo, f_hi = make_chained(n_lo), make_chained(n_hi)
    float(np.asarray(f_lo()))  # warm/compile
    float(np.asarray(f_hi()))

    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f_lo()))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(f_hi()))
        t_hi = time.perf_counter() - t0
        diffs.append(t_hi - t_lo)
    d = float(np.median(diffs))
    return max(d, 1e-12) / (n_hi - n_lo)


def chain_spmv(kernel, matrix, x0, n):
    """Build a jitted data-dependent chain of n SpMV applications.

    Requires a square operator (output feeds the next input).  The 0.999
    damping keeps values finite over long chains.
    """
    import jax
    import jax.numpy as jnp

    def chained(mat, x):
        def body(i, x):
            return kernel(mat, x) * jnp.asarray(0.999, x.dtype)

        return jax.lax.fori_loop(0, n, body, x)[0]

    f = jax.jit(chained)
    return lambda: f(matrix, x0)
