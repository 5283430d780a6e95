"""Benchmark: 1D-VBC transposed SpMV (the reference's headline op) on one
TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

* value        — achieved Gnnz/s for a SINGLE ``y = A.T @ x`` call (the
                 v3 one-shot kernel: natural x in, natural y out, all
                 traffic from/to HBM) on a banded blocky matrix sized
                 like Boeing/ct20stif (~2.5M nnz, the reference's
                 flagship benchmark matrix).  This is the op the
                 reference's harness times (``bin/test_table.jl:80``).
* vs_baseline  — fraction of the HBM-bandwidth roofline, counting
                 values + metadata + x + y bytes per call.  DENOMINATOR
                 POLICY: measured STREAM rates, never the spec sheet
                 (the 819 GB/s spec is kept as ``hbm_spec_gb_s``; a
                 spec denominator mixes kernel quality with a platform
                 ceiling the hardware never reaches — measured rates
                 run 420-730 GB/s here).  ``vs_baseline`` divides by a
                 STREAM probe run INSIDE the oneshot child seconds
                 before the kernel timing (``oneshot_stream_gb_s``), so
                 numerator and denominator sample the SAME ambient-load
                 window of the shared chip (the run-level ``stream_bw``
                 probe, minutes earlier, skewed the ratio 0.76-1.00
                 across otherwise-identical runs); the other
                 ``*_vs_roofline`` fields divide by the run-level
                 ``hbm_stream_gb_s``.  If every probe fails, the spec
                 rate is the fallback and ``roofline_denominator`` says
                 so.
* extras       — the fused-chain steady-state rate (iterative solver
                 regime: x/y live in VMEM; when the whole val+meta
                 stream is also VMEM-resident no HBM-stream roofline
                 applies and ``chain_vs_roofline`` is null with a
                 ``chain_note``), SpMM v4 (k=128, config 4), the
                 multipass-routed scattered matrix (the regime where
                 the reference falls back to CPU CSC,
                 src/ref.out:120-131 — this build now wins it), the
                 2-D u-blocked kernel, the scrambled-FEM matrix
                 through auto-RCM, and plan/pack times.

FAULT ISOLATION (round-5 hardening; BENCH_r04 lost all seven stages to
one transient ``TPU backend error (Internal)`` that wedged the shared
PJRT client): every stage GROUP now runs in a FRESH SUBPROCESS with its
own wall-clock timeout and one retry.  A wedged client, a tunnel stall,
or a kill -9 costs exactly one group's fields; the parent always prints
the merged JSON line.  Groups run in deliverable-priority order after
the probe: oneshot, spmm, scattered, chain, vbc2d, fem — a shrinking
budget costs the least important rows.

Engineering notes (learned from round-2's rc=124 and round-4's probes —
every rule here exists because its violation cost minutes):
  * each measurement compiles at most TWO jits (the difference-method
    endpoints); the one-shot loop takes the trip count as a TRACED
    argument so both endpoints share one executable;
  * formats are passed to jit as pytree ARGUMENTS, never closed over:
    closure constants are fetched back from the device during MLIR
    lowering (array._value in _array_mlir_constant_handler), which on
    this tunneled platform ships the whole ~12 MB format at RPC pace;
  * per-call timing uses the difference method (utils/timing.py): the
    ~28 ms per-call tunnel constant and ~60 us RPC floor cancel in
    (T(n_hi) - T(n_lo)) / (n_hi - n_lo);
  * the STREAM probe once stalled 447 s on a tunnel hiccup — its
    subprocess cap (60 s) bounds that failure mode to one slice.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("VBCS_BENCH_BUDGET_S", "480"))

# (group name, subprocess wall cap seconds, min budget to launch).
# Every group is a FRESH process: the flagship build (plan+pack,
# ~0.2 s host work) is repeated by the oneshot/spmm/chain groups so
# that each measurement owns its PJRT client — one wedged client or
# kill -9 costs exactly one row.
GROUPS = [
    ("stream_bw", 90, 30),
    ("oneshot", 150, 80),
    ("spmm", 100, 60),
    ("scattered", 150, 60),
    ("chain", 100, 50),
    ("vbc2d", 90, 50),
    ("fem", 110, 60),
]

HBM_SPEC = {
    "v6": 1640e9,
    "v5p": 2765e9,
    "v5": 819e9,  # v5e / v5 lite
    "v4": 1228e9,
    "v3": 900e9,
    "v2": 700e9,
}


def remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def stage(result: dict, name: str, min_budget_s: float):
    """Decorator: run fn() unless the remaining budget is below
    min_budget_s; absorb errors; always continue to the next stage."""

    def deco(fn):
        if remaining() < min_budget_s:
            log(f"SKIP {name}: {remaining():.0f}s left < {min_budget_s}s")
            result.setdefault("skipped", []).append(name)
            return
        log(f"stage {name} (budget left {remaining():.0f}s)")
        try:
            fn()
            log(f"stage {name} done")
        except Exception as e:  # noqa: BLE001 — partial JSON beats rc!=0
            log(f"stage {name} FAILED: {type(e).__name__}: {e}")
            result.setdefault("errors", {})[name] = f"{type(e).__name__}: {e}"

    return deco


def hbm_spec_bytes_per_s(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in HBM_SPEC.items():
        if key in kind:
            return bw
    return 50e9


def roofline_bw(device) -> tuple:
    """(bytes/s, source): the measured same-run STREAM rate passed down
    from the parent when the probe succeeded, else the spec table."""
    env = os.environ.get("VBCS_MEASURED_BW_GB_S", "")
    if env:
        return float(env) * 1e9, "measured_stream"
    return hbm_spec_bytes_per_s(device), "spec"


def blocky_matrix(L=40000, w=8, d=8, band=400, seed=0):
    """Banded blocky matrix: L stripes of width w, d blocks per stripe
    with rows within +-band of the diagonal (RCM-ordered-FEM-like;
    mirrors the reference autotuner's synthetic family,
    src/costs.jl:63-82, plus locality)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    m = L * w
    cs = np.arange(L) * w + w // 2
    rr = np.clip(cs[:, None] + rng.integers(-band, band, (L, d)), 0, m - 1)
    rows = np.repeat(rr.reshape(-1), w)
    cols = (
        np.repeat(np.arange(L) * w, d)[:, None] + np.arange(w)[None, :]
    ).reshape(-1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


def blocky2d_matrix(K=10000, u=4, w=8, d=8, band=400, seed=0):
    """Blocky matrix of exact u x w dense tiles (for the 2-D kernel row)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    m, n = K * u, K * w
    rb = np.clip(
        np.arange(K)[:, None] + rng.integers(-band, band, (K, d)), 0, K - 1
    )
    rows = rb.reshape(-1)[:, None] * u + np.arange(u)[None, :]
    rows = np.repeat(rows, w, axis=0).reshape(-1)
    cols = np.repeat(np.arange(K) * w, d)
    cols = (np.repeat(cols, u)[:, None] + np.arange(w)[None, :]).reshape(-1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


def fem_matrix(k=320, seed=5):
    """Scrambled 5-point grid Laplacian — thermal1-like FEM structure
    hidden behind a bad row ordering (auto-RCM recovers it)."""
    import scipy.sparse as sp

    n = k * k
    main = np.full(n, 4.0)
    off = -np.ones(n - 1)
    offk = -np.ones(n - k)
    A = sp.diags([main, off, off, offk, offk], [0, 1, -1, k, -k],
                 format="csc")
    rng = np.random.default_rng(seed)
    p = rng.permutation(n)
    return A[p][:, p].tocsc()


def scattered_matrix():
    """Information-free scatter (thermal1-sized).  Loaded from
    data/scattered.npz (pre-generated: sp.random at this size costs
    minutes of host RNG; the bench must not pay that)."""
    import scipy.sparse as sp

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "scattered.npz")
    if os.path.exists(path):
        return sp.load_npz(path).tocsc()
    return sp.random(82654, 82654, 574458 / 82654**2, random_state=9,
                     format="csc").astype(np.float32)


def stream_gbytes(fmt, which: str) -> int:
    """Per-call HBM bytes of a StreamFormat3's value+metadata streams
    (the traffic the kernel actually re-reads every iteration)."""
    b = sum(int(np.prod(vv.shape)) * 4 for vv in fmt.vals)
    meta = fmt.meta_nat if which == "nat" else fmt.meta_slot
    b += int(meta.size) * 4
    if fmt.has_scan:
        b += int(fmt.gseg.size) * 4 + int(fmt.ends.size) * 4
    xt = fmt.xtile_nat if which == "nat" else fmt.xtile_slot
    b += int(xt.size) * 4
    return b


# ---------------------------------------------------------------------------
# Stage groups (child-process mode).  Each prints a JSON fragment.
# ---------------------------------------------------------------------------


def run_stream_bw(result):
    _device_fields(result)

    @stage(result, "stream_bw", 10)
    def _():
        # 256 MB working set: a 64 MB buffer measured an impossible
        # 2272 GB/s (partially latency/fusion-resident); at this size
        # the probe reads a sane 420-730 GB/s across runs
        result["hbm_stream_gb_s"] = round(
            _stream_probe_bytes_per_s() / 1e9, 1)


def _flagship_state(result, bw, need=("oneshot", "chain")):
    """Build the flagship problem (plan + DP pack + stream formats).
    Cheap enough (~0.2 s host work) that each measurement group repeats
    it in its own process rather than sharing a client."""
    import jax
    import jax.numpy as jnp

    import vbcs_tpu as v
    from vbcs_tpu.ops import pallas_trspmv3 as pk3

    state = {}
    A = blocky_matrix()
    C = v.CSC.from_scipy(A)
    t0 = time.perf_counter()
    Phi = v.pack_stripe(
        C, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8))
    result["plan_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    B = v.vbc1d(C, 8, Phi)
    result["pack_s"] = round(time.perf_counter() - t0, 3)
    state.update(A=A, B=B)
    result["nnz"] = int(A.nnz)
    xy_bytes = 2 * A.shape[0] * 4
    if "oneshot" in need:
        t0 = time.perf_counter()
        fmt_o = pk3.pack_stream3(B, mode="nat")
        result["pack_oneshot_s"] = round(time.perf_counter() - t0, 3)
        jax.block_until_ready(fmt_o.vals)
        state["fmt_o"] = fmt_o
        # one-shot roofline: values + metadata + x + y (the whole
        # per-call HBM stream)
        state["oneshot_bytes"] = stream_gbytes(fmt_o, "nat") + xy_bytes
        result["roofline_gnnz_s"] = round(
            A.nnz / (state["oneshot_bytes"] / bw) / 1e9, 2)
    if "chain" in need:
        t0 = time.perf_counter()
        fmt_c = pk3.pack_stream3(B)
        result["pack_chain_s"] = round(time.perf_counter() - t0, 3)
        jax.block_until_ready(fmt_c.vals)
        state["fmt_c"] = fmt_c
        # chain roofline: the chain format's own values + metadata
        # (each format's streams differ — slot-only matching shrinks
        # the chain meta)
        state["chain_bytes"] = stream_gbytes(fmt_c, "slot")
        result["chain_roofline_gnnz_s"] = round(
            A.nnz / (state["chain_bytes"] / bw) / 1e9, 2)
    state["x"] = jnp.asarray(
        np.random.default_rng(1).standard_normal(A.shape[0]),
        jnp.float32)
    return state


def _device_fields(result):
    import jax

    dev0 = jax.devices()[0]
    result["platform"] = dev0.platform
    result["device_kind"] = getattr(dev0, "device_kind", "?")
    result["hbm_spec_gb_s"] = round(hbm_spec_bytes_per_s(dev0) / 1e9, 1)
    return dev0


def timed_oneshot(fmt, x, nnz, passes=1):
    """Floor-guarded difference-method timing of one ``tr_spmv_oneshot3``
    call (seconds/iter), shared by the flagship and fem groups so the
    timing discipline cannot drift between them.

    Each pass is a median of paired interleaved diffs (utils/timing.py)
    clamped by a plausibility floor — no SpMV path exceeds ~137 Gnnz/s
    (the VMEM-resident chain roofline), and a bursty ambient window
    once produced a "787 Gnnz/s" diff artifact — with retries at longer
    chains.  ``passes > 1`` takes the best plausible pass (the roofline
    claim is about what the kernel CAN sustain)."""
    import jax

    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.utils.timing import periter

    def mk(n):
        def f(fmt_, x0, nn):
            def body(i, xc):
                return pk3.tr_spmv_oneshot3(fmt_, xc, 0.999)

            return jax.lax.fori_loop(0, nn, body, x0)[0]

        g = jax.jit(f)
        return lambda: g(fmt, x, n)

    floor = nnz / 160e9

    def pass_once():
        t = periter(mk, 20, 220, reps=6)
        tries = 0
        while t < floor and tries < 3:
            t = periter(mk, 20, 400, reps=6)
            tries += 1
        return t if t >= floor else float("inf")

    t = min(pass_once() for _ in range(passes))
    if not np.isfinite(t):
        raise RuntimeError("oneshot timing below plausibility floor "
                           "in all retries (drift artifact)")
    return t


def _stream_probe_bytes_per_s(reps=3):
    """The elementwise STREAM rate, measured RIGHT NOW (same code as
    the stream_bw group, smaller reps).  Clamped by the spec sheet:
    a paired-diff burst once read 922 GB/s on an 819 GB/s part — a
    probe above spec is physically impossible and would deflate every
    ratio that divides by it — so implausible readings retry at longer
    chains and finally clamp to spec."""
    import jax
    import jax.numpy as jnp

    from vbcs_tpu.utils.timing import periter

    spec = hbm_spec_bytes_per_s(jax.devices()[0])
    nwords = 64 << 20
    xs = jnp.ones((nwords,), jnp.float32)

    def mk(n):
        def f(x0, nn):
            def body(i, xc):
                return xc + jnp.float32(1.0)

            return jax.lax.fori_loop(0, nn, body, x0)[0]

        g = jax.jit(f)
        return lambda: g(xs, n)

    bw = 2 * nwords * 4 / periter(mk, 3, 13, reps=reps)
    tries = 0
    while bw > spec * 1.02 and tries < 3:
        bw = 2 * nwords * 4 / periter(mk, 3, 23, reps=reps)
        tries += 1
    return min(bw, spec)


def run_oneshot(result):
    bw, _ = roofline_bw(_device_fields(result))

    @stage(result, "oneshot", 70)
    def _():
        state = _flagship_state(result, bw, need=("oneshot",))
        A, x = state["A"], state["x"]
        # the roofline ratio divides by a STREAM rate measured in the
        # SAME ambient-load window as the kernel: the parent's probe
        # runs minutes earlier, and on the shared chip the numerator
        # and denominator otherwise sample different load (observed
        # vs_baseline 0.76-1.00 across runs from that skew alone)
        try:
            bw_now = _stream_probe_bytes_per_s()
            result["oneshot_stream_gb_s"] = round(bw_now / 1e9, 1)
        except Exception:
            bw_now = bw
        t = timed_oneshot(state["fmt_o"], x, A.nnz, passes=2)
        gnnz = A.nnz / t / 1e9
        result["value"] = round(gnnz, 2)
        result["t_full_us"] = round(t * 1e6, 2)
        result["t_kernel_us"] = round(t * 1e6, 2)
        result["vs_baseline"] = round(
            gnnz * 1e9 / (A.nnz / (state["oneshot_bytes"] / bw_now)), 4)
        result["effective_hbm_gb_s"] = round(
            state["oneshot_bytes"] / t / 1e9, 1)


def run_spmm(result):
    import jax
    import jax.numpy as jnp

    from vbcs_tpu.utils.timing import periter

    bw, _ = roofline_bw(_device_fields(result))

    @stage(result, "spmm", 50)
    def _():
        from vbcs_tpu.ops import pallas_spmm4 as pm4

        state = _flagship_state(result, bw, need=("oneshot",))
        A, B = state["A"], state["B"]
        k = 128
        X = jnp.asarray(
            np.random.default_rng(4).standard_normal((A.shape[0], k)),
            jnp.float32)
        fmt4 = pm4.pack_spmm4(B)
        if fmt4 is not None:
            result["spmm_kernel"] = "v4"
            jax.block_until_ready(fmt4.val)

            def mk(n):
                def f(fmt, X0, nn):
                    def body(i, Xc):
                        return (pm4.tr_spmm_pallas4(fmt, Xc)
                                * jnp.float32(0.999))

                    return jax.lax.fori_loop(0, nn, body, X0)[0, 0]

                g = jax.jit(f)
                return lambda: g(fmt4, X, n)
        else:  # degrade to the v3 k-tiled SpMM
            from vbcs_tpu.ops import pallas_spmm3 as pm3

            result["spmm_kernel"] = "v3"
            fmt_o = state["fmt_o"]

            def mk(n):
                def f(fmt, X0, nn):
                    def body(i, Xc):
                        return (pm3.tr_spmm_pallas3(fmt, Xc)
                                * jnp.float32(0.999))

                    return jax.lax.fori_loop(0, nn, body, X0)[0, 0]

                g = jax.jit(f)
                return lambda: g(fmt_o, X, n)

        t = periter(mk, 3, 23, reps=4)
        result["spmm_k128_gnnzk_s"] = round(A.nnz * k / t / 1e9, 1)
        result["spmm_k128_sweep_us"] = round(t * 1e6, 1)
        # roofline: the running kernel's own value stream once + X and
        # Y once per sweep (v4's val is 8-padded blocks; the v3
        # fallback streams the nat-mode format)
        vbytes = (int(np.prod(fmt4.val.shape)) * 4 if fmt4 is not None
                  else stream_gbytes(state["fmt_o"], "nat"))
        bts = vbytes + 2 * A.shape[0] * k * 4
        result["spmm_k128_vs_roofline"] = round(
            (A.nnz * k / t) / (A.nnz * k / (bts / bw)), 3)


def run_chain(result):
    import jax

    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.utils.timing import periter

    bw, _ = roofline_bw(_device_fields(result))

    @stage(result, "chain", 50)
    def _():
        state = _flagship_state(result, bw, need=("chain",))
        A, x = state["A"], state["x"]

        def mk(n):
            g = jax.jit(
                lambda fmt, x0: pk3.tr_spmv_chain3(fmt, x0, n, 0.999)[0])
            return lambda: g(state["fmt_c"], x)

        t = periter(mk, 200, 2000, reps=4)
        result["chain_gnnz_s"] = round(A.nnz / t / 1e9, 2)
        result["chain_iter_us"] = round(t * 1e6, 2)
        # When the chain's whole val+meta stream plus its slot buffers
        # fit in VMEM (~16 MB), Mosaic's pipeliner re-uses the resident
        # blocks across grid iterations and the steady state re-reads
        # ~nothing from HBM — an HBM-stream "roofline" is then not a
        # bound at all (r2/r3 reported chain_vs_roofline > 1 for
        # exactly this reason).  Report the ratio only when the format
        # genuinely streams.
        resident = state["chain_bytes"] + 2 * 8 * 4 * (
            state["fmt_c"].X if hasattr(state["fmt_c"], "X") else 0)
        result["chain_resident_mb"] = round(resident / 2**20, 1)
        if resident > 15 << 20:
            result["chain_vs_roofline"] = round(
                (A.nnz / t) / (A.nnz / (state["chain_bytes"] / bw)), 3)
        else:
            result["chain_vs_roofline"] = None
            result["chain_note"] = (
                "format VMEM-resident: steady-state HBM traffic ~0, "
                "no stream roofline applies")


def run_scattered(result):
    import jax
    import jax.numpy as jnp

    from vbcs_tpu.operator import VBCOperator
    from vbcs_tpu.ops.pallas_scatter import tr_spmv_scatter
    from vbcs_tpu.utils.timing import periter

    @stage(result, "scattered", 60)
    def _():
        Ar = scattered_matrix().astype(np.float32)
        t0 = time.perf_counter()
        op = VBCOperator.from_csc(Ar, W=8)
        fmt_sc = (op._pallas_scatter("tr")
                  if op._pallas_tr_oneshot() is False else None)
        result["scattered_setup_s"] = round(time.perf_counter() - t0, 2)
        xr = jnp.asarray(
            np.random.default_rng(4).standard_normal(Ar.shape[0]),
            jnp.float32)
        if fmt_sc is not None:
            # multipass radix-routed kernel (ops/pallas_scatter): the
            # TPU landing spot where the reference falls back to its
            # CPU CSC baseline at 0.81 Gnnz/s (src/ref.out:120)
            result["scattered_kernel"] = "routed_scatter"
            jax.block_until_ready(fmt_sc.val2d)

            def mk(n):
                def f(fmt, x0, nn):
                    def body(i, xc):
                        return tr_spmv_scatter(fmt, xc) * jnp.float32(0.999)

                    return jax.lax.fori_loop(0, nn, body, x0)[0]

                g = jax.jit(f)
                return lambda: g(fmt_sc, xr, n)
        else:  # degrade to the v2 stream kernel
            from vbcs_tpu.ops.pallas_trspmv2 import tr_spmv_pallas2

            result["scattered_kernel"] = "v2"
            fmt2 = op._pallas_tr()
            jax.block_until_ready(fmt2.classes)

            def mk(n):
                def f(fmt, x0, nn):
                    def body(i, xc):
                        return tr_spmv_pallas2(fmt, xc) * jnp.float32(0.999)

                    return jax.lax.fori_loop(0, nn, body, x0)[0]

                g = jax.jit(f)
                return lambda: g(fmt2, xr, n)

        # wide endpoint span: at ~340 us/call the n_hi - n_lo = 96
        # calls put the measured difference (~33 ms) well above the
        # tunnel's ms-scale jitter (a 20-call span measured 0.56-1.7
        # Gnnz/s across runs purely from ambient noise)
        t = periter(mk, 4, 100, reps=4)
        result["scattered_gnnz_s"] = round(Ar.nnz / t / 1e9, 3)


def run_vbc2d(result):
    import jax
    import jax.numpy as jnp

    import vbcs_tpu as v
    from vbcs_tpu.ops import pallas_trspmv2d as pk2d
    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.plan.alternating import AlternatingPacker
    from vbcs_tpu.plan.chunkers import EquiChunker
    from vbcs_tpu.utils.timing import periter

    @stage(result, "vbc2d", 50)
    def _():
        A2 = blocky2d_matrix()
        B2 = v.vbc2d(v.CSC.from_scipy(A2), 4, 8,
                     AlternatingPacker(EquiChunker(8), EquiChunker(4)))
        x2 = jnp.asarray(
            np.random.default_rng(2).standard_normal(A2.shape[0]),
            jnp.float32)
        # the 2-D operator's per-call path, via the same routing helper
        # VBC2DOperator.tr_mul mirrors (v3-on-1-D-view only with a
        # single-pass exit; multipass exits lose to the dedicated
        # kernel, measured 5.96 vs 17.9 Gnnz/s on this matrix)
        from vbcs_tpu.operator import route_tr_spmv_2d

        kname2d, _fmt_routed, _call_routed = route_tr_spmv_2d(B2)
        fmt3_2d = _fmt_routed if kname2d == "v3_oneshot" else None
        result["trspmv2d_kernel"] = kname2d
        if fmt3_2d is not None:
            jax.block_until_ready(fmt3_2d.vals)

            def mk3(n):
                def f(fmt, x0, nn):
                    def body(i, acc):
                        yv = pk3.tr_spmv_oneshot3(
                            fmt, x0 * (1.0 + acc * 1e-30))
                        return acc + yv[0] * 1e-30

                    return jax.lax.fori_loop(0, nn, body, jnp.float32(1.0))

                g = jax.jit(f)
                return lambda: g(fmt3_2d, x2, n)

            t = periter(mk3, 20, 220, reps=6)
            result["trspmv2d_gnnz_s"] = round(A2.nnz / t / 1e9, 2)

        bundle = (_fmt_routed if kname2d == "2d"
                  else pk2d.pack_stream_vbc2d(B2))

        def mk(n):
            def f(bundle, x0, nn):
                def body(i, acc):
                    return pk2d.tr_spmv_pallas_2d(
                        bundle, x0 * (1.0 + acc * 1e-30))[0]

                return jax.lax.fori_loop(0, nn, body, jnp.float32(1.0))

            g = jax.jit(f)
            return lambda: g(bundle, x2, n)

        t = periter(mk, 20, 220, reps=6)
        result["trspmv2d_dedicated_gnnz_s"] = round(A2.nnz / t / 1e9, 2)
        if fmt3_2d is None:
            result["trspmv2d_gnnz_s"] = result["trspmv2d_dedicated_gnnz_s"]


def run_fem(result):
    import jax
    import jax.numpy as jnp

    from vbcs_tpu.operator import VBCOperator
    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from vbcs_tpu.utils.timing import periter

    bw, _ = roofline_bw(jax.devices()[0])

    @stage(result, "fem", 60)
    def _():
        Af = fem_matrix().astype(np.float32)
        t0 = time.perf_counter()
        op = VBCOperator.from_csc(Af, W=8)
        fmt_o = op._pallas_tr_oneshot()
        result["fem_setup_s"] = round(time.perf_counter() - t0, 2)
        result["fem_rcm_applied"] = op.row_perm is not None
        xf = jnp.asarray(
            np.random.default_rng(3).standard_normal(Af.shape[0]),
            jnp.float32)
        if fmt_o is not False:
            jax.block_until_ready(fmt_o.vals)
            t = timed_oneshot(fmt_o, xf, Af.nnz)  # shared floor guard
            result["fem_oneshot_gnnz_s"] = round(Af.nnz / t / 1e9, 2)
            fo_bytes = stream_gbytes(fmt_o, "nat") + 2 * Af.shape[0] * 4
            result["fem_oneshot_vs_roofline"] = round(
                (Af.nnz / t) / (Af.nnz / (fo_bytes / bw)), 3)
        # pack-time variance over 3 reps (round-4 verdict item 9: the
        # builder capture once saw 11.2 s vs 1.2 s for this pack; the
        # matcher is deterministic — rotated restarts, no RNG — so the
        # spread is ambient host load, and the bench now reports it)
        from vbcs_tpu.ops.pallas_trspmv3 import pack_stream3

        reps = []
        fmt_c = None
        for _ in range(3):
            t0 = time.perf_counter()
            fmt_c = pack_stream3(op.host_tr)
            reps.append(round(time.perf_counter() - t0, 2))
        if fmt_c is None:
            fmt_c = False
        result["fem_pack_chain_s"] = reps[-1]
        result["fem_pack_chain_s_reps"] = reps
        if fmt_c is not False and remaining() > 45:
            jax.block_until_ready(fmt_c.vals)

            def mkc(n):
                g = jax.jit(
                    lambda fmt, x0: pk3.tr_spmv_chain3(fmt, x0, n, 0.999)[0])
                return lambda: g(fmt_c, xf)

            t = periter(mkc, 200, 2000, reps=3)
            result["fem_chain_gnnz_s"] = round(Af.nnz / t / 1e9, 2)
            fem_bytes = stream_gbytes(fmt_c, "slot")
            fem_resident = fem_bytes + 2 * 8 * 4 * fmt_c.X
            if fem_resident > 15 << 20:
                result["fem_chain_vs_roofline"] = round(
                    (Af.nnz / t) / (Af.nnz / (fem_bytes / bw)), 3)
            else:  # same residency caveat as the flagship chain
                result["fem_chain_resident_mb"] = round(
                    fem_resident / 2**20, 1)


GROUP_FNS = {
    "stream_bw": run_stream_bw,
    "oneshot": run_oneshot,
    "spmm": run_spmm,
    "chain": run_chain,
    "scattered": run_scattered,
    "vbc2d": run_vbc2d,
    "fem": run_fem,
}


def child_main(group: str) -> None:
    result = {}
    GROUP_FNS[group](result)
    print("FRAGMENT:" + json.dumps(result), flush=True)


# ---------------------------------------------------------------------------
# Parent orchestrator
# ---------------------------------------------------------------------------


def run_group_subprocess(name: str, cap_s: float, env: dict):
    """Run one group in a fresh subprocess; return (fragment, err)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", name]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=cap_s, env=env)
    except subprocess.TimeoutExpired as e:
        # surface the child's partial logs — the whole point of the
        # isolation is diagnosing which stage wedged
        for buf in (e.stdout, e.stderr):
            if buf:
                text = (buf.decode(errors="replace")
                        if isinstance(buf, bytes) else buf)
                for line in text.splitlines()[-20:]:
                    print(f"  [{name}|killed] {line}", file=sys.stderr,
                          flush=True)
        return None, f"timeout after {cap_s:.0f}s"
    for line in proc.stderr.splitlines():
        print(f"  [{name}] {line}", file=sys.stderr, flush=True)
    frag = None
    for line in proc.stdout.splitlines():
        if line.startswith("FRAGMENT:"):
            try:
                frag = json.loads(line[len("FRAGMENT:"):])
            except json.JSONDecodeError:
                pass
    if frag is None:
        return None, f"rc={proc.returncode}, no fragment"
    if proc.returncode != 0:
        return frag, f"rc={proc.returncode}"
    return frag, None


def main():
    # The parent never initializes a JAX client (a wedged client in
    # the parent would defeat the isolation design); platform /
    # device_kind / spec fields come from the children's fragments.
    result = {
        "metric": "1dvbc_trspmv_oneshot_nnz_per_s",
        "value": None,
        "unit": "Gnnz/s",
        "vs_baseline": None,
        "budget_s": BUDGET_S,
        "isolation": "subprocess-per-group, 1 retry",
    }
    group_errors = {}
    measured_bw = None

    def merge(frag):
        for k, val in frag.items():
            if k == "skipped":
                result.setdefault("skipped", []).extend(val)
            elif k == "errors":
                result.setdefault("errors", {}).update(val)
            else:
                result[k] = val

    for name, cap, min_budget in GROUPS:
        last_frag = last_err = None
        ok = False
        for attempt in (1, 2):
            if remaining() < min_budget:
                log(f"SKIP group {name}: {remaining():.0f}s left"
                    f" < {min_budget}s")
                result.setdefault("skipped", []).append(name)
                break
            cap_eff = min(cap, max(10.0, remaining() - 5.0))
            log(f"group {name} attempt {attempt}"
                f" (cap {cap_eff:.0f}s, left {remaining():.0f}s)")
            env = dict(os.environ)
            # the child's internal budget is generous (+30 s over the
            # subprocess timeout, which is what actually enforces the
            # wall): the in-child check only orders stage skips within
            # a group, and a tight value made children spend their
            # import time and then self-skip a stage the parent had
            # budget for (stage min == group min on several groups)
            env["VBCS_BENCH_BUDGET_S"] = str(cap_eff + 30.0)
            if measured_bw is not None:
                env["VBCS_MEASURED_BW_GB_S"] = str(measured_bw)
            frag, err = run_group_subprocess(name, cap_eff, env)
            if frag is not None and err is None and not frag.get("errors"):
                merge(frag)  # clean attempt: merge only this one
                ok = True
                break
            # keep the best partial fragment seen: a timed-out attempt 2
            # (frag=None) must not discard attempt 1's measurements
            if frag is not None:
                last_frag = frag
            last_err = err
            log(f"group {name} attempt {attempt} failed:"
                f" {err or frag.get('errors')}")
        if not ok and (last_frag is not None or last_err is not None):
            # both attempts failed (or errored internally): keep
            # whatever the last attempt measured, record why
            if last_frag is not None:
                merge(last_frag)
            group_errors[name] = str(
                last_err or (last_frag or {}).get("errors", "?"))
        if name == "stream_bw":
            measured_bw = result.get("hbm_stream_gb_s")

    if group_errors:
        result["group_errors"] = group_errors
    result["roofline_denominator"] = (
        "measured_stream" if measured_bw is not None else "spec")
    result.setdefault("hbm_spec_gb_s", round(HBM_SPEC["v5"] / 1e9, 1))
    if measured_bw is not None:
        result["hbm_gb_s"] = measured_bw
    result["wall_s"] = round(time.perf_counter() - T_START, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        child_main(sys.argv[2])
    else:
        main()
