"""Benchmark: 1D-VBC transposed SpMV (the reference's headline op) on one
TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

* value        — achieved nnz/s (Giga) for DP-quality blocked TrSpMV on a
                 blocky synthetic matrix sized like Boeing/ct20stif
                 (~2.6M nnz; the reference's flagship benchmark matrix,
                 BASELINE.md).
* vs_baseline  — fraction of the HBM-bandwidth roofline
                 (BASELINE.json target: >= 0.8).  Roofline counts the
                 bytes the kernel must move: block values + block
                 metadata + gathered x + y.
* extras       — CSC-baseline nnz/s and the VBC-vs-CSC speedup
                 (reference achieves 1.78-2.18x on blocky matrices).

Matrix generator mirrors the reference autotuner's synthetic family
(``src/costs.jl:63-82``): L stripes of width w, d random block-rows per
stripe.
"""

import json
import time

import numpy as np


def hbm_bandwidth_bytes_per_s(device) -> float:
    """Peak HBM bandwidth by device kind (public spec sheets)."""
    kind = getattr(device, "device_kind", "cpu").lower()
    table = {
        "v6": 1640e9,  # Trillium
        "v5p": 2765e9,
        "v5": 819e9,  # v5e / v5 lite
        "v4": 1228e9,
        "v3": 900e9,
        "v2": 700e9,
    }
    for key, bw in table.items():
        if key in kind:
            return bw
    return 50e9  # conservative CPU figure so local runs still report


def blocky_matrix(L=40000, w=8, d=8, seed=0):
    """Synthetic blocky matrix: n = L*w columns, d w-wide blocks/stripe."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    m = L * w
    rows = rng.integers(0, m, size=(L, d))
    stripe = np.repeat(np.arange(L), d)
    r = rows.reshape(-1)
    # expand each block into w nonzeros
    R = np.repeat(r, w)
    C = (stripe[:, None] * w + np.arange(w)[None, :]).reshape(-1)
    C = np.repeat(C.reshape(L * d, w), 1, axis=0).reshape(-1)
    V = rng.standard_normal(R.size).astype(np.float32)
    A = sp.coo_matrix((V, (R, C)), shape=(m, L * w)).tocsc()
    A.sum_duplicates()
    A.sort_indices()
    return A


def time_fn(fn, *args, iters=50, warmup=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import vbcs_tpu as v
    from vbcs_tpu.formats.device import bin_vbc1d
    from vbcs_tpu.ops import csr as csr_ops
    from vbcs_tpu.ops import xla as ops

    dev0 = jax.devices()[0]
    bw = hbm_bandwidth_bytes_per_s(dev0)
    dtype = np.float32

    A = blocky_matrix()
    nnz = A.nnz
    C = v.CSC.from_scipy(A)

    t_plan = time.perf_counter()
    B = v.vbc1d(C, 8, v.EquiChunker(8))
    plan_pack_s = time.perf_counter() - t_plan
    dev = bin_vbc1d(B, dtype=dtype)

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(A.shape[0]), dtype=dtype
    )

    tr = jax.jit(ops.tr_spmv)
    t_vbc = time_fn(tr, dev, x)

    # CSC baseline (un-blocked reference point, reference src/TrSpMV.jl)
    cdev = csr_ops.CSCDevice.from_host(C, dtype=dtype)
    t_csc = time_fn(jax.jit(csr_ops.csc_tr_spmv), cdev, x)

    # Roofline: bytes the blocked kernel must move.
    bytes_moved = dev.nbytes + x.size * x.dtype.itemsize + A.shape[1] * np.dtype(dtype).itemsize
    roofline_s = bytes_moved / bw
    roofline_nnz_s = nnz / roofline_s

    value = nnz / t_vbc
    result = {
        "metric": "1dvbc_trspmv_nnz_per_s",
        "value": round(value / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(value / roofline_nnz_s, 4),
        "platform": dev0.platform,
        "device_kind": getattr(dev0, "device_kind", "?"),
        "nnz": int(nnz),
        "t_vbc_us": round(t_vbc * 1e6, 1),
        "t_csc_us": round(t_csc * 1e6, 1),
        "speedup_vs_csc": round(t_csc / t_vbc, 3),
        "plan_pack_s": round(plan_pack_s, 3),
        "roofline_gnnz_per_s": round(roofline_nnz_s / 1e9, 3),
        "hbm_gb_per_s": round(bw / 1e9, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
