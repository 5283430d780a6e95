"""Weak-scaling harness for the distributed Pallas TrSpMV.

Per device count N (1..len(jax.devices())): build a banded blocky matrix
with constant work per device (L0 stripes each), shard the stream at
carry-free chunk boundaries, and time one distributed TrSpMV with (a)
replicated x and (b) the tile-halo all-to-all path.  Reports Gnnz/s and
weak-scaling efficiency vs N=1 (BASELINE.json target: >= 0.75 at N>=2).

On this machine only one real TPU chip is reachable, so hardware runs
cover N=1; the N>1 rows exercise the same code on a virtual CPU mesh
(`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`)
where times are *not* meaningful — the harness is written for a pod.

Because N>1 wall times cannot be measured here, the harness ALSO emits
an ANALYTIC weak-scaling model per device count, built entirely from
quantities this environment does measure: per-device compute time =
(nnz/N) / single-chip rate (the measured N=1 row on TPU, or --rate),
and halo time = per-device halo bytes (exact, from the static halo
plan) / --ici-gbs.  Modeled efficiency is reported for the sequential
halo path (compute + comm) and the overlapped path (max(compute,
comm) — `plan_overlap` lets XLA hide the exchange behind local-window
chunks).  The ICI figure is an assumption, stated in the output, not a
measurement.

Usage: python bench_tools/weak_scaling.py [--l0 10000] [--w 8]
       [--rate GNNZ_S] [--ici-gbs 90]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l0", type=int, default=10000, help="stripes per device")
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--d", type=int, default=8, help="blocks per stripe")
    ap.add_argument("--band", type=int, default=400)
    ap.add_argument("--rate", type=float, default=None,
                    help="single-chip Gnnz/s for the analytic model "
                         "(default: the measured N=1 row on TPU, else "
                         "the archived flagship 104)")
    ap.add_argument("--ici-gbs", type=float, default=90.0,
                    help="assumed per-device ICI bandwidth, GB/s "
                         "(v5e-class; an assumption, not a measurement)")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var; force through config
        # (same workaround as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import vbcs_tpu as v
    from bench import blocky_matrix
    from vbcs_tpu.ops import pallas_trspmv2 as pk2
    from vbcs_tpu.parallel import pallas_spmv as dps
    from vbcs_tpu.utils.timing import periter
    from jax.sharding import Mesh

    if jax.devices()[0].platform != "tpu":
        # virtual CPU mesh: run the kernels in interpret mode (times
        # exercise the code path, not the hardware — see module doc)
        from jax.experimental import pallas as pl

        from vbcs_tpu.ops import windowed_gather as wg

        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            k.pop("compiler_params", None)
            return orig(*a, **k)

        pk2.pl.pallas_call = patched
        wg.pl.pallas_call = patched

    ndev_all = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_all]
    base_rate = {}
    rows_json = []
    print(f"{'N':>3s} {'path':12s} {'nnz':>10s} {'t_us':>8s} "
          f"{'gnnz_s':>8s} {'halo_KiB':>9s} {'eff':>5s}")
    for ndev in counts:
        A = blocky_matrix(L=args.l0 * ndev, w=args.w, d=args.d, band=args.band)
        B = v.vbc1d(v.CSC.from_scipy(A), args.w, v.EquiChunker(args.w))
        fmt = pk2.pack_stream2(B)
        assert fmt.fallback is None
        sfmt0 = dps.shard_stream(fmt, ndev)
        halo = dps.plan_halo(sfmt0)
        mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("d",))
        sfmt = dps.place(sfmt0, mesh)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(A.shape[0]), jnp.float32
        )
        sfmt_ov0, k_locals = dps.plan_overlap(sfmt0)
        halo_ov = dps.plan_halo(sfmt_ov0)
        sfmt_ov = dps.place(sfmt_ov0, mesh)
        for path, fn in (
            ("replicated", lambda xx: dps.dist_tr_spmv_pallas(sfmt, xx, mesh)),
            (
                "tile-halo",
                lambda xx: dps.dist_tr_spmv_pallas_halo(sfmt, halo, xx, mesh),
            ),
            (
                "halo-overlap",
                lambda xx: dps.dist_tr_spmv_pallas_halo_overlap(
                    sfmt_ov, halo_ov, k_locals, xx, mesh),
            ),
        ):
            def mk(n_, fn=fn):
                def f(x0):
                    def body(i, xc):
                        return fn(xc)[: x0.shape[0]] * jnp.float32(0.999)

                    return jax.lax.fori_loop(0, n_, body, x0)[0]

                g = jax.jit(f)
                return lambda: g(x)

            t = max(periter(mk, 10, 110, reps=6), 1e-9)
            rate = A.nnz / t
            key = path
            if ndev == 1:
                base_rate[key] = rate
            eff = rate / (base_rate[key] * ndev) if key in base_rate else float("nan")
            halo_kib = (ndev - 1) * halo.hmax * 4096 / 1024 if ndev > 1 else 0
            print(
                f"{ndev:3d} {path:12s} {A.nnz:10d} {t*1e6:8.1f} "
                f"{rate/1e9:8.2f} {halo_kib:9.0f} {eff:5.2f}"
            )
            rows_json.append(dict(
                ndev=ndev, path=path, nnz=int(A.nnz),
                t_us=round(t * 1e6, 1), gnnz_s=round(rate / 1e9, 3),
                halo_kib=round(halo_kib, 1),
                efficiency=round(eff, 3) if eff == eff else None,
                platform=jax.devices()[0].platform,
            ))

    # ---- analytic model (the honest N>1 story on a 1-chip box) ----------
    rate0 = args.rate
    if rate0 is None:
        tpu_n1 = [r for r in rows_json
                  if r["ndev"] == 1 and r["platform"] == "tpu"
                  and 1.0 <= r["gnnz_s"] <= 250.0]  # drop drift artifacts
        rate0 = tpu_n1[0]["gnnz_s"] if tpu_n1 else 104.0
    ici = args.ici_gbs * 1e9
    model_rows = []
    print(f"\nanalytic model: single-chip rate {rate0:.1f} Gnnz/s "
          f"(measured), ICI {args.ici_gbs:.0f} GB/s (ASSUMED)")
    print(f"{'N':>3s} {'compute_us':>11s} {'halo_us':>8s} "
          f"{'eff_seq':>8s} {'eff_overlap':>11s}")
    for r in rows_json:
        if r["path"] != "tile-halo":
            continue
        ndev = r["ndev"]
        nnz_dev = r["nnz"] / ndev
        t_comp = nnz_dev / (rate0 * 1e9)
        t_halo = (r["halo_kib"] * 1024) / ici
        eff_seq = t_comp / (t_comp + t_halo)
        eff_ov = t_comp / max(t_comp, t_halo)
        print(f"{ndev:3d} {t_comp*1e6:11.2f} {t_halo*1e6:8.2f} "
              f"{eff_seq:8.3f} {eff_ov:11.3f}")
        model_rows.append(dict(
            ndev=ndev, compute_us=round(t_comp * 1e6, 2),
            halo_us=round(t_halo * 1e6, 2),
            modeled_eff_sequential=round(eff_seq, 3),
            modeled_eff_overlapped=round(eff_ov, 3),
        ))

    import json

    print(json.dumps({
        "weak_scaling": rows_json,
        "analytic_model": dict(
            single_chip_gnnz_s=rate0,
            ici_gb_s_assumed=args.ici_gbs,
            rows=model_rows,
        ),
    }))


if __name__ == "__main__":
    main()
