"""Profile host-side pack costs (VERDICT r2 item 3: the 200-second pack).

Stages timed: plan (DP), vbc1d pack, pack_stream2, pack_stream3
(matcher + Clos router inside), for the flagship blocky matrix and the
FEM (scrambled Laplacian) matrix from bench.py.

Run with JAX_PLATFORMS=cpu — everything here is host NumPy/Python.
"""

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def stage(name, f):
    t0 = time.perf_counter()
    r = f()
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt:8.2f} s", flush=True)
    return r, dt


def main():
    import vbcs_tpu as v
    from vbcs_tpu.ops import pallas_trspmv2 as pk2
    from vbcs_tpu.ops import pallas_trspmv3 as pk3
    from bench import blocky_matrix, fem_matrix

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    profile = "--profile" in sys.argv

    if which in ("all", "flagship"):
        print("=== flagship blocky (2.56M nnz) ===")
        A, _ = stage("gen", blocky_matrix)
        C = v.CSC.from_scipy(A)
        Phi, _ = stage("plan DP", lambda: v.pack_stripe(
            C, v.DynamicTotalChunker(v.model_1dvbc_memory(4, 8), 8)))
        B, _ = stage("vbc1d pack", lambda: v.vbc1d(C, 8, Phi))
        stage("pack_stream2", lambda: pk2.pack_stream2(B))
        if profile:
            pr = cProfile.Profile()
            pr.enable()
            fmt3 = pk3.pack_stream3(B)
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
            print(s.getvalue())
        else:
            fmt3, _ = stage("pack_stream3", lambda: pk3.pack_stream3(B))
        print("fmt3 none?" , fmt3 is None)

    if which in ("all", "fem"):
        print("=== FEM scrambled Laplacian (511k nnz) ===")
        Af, _ = stage("gen", lambda: fem_matrix().astype(np.float32))
        from vbcs_tpu.operator import VBCOperator
        op, _ = stage("from_csc (auto-RCM)",
                      lambda: VBCOperator.from_csc(Af, W=8))
        B = op.host_tr
        if profile:
            pr = cProfile.Profile()
            pr.enable()
            fmt3 = pk3.pack_stream3(B)
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
            print(s.getvalue())
        else:
            fmt3, _ = stage("pack_stream3", lambda: pk3.pack_stream3(B))
        print("fmt3 none?", fmt3 is None,
              "ws:", None if fmt3 is None else fmt3.ws)
        stage("pack_stream2", lambda: pk2.pack_stream2(B))


if __name__ == "__main__":
    main()
