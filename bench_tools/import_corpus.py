"""One-off importer: parse the reference test corpus (6 embedded
SuiteSparse matrices, reference ``test/matrices.jl`` — public matrix
*data*, generated from MatrixDepot by ``test/makematrices.jl``) into
``data/corpus.npz`` so our tests need neither network nor the reference
checkout at runtime.

Run once:  python bench_tools/import_corpus.py
"""

import re

import numpy as np
import scipy.sparse as sp

SRC = "/root/reference/test/matrices.jl"
DST = "data/corpus.npz"


def parse():
    text = open(SRC).read()
    out = {}
    # Entries look like:  "name" => sparse([I], [J], [V], m, n),
    # optionally wrapped:  "name" => Symmetric(sparse(...), Symbol("L")),
    pat = re.compile(
        r'"([^"]+)"\s*=>\s*(Symmetric\()?sparse\(\[([^\]]*)\],\s*\[([^\]]*)\],\s*'
        r"(\w*)\[([^\]]*)\],\s*(\d+),\s*(\d+)\)(?:,\s*Symbol\(\"([UL])\"\)\))?",
        re.S,
    )
    for mobj in pat.finditer(text):
        name, sym, I, J, vtype, V, m, n, uplo = mobj.groups()
        I = np.fromstring(I, sep=",", dtype=np.int64) - 1  # 1-based -> 0-based
        J = np.fromstring(J, sep=",", dtype=np.int64) - 1
        dtype = {"Bool": np.bool_, "Int32": np.int32, "": np.float64}.get(
            vtype, np.float64
        )
        V = np.fromstring(V, sep=",", dtype=np.float64).astype(dtype)
        m, n = int(m), int(n)
        A = sp.coo_matrix((V, (I, J)), shape=(m, n)).tocsc()
        if sym:
            # Symmetric(S, uplo): matrix is the uplo triangle mirrored.
            T = (sp.triu(A) if uplo == "U" else sp.tril(A)).astype(np.float64)
            D = sp.diags(T.diagonal())
            A = (T + T.T - D).tocsc().astype(dtype)
        A.sort_indices()
        out[name] = A
        print(f"{name}: {A.shape} nnz={A.nnz} sym={bool(sym)}")
    return out


if __name__ == "__main__":
    mats = parse()
    assert len(mats) == 6, f"expected 6 matrices, got {len(mats)}"
    payload = {}
    for name, A in mats.items():
        key = name.replace("/", "__")
        payload[f"{key}__indptr"] = A.indptr
        payload[f"{key}__indices"] = A.indices
        payload[f"{key}__data"] = A.data
        payload[f"{key}__shape"] = np.array(A.shape)
    np.savez_compressed(DST, **payload)
    print(f"wrote {DST}")
