"""Load the test corpus (the reference's 6 embedded SuiteSparse matrices,
imported from data — see bench_tools/import_corpus.py)."""

import os

import numpy as np
import scipy.sparse as sp

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "corpus.npz")

NAMES = [
    "LPnetlib/lpi_itest6",
    "HB/west0132",
    "LPnetlib/lp_etamacro",
    "LPnetlib/lp_blend",
    "Pajek/GD99_c",
    "HB/can_292",
]


def load_corpus() -> dict:
    z = np.load(DATA)
    out = {}
    for name in NAMES:
        key = name.replace("/", "__")
        A = sp.csc_matrix(
            (z[f"{key}__data"], z[f"{key}__indices"], z[f"{key}__indptr"]),
            shape=tuple(z[f"{key}__shape"]),
        )
        A.sort_indices()
        out[name] = A
    return out
