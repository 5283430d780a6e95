"""Row/column reordering for x-window locality.

The Pallas TrSpMV kernel gathers x through small aligned windows
(ops/pallas_trspmv2.py), so its throughput depends on the *row
bandwidth* of each chunk — a TPU-specific locality cost with no direct
analog in the reference (whose CPU caches absorb scattered access; the
closest analog is the cache-resident working set its autotuner assumes,
``src/costs.jl:44-60``).  These reorderings bound it:

* :func:`rcm_rows` — reverse Cuthill-McKee on the symmetrized graph
  (square matrices), the classical bandwidth reducer;
* :func:`profile_rows` — order rows by mean column position (works for
  rectangular matrices and as an RCM fallback).

Both return ``(A_perm, perm)`` with ``A_perm = A[perm, :]``; for
``y = A.T @ x`` the only change is ``x -> x[perm]`` (the output needs no
un-permutation, since columns are untouched).
"""

from __future__ import annotations

import numpy as np

from ..formats.csc import CSC

__all__ = ["rcm_rows", "profile_rows", "apply_row_perm"]


def apply_row_perm(A: CSC, perm: np.ndarray) -> CSC:
    """A[perm, :] as CSC (rows relabeled by rank of perm)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    import scipy.sparse as sp

    S = A.to_scipy().tocoo()
    return CSC.from_scipy(
        sp.coo_matrix((S.data, (inv[S.row], S.col)), shape=(A.m, A.n))
    )


def rcm_rows(A: CSC):
    """Reverse Cuthill-McKee row ordering (square: on A + A.T)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    S = A.to_scipy()
    if A.m == A.n:
        G = (S + S.T).tocsr()
    else:
        G = (S @ S.T).tocsr()  # row connectivity graph
    perm = np.asarray(reverse_cuthill_mckee(G, symmetric_mode=True))
    return apply_row_perm(A, perm), perm


def profile_rows(A: CSC):
    """Order rows by mean column index of their nonzeros."""
    S = A.to_scipy().tocsr()
    counts = np.maximum(1, np.diff(S.indptr))
    sums = np.add.reduceat(
        S.indices, S.indptr[:-1], dtype=np.float64
    ) * (np.diff(S.indptr) > 0)
    mean = sums / counts
    mean[np.diff(S.indptr) == 0] = np.inf  # empty rows last
    perm = np.argsort(mean, kind="stable")
    return apply_row_perm(A, perm), perm
