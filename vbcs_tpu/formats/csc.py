"""Host-side CSC container — the ingest format.

Mirrors the role of Julia's ``SparseMatrixCSC`` in the reference (the input
type of every constructor, ``src/constructors_1DVBC.jl:4``): column pointers
``pos`` (length n+1), row indices ``idx`` (sorted within each column), and
values ``val``.  0-based.  Interops with ``scipy.sparse``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.dtypes import acc_dtype

__all__ = ["CSC"]


@dataclasses.dataclass(frozen=True)
class CSC:
    m: int
    n: int
    pos: np.ndarray  # [n + 1] int64, column pointers
    idx: np.ndarray  # [nnz] int64, row indices (sorted per column)
    val: np.ndarray  # [nnz] values

    def __post_init__(self):
        object.__setattr__(self, "pos", np.asarray(self.pos, dtype=np.int64))
        object.__setattr__(self, "idx", np.asarray(self.idx, dtype=np.int64))
        object.__setattr__(self, "val", np.asarray(self.val))
        if self.pos.size != self.n + 1:
            raise ValueError("pos must have length n + 1")
        if self.idx.size != self.val.size:
            raise ValueError("idx and val must have equal length")

    @property
    def nnz(self) -> int:
        return int(self.idx.size)

    @property
    def dtype(self):
        return self.val.dtype

    @property
    def shape(self) -> tuple[int, int]:
        return (self.m, self.n)

    # ---- interop -----------------------------------------------------------

    @staticmethod
    def from_scipy(A) -> "CSC":
        import scipy.sparse as sp

        A = sp.csc_matrix(A)
        A.sort_indices()
        A.sum_duplicates()
        return CSC(
            m=A.shape[0],
            n=A.shape[1],
            pos=A.indptr.astype(np.int64),
            idx=A.indices.astype(np.int64),
            val=A.data.copy(),
        )

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csc_matrix((self.val, self.idx, self.pos), shape=(self.m, self.n))

    @staticmethod
    def from_coo(m, n, rows, cols, vals, dtype=None) -> "CSC":
        import scipy.sparse as sp

        A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n), dtype=dtype)
        return CSC.from_scipy(A)

    @staticmethod
    def from_dense(D) -> "CSC":
        import scipy.sparse as sp

        return CSC.from_scipy(sp.csc_matrix(np.asarray(D)))

    def to_dense(self) -> np.ndarray:
        D = np.zeros((self.m, self.n), dtype=self.val.dtype)
        for j in range(self.n):
            lo, hi = self.pos[j], self.pos[j + 1]
            D[self.idx[lo:hi], j] = self.val[lo:hi]
        return D

    def transpose(self) -> "CSC":
        """CSR view of A == CSC of A^T."""
        import scipy.sparse as sp

        return CSC.from_scipy(sp.csc_matrix(self.to_scipy().T))

    # ---- column pattern helpers (used by planners) -------------------------

    def col_rows(self, j: int) -> np.ndarray:
        return self.idx[self.pos[j] : self.pos[j + 1]]

    # ---- reference kernels (oracles) ---------------------------------------

    def mul(self, x: np.ndarray) -> np.ndarray:
        """y = A @ x (scalar-accurate oracle)."""
        y = np.zeros(self.m, dtype=acc_dtype(self.val.dtype, x.dtype))
        for j in range(self.n):
            lo, hi = self.pos[j], self.pos[j + 1]
            if x[j] != 0:
                y[self.idx[lo:hi]] += self.val[lo:hi] * x[j]
        return y

    def tr_mul(self, x: np.ndarray) -> np.ndarray:
        """y = A.T @ x — the CSC TrSpMV baseline (reference src/TrSpMV.jl:1-20):
        a row-gather loop ``y[j] = sum_q val[q] * x[idx[q]]`` over columns."""
        out_dtype = acc_dtype(self.val.dtype, x.dtype)
        y = np.empty(self.n, dtype=out_dtype)
        for j in range(self.n):
            lo, hi = self.pos[j], self.pos[j + 1]
            y[j] = np.dot(
                self.val[lo:hi].astype(out_dtype), x[self.idx[lo:hi]].astype(out_dtype)
            )
        return y

    def memory_bytes(self) -> int:
        """Footprint of the CSC arrays (reference bin/test_table.jl:39)."""
        return self.pos.nbytes + self.idx.nbytes + self.val.nbytes
