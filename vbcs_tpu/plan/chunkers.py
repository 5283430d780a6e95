"""Heuristic column chunkers.

Native re-implementation of the ChainPartitioners.jl chunker surface used
by the reference (SURVEY.md §2.9): ``EquiChunker`` (fixed width),
``StrictChunker`` (merge only identical column patterns), and
``OverlapChunker`` (merge columns whose patterns overlap enough).  Each
produces a :class:`~vbcs_tpu.formats.partition.SplitPartition` of the
columns of a CSC matrix via :func:`~vbcs_tpu.plan.alternating.pack_stripe`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..formats.csc import CSC
from ..formats.partition import SplitPartition

__all__ = ["EquiChunker", "StrictChunker", "OverlapChunker"]


@dataclasses.dataclass(frozen=True)
class EquiChunker:
    """Fixed-width stripes (reference ``EquiChunker(w)``; no-arg default
    width 1, as used by ``AlternatePacker`` warm-up passes at
    ``src/constructors_VBC.jl:2-4``)."""

    w: int = 1

    def partition(self, A: CSC) -> SplitPartition:
        return SplitPartition.equi(A.n, self.w)


@dataclasses.dataclass(frozen=True)
class StrictChunker:
    """Merge consecutive columns with *identical* row patterns, up to
    width ``w_max`` (reference ``StrictChunker``; the 1D-VBC converter has
    a zero-fill-free fast path for this planner,
    ``src/constructors_1DVBC.jl:94-143``)."""

    w_max: int

    def partition(self, A: CSC) -> SplitPartition:
        n = A.n
        if n == 0:
            return SplitPartition.whole(0)
        pos, idx = A.pos, A.idx
        lens = np.diff(pos)
        # new_stripe[c] = True if column c cannot merge with column c-1.
        # Vectorized: columns of equal length whose index runs are
        # element-wise equal when column c is compared against column
        # c-1 shifted by len (valid only when lens match).
        new_stripe = np.ones(n, dtype=bool)
        if n > 1:
            same_len = lens[1:] == lens[:-1]
            # element-wise equality of idx[pos[c]:pos[c+1]] with the
            # previous column: idx[q] == idx[q - lens[c]] for q in col c
            shifted_eq = np.zeros(idx.size, dtype=bool)
            if idx.size:
                col_of_nz = np.repeat(np.arange(n), lens)
                shift = lens[col_of_nz]
                q = np.arange(idx.size)
                ok = q - shift >= 0
                shifted_eq[ok] = idx[q[ok]] == idx[q[ok] - shift[ok]]
                # column c matches c-1 iff all its entries match
                mism = np.zeros(n, dtype=np.int64)
                np.add.at(mism, col_of_nz, (~shifted_eq).astype(np.int64))
                all_eq = mism[1:] == 0
                new_stripe[1:] = ~(same_len & all_eq)
            else:
                new_stripe[1:] = ~same_len
        return _runs_to_partition(new_stripe, self.w_max)


@dataclasses.dataclass(frozen=True)
class OverlapChunker:
    """Merge consecutive columns whose row patterns overlap by at least
    ``rho``, up to width ``w_max`` (reference ``OverlapChunker(rho, w)``).

    Semantics (documented here since ChainPartitioners' exact rule is
    external): a column ``c`` joins the current stripe when
    ``|rows(c) & rows(c0)| >= rho * max(|rows(c)|, |rows(c0)|)`` against
    the stripe's leading column ``c0``.  Any such merge rule yields a
    valid partition; SpMV correctness is partition-independent (the
    reference's own tests only check SpMV parity, ``test/runtests.jl``).
    """

    rho: float
    w_max: int

    def partition(self, A: CSC) -> SplitPartition:
        n = A.n
        if n == 0:
            return SplitPartition.whole(0)
        pos, idx = A.pos, A.idx
        try:
            from ..native import overlap_chunk_native

            spl = overlap_chunk_native(n, pos, idx, self.rho, self.w_max)
            if spl is not None:
                return SplitPartition(spl)
        except Exception:
            pass
        splits = [0]
        c0 = 0
        head = idx[pos[0] : pos[1]]
        for c in range(1, n):
            cur = idx[pos[c] : pos[c + 1]]
            width = c - c0
            ok = False
            if width < self.w_max:
                denom = max(cur.size, head.size)
                if denom == 0:
                    ok = True  # two empty columns always merge
                else:
                    inter = np.intersect1d(head, cur, assume_unique=True).size
                    ok = inter >= self.rho * denom
            if not ok:
                splits.append(c)
                c0 = c
                head = cur
        splits.append(n)
        return SplitPartition(np.asarray(splits, dtype=np.int64))


def _runs_to_partition(new_stripe: np.ndarray, w_max: int) -> SplitPartition:
    """Turn per-column break flags into a partition with stripes <= w_max."""
    n = new_stripe.size
    splits = [0]
    width = 1
    for c in range(1, n):
        if new_stripe[c] or width >= w_max:
            splits.append(c)
            width = 1
        else:
            width += 1
    splits.append(n)
    return SplitPartition(np.asarray(splits, dtype=np.int64))
