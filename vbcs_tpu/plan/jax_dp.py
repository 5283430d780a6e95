"""JAX-jittable DynamicTotalChunker — the split-point DP as a lax.scan.

BASELINE.json asks for "JAX-jittable partition planners"; this is the
faithful port of the NumPy/C++ DP (plan/dynamic.py) to a single
``lax.scan`` over columns with W-bounded inner state:

* the last-occurrence counters live in a dense [n] vector scanned
  column by column (the reference's histogram trick,
  ``constructors_1DVBC.jl:22-30``);
* each scan step updates the counters with one column's rows (padded to
  the max column length) and minimizes over the W candidate widths;
* the backtrack runs as a second scan over the predecessor array.

The NumPy planner remains the bitwise oracle; this version produces the
same split points (same narrowest-stripe tie-break) and exists so a
partition can be planned *inside* a jit trace — e.g. re-planning on
device as matrix structure streams in, without a host round trip.

Static shapes: (n, max column length, W) — pad columns to the max
length with group id ``num_groups`` (an inert slot).
"""

from __future__ import annotations

import numpy as np

from ..formats.csc import CSC
from ..formats.partition import SplitPartition
from ..models.cost import (
    ColumnBlockComponentCostModel,
    component_table,
)

__all__ = [
    "dp_partition_jit",
    "dp_partition_jax",
    "dp_partition_jit_2d",
    "dp_partition_jax_2d",
]


def _padded_columns(A: CSC):
    """Rows per column padded to the max length (pad id = m)."""
    lens = np.diff(A.pos)
    K = int(lens.max(initial=1))
    n = A.n
    cols = np.full((n, K), A.m, dtype=np.int32)
    for j in range(n):  # host prep; O(nnz)
        lo, hi = A.pos[j], A.pos[j + 1]
        cols[j, : hi - lo] = A.idx[lo:hi]
    return cols


def dp_partition_jax(cols, m, W, alpha_tab, beta_tab):
    """Traceable DP core.

    cols: [n, K] int32 padded row ids (pad = m); returns (prev [n+1],
    opt [n+1]) — run :func:`_backtrack` (or host code) on prev.
    """
    import jax
    import jax.numpy as jnp

    n, K = cols.shape
    alpha = jnp.asarray(alpha_tab, jnp.float32)
    beta = jnp.asarray(beta_tab, jnp.float32)
    INF = jnp.float32(np.inf)

    def step(state, col_rows):
        lst, cnt, opt, jp = state  # lst [m+1], cnt [n], opt [n+1]
        c = jp - 1
        # update last-occurrence counters with this column's rows
        old = lst[col_rows]  # [K] (pad rows hit slot m)
        valid = col_rows < m
        # subtract 1 at old positions (only valid rows previously seen)
        dec = jnp.where(valid & (old >= 0), 1.0, 0.0)
        cnt = cnt.at[jnp.maximum(old, 0)].add(-dec, mode="drop")
        # distinct rows of this column (duplicates impossible in CSC)
        inc = jnp.where(valid, 1.0, 0.0).sum()
        cnt = cnt.at[c].add(inc)
        lst = lst.at[jnp.where(valid, col_rows, m)].set(c)

        # candidate widths 1..W (masked beyond jp)
        widths = jnp.arange(1, W + 1)
        js = jp - widths
        ok = js >= 0
        # suffix sums of cnt over the window
        window = jnp.where(
            ok, cnt[jnp.maximum(js, 0)], 0.0
        )
        d = jnp.cumsum(window)
        cand = jnp.where(
            ok,
            opt[jnp.maximum(js, 0)] + alpha[widths - 1] + d * beta[widths - 1],
            INF,
        )
        t = jnp.argmin(cand)  # first min -> narrowest stripe
        opt = opt.at[jp].set(cand[t])
        prev = jp - widths[t]
        return (lst, cnt, opt, jp + 1), prev

    lst0 = jnp.full(m + 1, -1, jnp.int32)
    cnt0 = jnp.zeros(n, jnp.float32)
    opt0 = jnp.full(n + 1, INF).at[0].set(0.0)
    (lst, cnt, opt, _), prevs = jax.lax.scan(
        step, (lst0, cnt0, opt0, jnp.int32(1)), cols
    )
    prev = jnp.concatenate([jnp.zeros(1, prevs.dtype), prevs])
    return prev, opt


def dp_partition_jit(
    A: CSC, model: ColumnBlockComponentCostModel, W: int
) -> SplitPartition:
    """Jit-compiled DP planner; same result as plan/dynamic.py."""
    import jax

    cols = _padded_columns(A)
    alpha = component_table(model.alpha_col, W)
    beta = component_table(model.beta_col, W)
    if np.any(component_table(model.gamma_col, W) != 0):
        raise NotImplementedError(
            "gamma_col (per-8-block-group term) is not supported by the "
            "jittable DP; use DynamicTotalChunker (NumPy/C++ path)"
        )
    prev, _ = jax.jit(
        dp_partition_jax, static_argnums=(1, 2)
    )(cols, A.m, W, alpha, beta)
    prev = np.asarray(prev)
    splits = [A.n]
    j = A.n
    while j > 0:
        j = int(prev[j])
        splits.append(j)
    splits.reverse()
    return SplitPartition(np.asarray(splits, dtype=np.int64))


def _padded_block_columns(A: CSC, asg: np.ndarray, ng: int):
    """Distinct row-*block* ids per column, padded to the max count
    (pad id = ng).  Dedup matters: two rows of one column can share a
    block, and the scan's counter update assumes unique ids per step."""
    n = A.n
    cols_list = []
    K = 1
    for j in range(n):  # host prep; O(nnz log nnz)
        b = np.unique(asg[A.idx[A.pos[j] : A.pos[j + 1]]])
        cols_list.append(b)
        K = max(K, b.size)
    cols = np.full((n, K), ng, dtype=np.int32)
    for j, b in enumerate(cols_list):
        cols[j, : b.size] = b
    return cols


def dp_partition_jax_2d(cols, ng, W, alpha_tab, beta_col_tabs, wblk):
    """Traceable 2-D column-pass DP core (rank-R block model under a
    fixed row partition).

    cols: [n, K] int32 padded distinct row-block ids (pad = ng);
    wblk: [R, ng+1] per-block weights ``beta_row[r](u_k)`` (pad slot 0);
    cost(stripe [j, j')) = alpha_col(w) + sum_r wcount_r * beta_col[r](w)
    where wcount_r sums weights of distinct blocks in the stripe.
    """
    import jax
    import jax.numpy as jnp

    n, K = cols.shape
    R = wblk.shape[0]
    alpha = jnp.asarray(alpha_tab, jnp.float32)
    betas = jnp.asarray(beta_col_tabs, jnp.float32)  # [R, W]
    wtab = jnp.asarray(wblk, jnp.float32)  # [R, ng+1]
    INF = jnp.float32(np.inf)

    def step(state, col_blocks):
        lst, cnt, opt, jp = state  # lst [ng+1], cnt [n, R], opt [n+1]
        c = jp - 1
        old = lst[col_blocks]  # [K]
        valid = col_blocks < ng
        wgt = jnp.where(valid[None, :], wtab[:, col_blocks], 0.0)  # [R, K]
        dec = jnp.where((valid & (old >= 0))[None, :], wgt, 0.0)
        cnt = cnt.at[jnp.maximum(old, 0)].add(-dec.T, mode="drop")
        cnt = cnt.at[c].add(wgt.sum(axis=1))
        lst = lst.at[jnp.where(valid, col_blocks, ng)].set(c)

        widths = jnp.arange(1, W + 1)
        js = jp - widths
        ok = js >= 0
        window = jnp.where(ok[:, None], cnt[jnp.maximum(js, 0)], 0.0)  # [W, R]
        d = jnp.cumsum(window, axis=0)  # suffix-accumulated weights
        blockterm = (d * betas.T[: W]).sum(axis=1)
        cand = jnp.where(
            ok, opt[jnp.maximum(js, 0)] + alpha[widths - 1] + blockterm, INF
        )
        t = jnp.argmin(cand)
        opt = opt.at[jp].set(cand[t])
        prev = jp - widths[t]
        return (lst, cnt, opt, jp + 1), prev

    lst0 = jnp.full(ng + 1, -1, jnp.int32)
    cnt0 = jnp.zeros((n, R), jnp.float32)
    opt0 = jnp.full(n + 1, INF).at[0].set(0.0)
    (lst, cnt, opt, _), prevs = jax.lax.scan(
        step, (lst0, cnt0, opt0, jnp.int32(1)), cols
    )
    prev = jnp.concatenate([jnp.zeros(1, prevs.dtype), prevs])
    return prev, opt


def dp_partition_jit_2d(A: CSC, model, W: int, Pi=None) -> SplitPartition:
    """Jit-compiled 2-D column-pass planner; same partition as the
    NumPy/C++ DP with a :class:`BlockComponentCostModel` under ``Pi``."""
    import jax

    from ..models.cost import component_table

    Pi = Pi if Pi is not None else SplitPartition.trivial(A.m)
    asg = Pi.to_map().asg
    ng = len(Pi)
    heights = Pi.widths()
    cols = _padded_block_columns(A, asg, ng)
    alpha = component_table(model.alpha_col, W)
    betas = np.stack(
        [component_table(c, W) for c in model.beta_col]
    )  # [R, W]
    umax = int(heights.max(initial=1))
    wblk = np.zeros((len(model.beta_row), ng + 1), dtype=np.float64)
    for r, c in enumerate(model.beta_row):
        tab = np.concatenate([[0.0], component_table(c, umax)])
        wblk[r, :ng] = tab[heights]
    prev, _ = jax.jit(dp_partition_jax_2d, static_argnums=(1, 2))(
        cols, ng, W, alpha, betas, wblk
    )
    prev = np.asarray(prev)
    splits = [A.n]
    j = A.n
    while j > 0:
        j = int(prev[j])
        splits.append(j)
    splits.reverse()
    return SplitPartition(np.asarray(splits, dtype=np.int64))
