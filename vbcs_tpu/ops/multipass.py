"""Multipass radix-routed permutation: ANY static gather/permutation
as a short sequence of windowed Clos passes.

``windowed_gather.pack_clos`` routes a map in ONE Pallas pass only
when every 1024-element output segment draws from <= 7 aligned
1024-element source tiles.  Scattered maps (random permutations, the
entry gather of an unstructured sparse matrix) touch hundreds of
tiles per segment and fail that bound — and the XLA gather fallback
runs at ~0.6 GB/s on this backend.

This module factors an arbitrary map into passes that EACH satisfy
the locality bound, using the classic LSD radix-sort decomposition:

* pass 0 gathers from the source in SOURCE-SORTED order (a monotone
  map with duplicates: 1024 consecutive outputs cover <= 1024 distinct
  source elements, so <= 2-3 tiles — always routable);
* the remaining job is a pure permutation ``out[i] = z[q[i]]`` of N
  elements.  Write each element's destination tile ``d = dest // 1024``
  in base R: a stable counting sort by one digit moves every element
  to an output position whose input span is ~1024*R (uniform digits)
  — i.e. <= R + 1 source tiles per output segment.  ``ceil(log_R
  ntiles)`` passes sort all digits; the last (most-significant) pass
  orders by exact destination instead of stably, placing every element
  at its final position while keeping the same locality bound.

With R = 6 a 1M-element scatter routes in 1 + 3 passes, each a
conflict-free 3-take Clos apply at near-HBM rate — the primitive
behind the unstructured-matrix TrSpMV (``ops/pallas_scatter``), and
a general replacement for any exit/entry map the single-pass router
refuses.  (Reference context: the CSC TrSpMV baseline this enables,
``/root/reference/src/TrSpMV.jl:1-20``, runs at 0.81 Gnnz/s on the
reference CPU — the bar the scattered regime must beat.)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np

from . import windowed_gather as wg

__all__ = ["MultipassPlan", "pack_multipass", "apply_multipass"]

MAX_W = 7  # window budget per pass (pack_clos escalated cap)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["meta", "xtile", "valid"],
    meta_fields=["wblk", "num_chunks", "src_len", "n_out", "n_pass"],
)
@dataclasses.dataclass(frozen=True)
class GroupedClos:
    """A stack of same-shape flat Clos passes, applied via ONE
    ``lax.scan`` — the whole radix chain lowers to a single Mosaic
    kernel (measured: 7 separate pass kernels cost ~9 min of compile
    through the tunnel; the scanned chain compiles once)."""
    wblk: int
    num_chunks: int
    src_len: int
    n_out: int
    n_pass: int
    meta: jax.Array  # [P, wblk, 8, T*1024]
    xtile: jax.Array  # [P, T*NV*wblk]
    valid: jax.Array  # [P, 8, T*1024]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pre", "grouped", "post"],
    meta_fields=["n_out", "src_len", "layout", "n_pass"],
)
@dataclasses.dataclass(frozen=True)
class MultipassPlan:
    n_out: int
    src_len: int
    layout: str  # of the final pass: "flat" or "2d"
    n_pass: int  # total passes (for introspection/cost accounting)
    pre: tuple  # ClosPlans applied first (the monotone dup-gather)
    grouped: object  # GroupedClos (the radix chain) or None
    post: tuple  # ClosPlans applied last (the exact-placement pass)


def _radix_passes(q: np.ndarray, R: int, span: int):
    """Factor the permutation ``out[i] = z[q[i]]`` into counting-sort
    passes, given that z is ALREADY grouped by destination
    super-bucket (``span`` consecutive destination tiles — the gather
    pass sorts by (bucket, src) for free, so only ``ceil(log_R span)``
    digit passes remain).  Each pass's sort key is the composite
    (bucket, digit), which keeps buckets contiguous while sorting one
    base-R digit of the bucket-local tile index.  Returns a list of
    gather index arrays (each a permutation of N).

    Intermediate passes shuffle output positions WITHIN each 1024
    tile: a strictly stable counting sort produces R-strided maps
    whose in-window Clos routing thrashes (measured: unroutable at 6
    tiles/segment), while the shuffled variant routes at wblk 6.  The
    shuffle costs nothing — only tile membership matters until the
    final pass — and perturbs each element's position by < 1024, so
    the per-pass locality bound (span <= ~1024*R per segment, i.e.
    <= R + 2 source tiles) survives the lost stability."""
    N = q.size
    ndig = 0
    while R ** ndig < span:
        ndig += 1
    ndig = max(ndig, 1)
    dest = np.empty(N, dtype=np.int64)
    dest[q] = np.arange(N)  # element e of z ends at output position dest[e]
    dtile = dest >> 10
    bucket = dtile // span
    lt = dtile % span
    elems = np.arange(N)  # elems[p] = element at position p
    rng = np.random.default_rng(0xC105)
    passes = []
    for dig in range(ndig - 1):
        key = bucket[elems] * R + (lt[elems] // R ** dig) % R
        srt = np.argsort(key, kind="stable")
        sh = np.arange(N)
        for t0 in range(0, N, 1024):
            t1 = min(t0 + 1024, N)
            sh[t0:t1] = t0 + rng.permutation(t1 - t0)
        srt = srt[sh]
        passes.append(srt.astype(np.int64))  # out[p] = in[srt[p]]
        elems = elems[srt]
    pos = np.empty(N, dtype=np.int64)
    pos[elems] = np.arange(N)
    passes.append(pos[q])  # exact final placement
    return passes


def pack_multipass(g: np.ndarray, src_len: int, mask=None,
                   layout: str = "flat", radixes=(4, 3, 2)):
    """Plan ``out[i] = src[g[i]]`` (any index map, duplicates fine) as
    1 + ceil(log_R ntiles) windowed Clos passes.  ``mask`` marks output
    positions to produce (others zero).  ``layout="2d"`` makes the
    final pass emit the (8, T*1024) interleaved buffer of
    ``pack_permute2d``.  Returns None only if no radix routes —
    which the construction makes effectively impossible for R = 2."""
    g = np.asarray(g, dtype=np.int64)
    N = g.size
    if mask is not None:
        g = np.where(np.asarray(mask, dtype=bool), g, 0)

    # try the single-pass router first: strictly cheaper when it works
    single = wg.pack_clos(g, src_len, max_w=MAX_W, mask=mask,
                          layout=layout, device=False)
    if single is not None:
        return jax.device_put(MultipassPlan(
            n_out=int(N), src_len=int(src_len),
            layout=layout, n_pass=1,
            pre=(single,), grouped=None, post=()))

    # pass 0: dup-gather sorted by (destination super-bucket, src).
    # The gather's output order is FREE, so it absorbs the leading
    # radix digits: with B buckets of `span` consecutive destination
    # tiles, only ceil(log_R span) digit passes remain.  B is bounded
    # by pass-0's own window budget — a segment of 1024 bucket-sorted
    # outputs draws from a ~(1024 * B / multiplicity)-element source
    # range, so B <= (MAX_W - 3) * N / (1024 * src_tiles).
    ntile = -(-N // 1024)
    src_tiles = max(1, -(-src_len // 1024))
    B_max = max(1, ((MAX_W - 3) * N) // (1024 * src_tiles))

    for R in radixes:
        span = 1
        while -(-ntile // span) > B_max:
            span *= R
        bucket_of_i = (np.arange(N) >> 10) // span
        order = np.lexsort((g, bucket_of_i))
        p0 = wg.pack_clos(g[order], src_len, max_w=MAX_W, device=False)
        if p0 is None:
            # conservative fallback: no buckets (span = all tiles)
            span = 1
            while span < ntile:
                span *= R
            order = np.argsort(g, kind="stable")
            p0 = wg.pack_clos(g[order], src_len, max_w=MAX_W,
                              device=False)
            if p0 is None:
                return None
        q = np.empty(N, dtype=np.int64)
        q[order] = np.arange(N)  # out[i] = z1[q[i]]
        idx_passes = _radix_passes(q, R, span)
        plans = []
        ok = True
        for i, pidx in enumerate(idx_passes):
            last = i == len(idx_passes) - 1
            plan = wg.pack_clos(
                pidx, N, max_w=MAX_W,
                mask=(mask if last else None),
                layout=(layout if last else "flat"),
                device=False,
            )
            if plan is None:
                ok = False
                break
            plans.append(plan)
        if ok:
            mid, post = plans[:-1], plans[-1:]
            grouped = None
            if len(mid) >= 2:
                wmax = max(p.wblk for p in mid)
                mid = [wg.pad_plan_windows(p, wmax) if p.wblk < wmax
                       else p for p in mid]
                grouped = GroupedClos(
                    wblk=wmax, num_chunks=mid[0].num_chunks,
                    src_len=int(N), n_out=int(N), n_pass=len(mid),
                    meta=np.stack([np.asarray(p.meta) for p in mid]),
                    xtile=np.stack([np.asarray(p.xtile) for p in mid]),
                    valid=np.stack([np.asarray(p.valid) for p in mid]),
                )
                mid = []
            return jax.device_put(MultipassPlan(
                n_out=int(N), src_len=int(src_len), layout=layout,
                n_pass=1 + len(idx_passes),
                pre=tuple([p0] + mid), grouped=grouped,
                post=tuple(post)))
    return None


def apply_multipass(plan: MultipassPlan, src: jax.Array) -> jax.Array:
    """Apply the planned map on device: ``out[i] = src[g[i]]`` (f32).
    ``layout="flat"`` -> [n_out]; ``layout="2d"`` -> the (8, T*1024)
    buffer with masked cells zero.

    The chain runs in the "tiles" inter-pass layout: each pass stores
    natural (8, 128) windows, which is exactly the window-source
    layout the NEXT pass's gather reads — zero relayout between
    passes, and the radix group is one ``lax.scan`` (one Mosaic
    kernel, one compile)."""
    import jax.numpy as jnp

    z = src.astype(jnp.float32)
    gp = plan.grouped
    z2d = None
    pre = plan.pre
    if gp is not None and pre:
        for p in pre[:-1]:
            z = wg.apply_clos(p, z)
        p0 = pre[-1]  # feed the scan with a 2-D tiles output
        rows = -(-p0.src_len // 1024) * 8 + 8 * max(wg.MAX_WBLK, p0.wblk)
        sp = jnp.zeros(rows * 128, jnp.float32).at[: p0.src_len].set(z)
        z2d = wg._apply_clos_arrays(
            p0.xtile, p0.valid, p0.meta, sp.reshape(rows, 128),
            p0.num_chunks, p0.wblk, "tiles", p0.n_out)

        def body(zc, xs):
            meta, xtile, valid = xs
            out = wg._apply_clos_arrays(
                xtile, valid, meta, zc,
                gp.num_chunks, gp.wblk, "tiles", gp.n_out)
            return out, None

        z2d, _ = jax.lax.scan(body, z2d, (gp.meta, gp.xtile, gp.valid))
    else:
        for p in pre:
            z = wg.apply_clos(p, z)
    for p in plan.post:
        if z2d is not None:
            out = wg._apply_clos_arrays(
                p.xtile, p.valid, p.meta, z2d,
                p.num_chunks, p.wblk, p.layout, p.n_out)
            z = (out.reshape(-1)[: p.n_out]
                 if p.layout in ("flat", "tiles") else out)
            z2d = None
        else:
            z = wg.apply_clos(p, z)
    return z if z2d is None else z2d.reshape(-1)[: plan.n_out]
