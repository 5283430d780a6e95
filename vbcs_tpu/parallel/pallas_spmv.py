"""Multi-chip Pallas TrSpMV: chunk-sharded stream formats over a Mesh.

The TPU-native distributed hot path (BASELINE.json config 5): the
chunked block streams of :mod:`vbcs_tpu.ops.pallas_trspmv2` are
partitioned *at chunk granularity* across devices — the SPMD analog of
the reference's dynamic stripe scheduling
(``src/multiply_1DVBC.jl:169-177``), but statically balanced.

* Device boundaries are placed only at carry-free chunk boundaries
  (``straddle == 0``), so no partial-stripe state crosses devices.
* ``x`` is replicated (one ICI all-gather per step); each device runs
  the same Pallas kernel over its local grid and emits its own slot
  block — slots are disjoint by construction, so combining is pure
  concatenation (the ``out_specs P('d')`` layout), no psum needed.
* The final slot->natural permutation reads the (logically
  all-gathered) slot vector; XLA inserts the collective.

``shard_stream`` rewrites the slot numbering for the [D, slots/dev]
layout and re-derives the natural-order permutation accordingly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pallas_trspmv as pk1
from ..ops import pallas_trspmv2 as pk2
from ..ops import windowed_gather as wg

__all__ = [
    "ShardedStream",
    "shard_stream",
    "dist_tr_spmv_pallas",
    "HaloPlan",
    "plan_halo",
    "dist_tr_spmv_pallas_halo",
    "plan_overlap",
    "dist_tr_spmv_pallas_halo_overlap",
]

NS, NG = pk2.NS, pk2.NG


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_i", "row_i", "gseg", "ends", "xtile", "nslots", "straddle"],
    meta_fields=["w", "chunks_per_dev", "wblk", "scan_steps", "identity"],
)
@dataclasses.dataclass(frozen=True)
class ShardedClass:
    w: int
    chunks_per_dev: int
    wblk: int
    scan_steps: int
    identity: bool
    val_i: jax.Array  # [D, 8w, Td*NG]
    row_i: jax.Array  # [D, 8, Td*NG]
    gseg: jax.Array  # [D, 1, Td*NG]
    ends: jax.Array  # [D, 1, Td*NS]
    xtile: jax.Array  # [D, Td]
    nslots: jax.Array  # [D, Td]
    straddle: jax.Array  # [D, Td]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_t", "row", "seg_rel", "s_last", "straddle"],
    meta_fields=["w", "cq", "chunks_per_dev"],
)
@dataclasses.dataclass(frozen=True)
class ShardedV1Class:
    """Chunk-sharded v1 (pre-gathered x) fallback class — the path for
    classes whose x-windows exceed the stream kernel's locality budget.
    x is replicated; each device gathers only its own blocks' rows."""

    w: int
    cq: int
    chunks_per_dev: int
    val_t: jax.Array  # [D, w, Td*cq]
    row: jax.Array  # [D, Td*cq]
    seg_rel: jax.Array  # [D, Td*cq, 1]
    s_last: jax.Array  # [D, Td]
    straddle: jax.Array  # [D, Td]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["classes", "fallback", "fb_gather", "y_perm", "y_plan"],
    meta_fields=["m", "n", "ndev", "slots_per_dev"],
)
@dataclasses.dataclass(frozen=True)
class ShardedStream:
    m: int
    n: int
    ndev: int
    slots_per_dev: int
    classes: tuple  # ShardedClass
    fallback: tuple  # ShardedV1Class (empty when all classes are local)
    y_perm: jax.Array  # [n] int32 into the [D * slots_per_dev] layout
    y_plan: object  # PermutePlan or None
    # per fallback class: a [D, ...]-stacked Clos/windowed plan gathering
    # x at the device's own block rows (or None -> XLA gather fallback);
    # same role as StreamFormat2.fb_gather on one chip
    fb_gather: tuple = ()


def _split_ranges(T: int, straddle: np.ndarray, ndev: int, weight=None):
    """Contiguous chunk ranges per device, cut only where the previous
    chunk does not straddle.  ``weight`` (per-chunk cost, e.g. real
    slot counts) balances cumulative COST instead of chunk count —
    the TPU analog of the reference's dynamic stripe scheduler
    (``src/multiply_1DVBC.jl:169-177``) applied at plan time: tail
    chunks are often partially filled, so count-balanced shards leave
    the last device under-loaded."""
    allowed = np.flatnonzero(
        np.concatenate([[1], (straddle[:-1] == 0).astype(np.int64)])
    )
    if weight is None:
        w = np.ones(T, dtype=np.float64)
    else:
        w = np.maximum(np.asarray(weight, dtype=np.float64), 1e-9)
    cum = np.concatenate([[0.0], np.cumsum(w)])
    bounds = [0]
    for d in range(1, ndev):
        target = cum[-1] * d / ndev
        k = int(allowed[np.argmin(np.abs(cum[allowed] - target))])
        k = max(k, bounds[-1])
        bounds.append(k)
    bounds.append(T)
    return [(bounds[d], bounds[d + 1]) for d in range(ndev)]


def shard_stream(fmt: pk2.StreamFormat2, ndev: int) -> ShardedStream:
    """Repartition a StreamFormat2 into the [D, ...] chunk-sharded layout.

    Fallback (non-local) classes shard at their own chunk granularity
    with replicated x — for scattered rows the halo set IS the whole
    vector, so replication is the communication-optimal layout."""
    fb_classes = fmt.fallback.classes if fmt.fallback is not None else ()
    y_perm_old = np.asarray(fmt.y_perm).astype(np.int64)
    classes = []
    # decode old flat slots: per class base and geometry
    old_bases = []
    b = 0
    for c in fmt.classes:
        old_bases.append(b)
        b += c.num_chunks * NS * c.w
    NS1 = pk1.NS  # v1 fallback slot granularity differs from v2's
    fb_bases = []
    for c in fb_classes:
        fb_bases.append(b)
        b += c.num_chunks * NS1 * c.w

    # plan shards per class
    plans = []
    slots_per_dev = 0
    for c in fmt.classes:
        T = c.num_chunks
        ranges = _split_ranges(T, np.asarray(c.straddle), ndev,
                               weight=np.asarray(c.nslots) + 1)
        Td = max(g1 - g0 for g0, g1 in ranges)
        plans.append((ranges, Td))
        slots_per_dev += Td * NS * c.w
    fb_plans = []
    for c in fb_classes:
        T = c.num_chunks
        ranges = _split_ranges(T, np.asarray(c.straddle), ndev)
        Td = max(g1 - g0 for g0, g1 in ranges)
        fb_plans.append((ranges, Td))
        slots_per_dev += Td * NS1 * c.w

    # new flat index of old slot (class ci, chunk g, slot s, delta)
    y_perm_new = np.zeros_like(y_perm_old)
    new_class_off = []
    off = 0
    for (ranges, Td), c in zip(plans, fmt.classes):
        new_class_off.append(off)
        off += Td * NS * c.w
    fb_class_off = []
    for (ranges, Td), c in zip(fb_plans, fb_classes):
        fb_class_off.append(off)
        off += Td * NS1 * c.w

    lookup = np.zeros(b, dtype=np.int64)
    for ci, c in enumerate(fmt.classes):
        ranges, Td = plans[ci]
        T, w = c.num_chunks, c.w
        base = old_bases[ci]
        sz = T * NS * w
        flat = np.arange(sz)
        g = flat // (NS * w)
        rem = flat % (NS * w)
        dev = np.zeros(T, dtype=np.int64)
        loc = np.zeros(T, dtype=np.int64)
        for d, (g0, g1) in enumerate(ranges):
            dev[g0:g1] = d
            loc[g0:g1] = np.arange(g1 - g0)
        lookup[base : base + sz] = (
            dev[g] * slots_per_dev
            + new_class_off[ci]
            + loc[g] * (NS * w)
            + rem
        )
    for ci, c in enumerate(fb_classes):
        ranges, Td = fb_plans[ci]
        T, w = c.num_chunks, c.w
        base = fb_bases[ci]
        sz = T * NS1 * w
        flat = np.arange(sz)
        # v1 slot-space flat layout is slot-major (T*NS1, w)
        g = flat // (NS1 * w)
        rem = flat % (NS1 * w)
        dev = np.zeros(T, dtype=np.int64)
        loc = np.zeros(T, dtype=np.int64)
        for d, (g0, g1) in enumerate(ranges):
            dev[g0:g1] = d
            loc[g0:g1] = np.arange(g1 - g0)
        lookup[base : base + sz] = (
            dev[g] * slots_per_dev
            + fb_class_off[ci]
            + loc[g] * (NS1 * w)
            + rem
        )
    y_perm_new = lookup[y_perm_old]

    # materialize sharded arrays
    out_classes = []
    for (ranges, Td), c in zip(plans, fmt.classes):
        w = c.w

        def take(arr, per, Td=Td, ranges=ranges, edge_pad=False):
            """Slice chunks [g0,g1) along the last axis (per units/chunk)
            into [D, ..., Td*per].  ``edge_pad`` repeats the segment's
            last element instead of zero-filling — used for xtile so
            pad chunks keep pointing at DEVICE-LOCAL tiles (zero pads
            read phantom tile 0, which made plan_overlap classify pad
            chunks remote and plan_halo ship tile 0 to every device)."""
            a = np.asarray(arr)
            outs = []
            for g0, g1 in ranges:
                seg = a[..., g0 * per : g1 * per]
                npad = (Td - (g1 - g0)) * per
                if edge_pad and seg.shape[-1] > 0 and npad > 0:
                    pad = np.repeat(seg[..., -1:], npad, axis=-1)
                else:
                    pad = np.zeros(a.shape[:-1] + (npad,), dtype=a.dtype)
                outs.append(np.concatenate([seg, pad], axis=-1))
            return np.stack(outs, axis=0)

        out_classes.append(
            ShardedClass(
                w=w,
                chunks_per_dev=Td,
                wblk=c.wblk,
                scan_steps=c.scan_steps,
                identity=c.identity,
                val_i=take(c.val_i, NG),
                row_i=take(c.row_i, NG),
                gseg=take(c.gseg, NG),
                ends=take(c.ends, NS),
                xtile=take(c.xtile, (NG // 128) * c.wblk,
                           edge_pad=True),  # per-(chunk, vreg, win) bases
                nslots=take(c.nslots, 1),
                straddle=take(c.straddle, 1),
            )
        )

    fb_out = []
    for (ranges, Td), c in zip(fb_plans, fb_classes):
        def take1(arr, per, Td=Td, ranges=ranges, axis=-1):
            a = np.asarray(arr)
            outs = []
            for g0, g1 in ranges:
                if a.ndim == 2 and a.shape[1] == 1:  # seg_rel [T*cq, 1]
                    seg = a[g0 * per : g1 * per]
                    pad = np.full(((Td - (g1 - g0)) * per, 1), NS1, a.dtype)
                    outs.append(np.concatenate([seg, pad], axis=0))
                else:
                    seg = a[..., g0 * per : g1 * per]
                    pad = np.zeros(
                        a.shape[:-1] + ((Td - (g1 - g0)) * per,), dtype=a.dtype
                    )
                    outs.append(np.concatenate([seg, pad], axis=-1))
            return np.stack(outs, axis=0)

        fb_out.append(
            ShardedV1Class(
                w=c.w,
                cq=c.cq,
                chunks_per_dev=Td,
                val_t=take1(c.val_t, c.cq),
                row=take1(c.row, c.cq),
                seg_rel=take1(c.seg_rel, c.cq),
                s_last=take1(c.s_last, 1),
                straddle=take1(c.straddle, 1),
            )
        )

    # per-device Clos pre-gather plans for the fallback classes (the
    # XLA gather they'd otherwise use runs ~per-element on this
    # backend, ops/windowed_gather.py:3-5); shape-normalized via
    # pad_plan_windows so the D plans stack into one sharded pytree
    fb_gathers = []
    for c_new in fb_out:
        rows = np.asarray(c_new.row)  # [D, Td*cq]
        plans = [wg.pack_permute(rows[d], fmt.m) for d in range(ndev)]
        if any(p is None for p in plans) or len(
                {type(p) for p in plans}) > 1:
            fb_gathers.append(None)
            continue
        wb = max(p.wblk for p in plans)
        plans = [wg.pad_plan_windows(p, wb) for p in plans]
        fb_gathers.append(
            jax.tree.map(lambda *xs: jnp.stack(xs), *plans))

    y_plan = wg.pack_permute(y_perm_new, max(1, ndev * slots_per_dev))
    return ShardedStream(
        m=fmt.m,
        n=fmt.n,
        ndev=ndev,
        slots_per_dev=int(slots_per_dev),
        classes=tuple(out_classes),
        fallback=tuple(fb_out),
        y_perm=y_perm_new.astype(np.int32),
        y_plan=y_plan,
        fb_gather=tuple(fb_gathers),
    )


def place(sfmt: ShardedStream, mesh: Mesh, axis: str = "d") -> ShardedStream:
    """device_put the sharded stream (leading axis over the mesh)."""
    def spec_like(c):
        sharded = P(axis)
        return ShardedClass(
            w=c.w,
            chunks_per_dev=c.chunks_per_dev,
            wblk=c.wblk,
            scan_steps=c.scan_steps,
            identity=c.identity,
            val_i=sharded,
            row_i=sharded,
            gseg=sharded,
            ends=sharded,
            xtile=sharded,
            nslots=sharded,
            straddle=sharded,
        )

    def fb_spec_like(c):
        sharded = P(axis)
        return ShardedV1Class(
            w=c.w, cq=c.cq, chunks_per_dev=c.chunks_per_dev,
            val_t=sharded, row=sharded, seg_rel=sharded,
            s_last=sharded, straddle=sharded,
        )

    specs = ShardedStream(
        m=sfmt.m,
        n=sfmt.n,
        ndev=sfmt.ndev,
        slots_per_dev=sfmt.slots_per_dev,
        classes=tuple(spec_like(c) for c in sfmt.classes),
        fallback=tuple(fb_spec_like(c) for c in sfmt.fallback),
        y_perm=P(),
        y_plan=jax.tree.map(
            lambda _: P(), sfmt.y_plan, is_leaf=lambda x: hasattr(x, "dtype")
        )
        if sfmt.y_plan is not None
        else None,
        fb_gather=tuple(
            jax.tree.map(lambda _: P(axis), g,
                         is_leaf=lambda x: hasattr(x, "dtype"))
            if g is not None else None
            for g in sfmt.fb_gather
        ),
    )
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(sfmt, shardings)


def dist_tr_spmv_pallas(
    sfmt: ShardedStream, x: jax.Array, mesh: Mesh, axis: str = "d"
):
    """y = A.T @ x across the mesh (natural order)."""

    from ..ops import pallas_trspmv as pk1

    def local(cls_shards, fb_shards, fb_plans, x_rep):
        outs = []
        for c in cls_shards:
            local_cls = pk2.StreamClass2(
                w=c.w,
                num_chunks=c.chunks_per_dev,
                num_stripes=0,  # unused by the kernel
                wblk=c.wblk,
                scan_steps=c.scan_steps,
                identity=c.identity,
                val_i=c.val_i[0],
                row_i=c.row_i[0],
                gseg=c.gseg[0],
                ends=c.ends[0],
                xtile=c.xtile[0],
                nslots=c.nslots[0],
                straddle=c.straddle[0],
            )
            x2d = pk2._x_2d(x_rep, sfmt.m)
            out = pk2._run_class2(local_cls, x2d)  # flat slot-major
            outs.append(out)
        for c, gp in zip(fb_shards, fb_plans):
            local_v1 = pk1.StreamClass(
                w=c.w,
                cq=c.cq,
                num_chunks=c.chunks_per_dev,
                num_stripes=0,
                val_t=c.val_t[0],
                row=c.row[0],
                seg_rel=c.seg_rel[0],
                s_last=c.s_last[0],
                straddle=c.straddle[0],
            )
            if gp is not None:
                # Clos pre-gather (arrays sliced to this device's plan)
                gl = jax.tree.map(lambda a: a[0], gp)
                xg_fb = wg.apply_permute(gl, x_rep)
            else:
                xg_fb = x_rep.astype(jnp.float32)[local_v1.row]
            out = pk1._run_class(local_v1, xg_fb)  # [w, Td*NS]
            outs.append(out.T.reshape(-1))
        return jnp.concatenate(outs)[None, :]  # [1, slots_per_dev]

    class_specs = tuple(
        jax.tree.map(
            lambda _: P(axis),
            c,
            is_leaf=lambda x: hasattr(x, "dtype"),
        )
        for c in sfmt.classes
    )
    fb_specs = tuple(
        jax.tree.map(
            lambda _: P(axis),
            c,
            is_leaf=lambda x: hasattr(x, "dtype"),
        )
        for c in sfmt.fallback
    )
    fbg_specs = tuple(
        jax.tree.map(lambda _: P(axis), g,
                     is_leaf=lambda x_: hasattr(x_, "dtype"))
        if g is not None else None
        for g in sfmt.fb_gather
    )
    slots = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(class_specs, fb_specs, fbg_specs, P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(sfmt.classes, sfmt.fallback, sfmt.fb_gather, x)
    flat = slots.reshape(-1)
    if sfmt.y_plan is not None:
        return wg.apply_permute(sfmt.y_plan, flat)
    return flat[sfmt.y_perm]


def plan_overlap(sfmt: ShardedStream):
    """Reorder each device's chunks so device-LOCAL-window chunks come
    first, enabling halo/compute overlap (SURVEY §5 north star; round-4
    verdict item 7): chunks whose x-windows all live in the device's
    own tile range can run while the ``all_to_all`` halo is in flight.

    Only whole straddle-free RUNS move (a straddle carry chains
    consecutive chunks, so runs must stay contiguous and ordered
    internally).  Returns ``(sfmt2, k_locals)`` where ``k_locals[ci]``
    is the per-class STATIC split: chunks ``[0, k)`` are local-window
    on EVERY device (k = the largest common run boundary <= the
    smallest per-device local-prefix), chunks ``[k, Td)`` may read
    halo tiles.  ``y_perm``/``y_plan`` are recomputed for the permuted
    slot layout; fallback (v1) classes are untouched (they consume the
    all-gathered x).  Use with :func:`plan_halo` on the RETURNED
    stream, then :func:`dist_tr_spmv_pallas_halo_overlap`."""
    D = sfmt.ndev
    Tx = max(1, -(-sfmt.m // 1024))
    tpd = -(-Tx // D)
    nv = NG // 128
    new_classes = []
    perms = []
    k_locals = []
    for c in sfmt.classes:
        Td = c.chunks_per_dev
        xt = np.asarray(c.xtile).reshape(D, Td, nv * c.wblk)
        stra = np.asarray(c.straddle)
        order = np.zeros((D, Td), np.int64)
        kmin = Td
        for d in range(D):
            local_chunk = (xt[d] // tpd == d).all(axis=1)
            runs = []
            a = 0
            for i in range(Td):
                if stra[d, i] == 0:
                    runs.append((a, i + 1))
                    a = i + 1
            if a < Td:
                runs.append((a, Td))
            loc = [r for r in runs if bool(local_chunk[r[0]:r[1]].all())]
            rem = [r for r in runs if not bool(local_chunk[r[0]:r[1]].all())]
            seq = ([i for r in loc for i in range(r[0], r[1])]
                   + [i for r in rem for i in range(r[0], r[1])])
            order[d] = seq
            kmin = min(kmin, sum(r[1] - r[0] for r in loc))
        # lower kmin to a run boundary valid on EVERY device: after the
        # permutation, position j is a boundary on d iff j == 0 or the
        # chunk at j-1 does not straddle
        stra_new = np.stack([stra[d][order[d]] for d in range(D)])
        k = kmin
        while k > 0 and not bool((stra_new[:, k - 1] == 0).all()):
            k -= 1
        perms.append(order)
        k_locals.append(int(k))

        def permute(arr, per, order=order, Td=Td):
            a = np.asarray(arr)
            out = np.empty_like(a)
            for d in range(D):
                blocks = a[d].reshape(a[d].shape[:-1] + (Td, per))
                out[d] = blocks[..., order[d], :].reshape(a[d].shape)
            return out

        new_classes.append(
            dataclasses.replace(
                c,
                val_i=permute(c.val_i, NG),
                row_i=permute(c.row_i, NG),
                gseg=permute(c.gseg, NG),
                ends=permute(c.ends, NS),
                xtile=permute(c.xtile, nv * c.wblk),
                nslots=permute(c.nslots, 1),
                straddle=permute(c.straddle, 1),
            ))

    # remap y: old slot (d, class, t, rem) -> (d, class, inv[t], rem)
    spd = sfmt.slots_per_dev
    lookup = np.arange(D * spd, dtype=np.int64)
    off = 0
    for ci, c in enumerate(sfmt.classes):
        Td, w = c.chunks_per_dev, c.w
        blk = NS * w
        for d in range(D):
            inv = np.zeros(Td, np.int64)
            inv[perms[ci][d]] = np.arange(Td)
            base = d * spd + off
            idx = (base
                   + (inv[:, None] * blk
                      + np.arange(blk)[None, :])).reshape(-1)
            lookup[base: base + Td * blk] = idx
        off += Td * blk
    y_perm_new = lookup[np.asarray(sfmt.y_perm).astype(np.int64)]
    y_plan = wg.pack_permute(y_perm_new, max(1, D * spd))
    sfmt2 = dataclasses.replace(
        sfmt,
        classes=tuple(new_classes),
        y_perm=y_perm_new.astype(np.int32),
        y_plan=y_plan,
    )
    return sfmt2, tuple(k_locals)


def dist_tr_spmv_pallas_halo_overlap(
    sfmt: ShardedStream,
    halo: HaloPlan,
    k_locals: tuple,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "d",
):
    """Halo-exchange TrSpMV with local-window compute issued BETWEEN
    the all_to_all and its first consumer: chunks ``[0, k)`` of every
    class read only the device's own x tiles, so XLA's latency-hiding
    scheduler can run them while the halo is in flight (the plain halo
    path made every chunk depend on ``recv``).  Requires ``sfmt`` and
    ``halo`` from :func:`plan_overlap` + :func:`plan_halo`."""
    D, tpd, H = halo.ndev, halo.tiles_per_dev, halo.hmax
    xg = (
        jnp.zeros(D * tpd * 1024, jnp.float32)
        .at[: sfmt.m]
        .set(x.astype(jnp.float32))
        .reshape(D, tpd * 8, 128)
    )

    from ..ops import pallas_trspmv as pk1

    def slice_cls(c, xtl, lo, hi):
        nvw = (NG // 128) * c.wblk
        return pk2.StreamClass2(
            w=c.w, num_chunks=hi - lo, num_stripes=0, wblk=c.wblk,
            scan_steps=c.scan_steps, identity=c.identity,
            val_i=c.val_i[0][:, lo * NG: hi * NG],
            row_i=c.row_i[0][:, lo * NG: hi * NG],
            gseg=c.gseg[0][:, lo * NG: hi * NG],
            ends=c.ends[0][:, lo * NS: hi * NS],
            xtile=xtl[0][lo * nvw: hi * nvw],
            nslots=c.nslots[0][lo:hi],
            straddle=c.straddle[0][lo:hi],
        )

    def local(cls_shards, fb_shards, fb_plans, xt_locals, x_shard,
              send_idx):
        own = x_shard[0]  # [tpd*8, 128]
        tiles = own.reshape(tpd, 1024)
        send = tiles[send_idx[0]]
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )
        # phase 1: local-window chunks — independent of recv
        outs1, outs2 = [], []
        for ci, (c, xtl) in enumerate(zip(cls_shards, xt_locals)):
            k, Td = k_locals[ci], c.chunks_per_dev
            if k > 0:
                outs1.append(pk2._run_class2(slice_cls(c, xtl, 0, k), own))
            else:
                outs1.append(None)
        # phase 2: halo chunks — first consumer of recv
        x2d = jnp.concatenate([own, recv.reshape(D * H * 8, 128)], axis=0)
        for ci, (c, xtl) in enumerate(zip(cls_shards, xt_locals)):
            k, Td = k_locals[ci], c.chunks_per_dev
            if k < Td:
                outs2.append(pk2._run_class2(slice_cls(c, xtl, k, Td), x2d))
            else:
                outs2.append(None)
        outs = []
        for o1, o2 in zip(outs1, outs2):
            parts = [o for o in (o1, o2) if o is not None]
            outs.append(parts[0] if len(parts) == 1
                        else jnp.concatenate(parts))
        if fb_shards:
            x_full = jax.lax.all_gather(
                x_shard[0], axis, axis=0, tiled=True
            ).reshape(-1)[: sfmt.m]
            for c, gp in zip(fb_shards, fb_plans):
                local_v1 = pk1.StreamClass(
                    w=c.w, cq=c.cq, num_chunks=c.chunks_per_dev,
                    num_stripes=0, val_t=c.val_t[0], row=c.row[0],
                    seg_rel=c.seg_rel[0], s_last=c.s_last[0],
                    straddle=c.straddle[0],
                )
                if gp is not None:
                    gl = jax.tree.map(lambda a: a[0], gp)
                    xg_fb = wg.apply_permute(gl, x_full)
                else:
                    xg_fb = x_full[local_v1.row]
                out = pk1._run_class(local_v1, xg_fb)
                outs.append(out.T.reshape(-1))
        return jnp.concatenate(outs)[None, :]

    class_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.classes
    )
    fb_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.fallback
    )
    fbg_specs = tuple(
        jax.tree.map(lambda _: P(axis), g,
                     is_leaf=lambda x_: hasattr(x_, "dtype"))
        if g is not None else None
        for g in sfmt.fb_gather
    )
    xt_specs = tuple(P(axis) for _ in halo.xtile_local)
    slots = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(class_specs, fb_specs, fbg_specs, xt_specs, P(axis),
                  P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(sfmt.classes, sfmt.fallback, sfmt.fb_gather, halo.xtile_local, xg,
      halo.send_idx)
    flat = slots.reshape(-1)
    if sfmt.y_plan is not None:
        return wg.apply_permute(sfmt.y_plan, flat)
    return flat[sfmt.y_perm]


# --------------------------------------------------------------------------
# Halo exchange: shard x too, and move only the 1024-element tiles each
# device's blocks actually read (SURVEY §5 "distributed communication
# backend" north star: plan-time halo sets + all-to-all over ICI).
# --------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "xtile_local"],
    meta_fields=["tiles_per_dev", "hmax", "ndev"],
)
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static halo-exchange plan for a :class:`ShardedStream`.

    ``x`` is sharded by contiguous aligned 1024-element tiles
    (``tiles_per_dev`` per device).  Every (source, dest) pair exchanges
    exactly the tiles dest's kernel windows read from source's range —
    known at pack time from the per-vreg ``xtile`` window bases — padded
    to the worst pair ``hmax`` so a single ``lax.all_to_all`` carries the
    whole halo.  Per-device ICI traffic is ``(D-1) * hmax * 4 KiB``
    versus ``m * 4 B`` for full replication.
    """

    tiles_per_dev: int
    hmax: int
    ndev: int
    send_idx: jax.Array  # [D(src), D(dst)*hmax] int32 source-local tile ids
    xtile_local: tuple  # per class [D, Td*nv*wblk] int32 into the local tile pool


def plan_halo(sfmt: ShardedStream) -> HaloPlan:
    """Compute the static halo plan from the shards' window-base sets."""
    D = sfmt.ndev
    Tx = max(1, -(-sfmt.m // 1024))
    tpd = -(-Tx // D)
    needed = [set() for _ in range(D)]
    for c in sfmt.classes:
        xt = np.asarray(c.xtile)
        for d in range(D):
            needed[d].update(int(t) for t in xt[d])
    remote = [
        [sorted(t for t in needed[d] if t // tpd == s) if s != d else []
         for s in range(D)]
        for d in range(D)
    ]
    hmax = max(
        1, max((len(remote[d][s]) for d in range(D) for s in range(D)), default=1)
    )
    send_idx = np.zeros((D, D, hmax), dtype=np.int32)
    pos = {}  # (d, global tile) -> local pool index on device d
    for d in range(D):
        for t in needed[d]:
            if t // tpd == d:
                pos[(d, t)] = t - d * tpd
        for s in range(D):
            for j, t in enumerate(remote[d][s]):
                send_idx[s, d, j] = t - s * tpd
                pos[(d, t)] = tpd + s * hmax + j
    xtile_local = []
    for c in sfmt.classes:
        xt = np.asarray(c.xtile)
        loc = np.zeros_like(xt)
        for d in range(D):
            for i, t in enumerate(xt[d]):
                loc[d, i] = pos[(d, int(t))]
        xtile_local.append(loc.astype(np.int32))
    return HaloPlan(
        tiles_per_dev=int(tpd),
        hmax=int(hmax),
        ndev=D,
        send_idx=send_idx.reshape(D, D * hmax),
        xtile_local=tuple(xtile_local),
    )


def dist_tr_spmv_pallas_halo(
    sfmt: ShardedStream,
    halo: HaloPlan,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "d",
):
    """y = A.T @ x across the mesh with x sharded by tiles and a single
    all-to-all halo exchange (instead of replicating x)."""
    D, tpd, H = halo.ndev, halo.tiles_per_dev, halo.hmax
    xg = (
        jnp.zeros(D * tpd * 1024, jnp.float32)
        .at[: sfmt.m]
        .set(x.astype(jnp.float32))
        .reshape(D, tpd * 8, 128)
    )

    from ..ops import pallas_trspmv as pk1

    def local(cls_shards, fb_shards, fb_plans, xt_locals, x_shard,
              send_idx):
        own = x_shard[0]  # [tpd*8, 128]
        tiles = own.reshape(tpd, 1024)
        send = tiles[send_idx[0]]  # [D*H, 1024]
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )
        x2d = jnp.concatenate([own, recv.reshape(D * H * 8, 128)], axis=0)
        outs = []
        for c, xtl in zip(cls_shards, xt_locals):
            local_cls = pk2.StreamClass2(
                w=c.w,
                num_chunks=c.chunks_per_dev,
                num_stripes=0,
                wblk=c.wblk,
                scan_steps=c.scan_steps,
                identity=c.identity,
                val_i=c.val_i[0],
                row_i=c.row_i[0],
                gseg=c.gseg[0],
                ends=c.ends[0],
                xtile=xtl[0],
                nslots=c.nslots[0],
                straddle=c.straddle[0],
            )
            outs.append(pk2._run_class2(local_cls, x2d))
        if fb_shards:
            # non-local classes: the halo set is the whole vector, so
            # an all-gather (replication) is the right communication;
            # the per-row gather itself rides the Clos permute kernel
            x_full = jax.lax.all_gather(
                x_shard[0], axis, axis=0, tiled=True
            ).reshape(-1)[: sfmt.m]
            for c, gp in zip(fb_shards, fb_plans):
                local_v1 = pk1.StreamClass(
                    w=c.w, cq=c.cq, num_chunks=c.chunks_per_dev,
                    num_stripes=0, val_t=c.val_t[0], row=c.row[0],
                    seg_rel=c.seg_rel[0], s_last=c.s_last[0],
                    straddle=c.straddle[0],
                )
                if gp is not None:
                    gl = jax.tree.map(lambda a: a[0], gp)
                    xg_fb = wg.apply_permute(gl, x_full)
                else:
                    xg_fb = x_full[local_v1.row]
                out = pk1._run_class(local_v1, xg_fb)
                outs.append(out.T.reshape(-1))
        return jnp.concatenate(outs)[None, :]

    class_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.classes
    )
    fb_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.fallback
    )
    fbg_specs = tuple(
        jax.tree.map(lambda _: P(axis), g,
                     is_leaf=lambda x_: hasattr(x_, "dtype"))
        if g is not None else None
        for g in sfmt.fb_gather
    )
    xt_specs = tuple(P(axis) for _ in halo.xtile_local)
    slots = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(class_specs, fb_specs, fbg_specs, xt_specs, P(axis),
                  P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(sfmt.classes, sfmt.fallback, sfmt.fb_gather, halo.xtile_local, xg,
      halo.send_idx)
    flat = slots.reshape(-1)
    if sfmt.y_plan is not None:
        return wg.apply_permute(sfmt.y_plan, flat)
    return flat[sfmt.y_perm]
