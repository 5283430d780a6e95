"""Multi-chip u-blocked 2-D Pallas TrSpMV: chunk-sharded Stream2DBundle.

Extends the 1-D chunk-sharding scheme (:mod:`.pallas_spmv`, the SPMD
analog of the reference's dynamic stripe scheduler,
``src/multiply_1DVBC.jl:169-177`` / ``src/multiply_VBC.jl:182-189``) to
the dedicated 2-D kernel (:mod:`vbcs_tpu.ops.pallas_trspmv2d`): every
(u, w) class's chunks are split at carry-free boundaries across the
mesh, each device runs the u-blocked kernel over its local grid, and
slot outputs concatenate without reduction.  ``x`` is replicated
(one ICI all-gather) or tile-sharded with the same static halo plan as
the 1-D path (window-base sets name exactly the tiles each device
reads).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pallas_trspmv2 as pk2
from ..ops import pallas_trspmv2d as pk2d
from ..ops import windowed_gather as wg
from .pallas_spmv import HaloPlan, _split_ranges

__all__ = [
    "ShardedClass2D",
    "ShardedStream2D",
    "shard_stream_2d",
    "place_2d",
    "dist_tr_spmv_pallas_2d",
    "plan_halo_2d",
    "dist_tr_spmv_pallas_2d_halo",
]

NS, NG = pk2.NS, pk2.NG


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_i", "row_i", "gseg", "ends", "xtile", "nslots", "straddle"],
    meta_fields=["u", "w", "chunks_per_dev", "wblk", "scan_steps", "identity"],
)
@dataclasses.dataclass(frozen=True)
class ShardedClass2D:
    u: int
    w: int
    chunks_per_dev: int
    wblk: int
    scan_steps: int
    identity: bool
    val_i: jax.Array  # [D, 8*u*w, Td*NG]
    row_i: jax.Array  # [D, 8, Td*NG]
    gseg: jax.Array  # [D, 1, Td*NG]
    ends: jax.Array  # [D, 1, Td*NS]
    xtile: jax.Array  # [D, Td*nv*wblk]
    nslots: jax.Array  # [D, Td]
    straddle: jax.Array  # [D, Td]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["classes", "y_perm", "y_plan"],
    meta_fields=["m", "n", "ndev", "slots_per_dev"],
)
@dataclasses.dataclass(frozen=True)
class ShardedStream2D:
    m: int
    n: int
    ndev: int
    slots_per_dev: int
    classes: tuple  # ShardedClass2D
    y_perm: jax.Array
    y_plan: object


def shard_stream_2d(bundle: pk2d.Stream2DBundle, ndev: int) -> ShardedStream2D:
    """Repartition a Stream2DBundle into the [D, ...] chunk-sharded layout."""
    if bundle.fmt1d is not None:
        raise NotImplementedError(
            "sharded execution of the mixed-height 1-D fallback is not "
            "wired yet — use a planner producing uniform-height stripes "
            "(e.g. equi row passes), or the 1-D sharded path on "
            "to_1d_view()"
        )
    y_perm_old = np.asarray(bundle.y_perm).astype(np.int64)

    old_bases, b = [], 0
    for c in bundle.classes2d:
        old_bases.append(b)
        b += c.num_chunks * NS * c.w

    plans, slots_per_dev = [], 0
    for c in bundle.classes2d:
        ranges = _split_ranges(c.num_chunks, np.asarray(c.straddle), ndev)
        Td = max(g1 - g0 for g0, g1 in ranges)
        plans.append((ranges, Td))
        slots_per_dev += Td * NS * c.w

    new_class_off, off = [], 0
    for (ranges, Td), c in zip(plans, bundle.classes2d):
        new_class_off.append(off)
        off += Td * NS * c.w

    lookup = np.zeros(max(b, 1), dtype=np.int64)
    for ci, c in enumerate(bundle.classes2d):
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
    y_perm_new = lookup[y_perm_old]

    out_classes = []
    for (ranges, Td), c in zip(plans, bundle.classes2d):
        def take(arr, per, Td=Td, ranges=ranges):
            a = np.asarray(arr)
            outs = []
            for g0, g1 in ranges:
                seg = a[..., g0 * per : g1 * per]
                pad = np.zeros(
                    a.shape[:-1] + ((Td - (g1 - g0)) * per,), dtype=a.dtype
                )
                outs.append(np.concatenate([seg, pad], axis=-1))
            return np.stack(outs, axis=0)

        out_classes.append(
            ShardedClass2D(
                u=c.u,
                w=c.w,
                chunks_per_dev=Td,
                wblk=c.wblk,
                scan_steps=c.scan_steps,
                identity=c.identity,
                val_i=take(c.val_i, NG),
                row_i=take(c.row_i, NG),
                gseg=take(c.gseg, NG),
                ends=take(c.ends, NS),
                xtile=take(c.xtile, (NG // 128) * c.wblk),
                nslots=take(c.nslots, 1),
                straddle=take(c.straddle, 1),
            )
        )

    y_plan = wg.pack_permute(y_perm_new, max(1, ndev * slots_per_dev))
    return ShardedStream2D(
        m=bundle.m,
        n=bundle.n,
        ndev=ndev,
        slots_per_dev=int(slots_per_dev),
        classes=tuple(out_classes),
        y_perm=y_perm_new.astype(np.int32),
        y_plan=y_plan,
    )


def place_2d(sfmt: ShardedStream2D, mesh: Mesh, axis: str = "d") -> ShardedStream2D:
    """device_put the sharded 2-D stream (leading axis over the mesh)."""
    def spec_like(c):
        sharded = P(axis)
        return ShardedClass2D(
            u=c.u, w=c.w, chunks_per_dev=c.chunks_per_dev, wblk=c.wblk,
            scan_steps=c.scan_steps, identity=c.identity,
            val_i=sharded, row_i=sharded, gseg=sharded, ends=sharded,
            xtile=sharded, nslots=sharded, straddle=sharded,
        )

    specs = ShardedStream2D(
        m=sfmt.m, n=sfmt.n, ndev=sfmt.ndev, slots_per_dev=sfmt.slots_per_dev,
        classes=tuple(spec_like(c) for c in sfmt.classes),
        y_perm=P(),
        y_plan=jax.tree.map(
            lambda _: P(), sfmt.y_plan, is_leaf=lambda x: hasattr(x, "dtype")
        )
        if sfmt.y_plan is not None
        else None,
    )
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(sfmt, shardings)


def _local_class(c: ShardedClass2D, xtile=None) -> pk2d.StreamClass2D:
    return pk2d.StreamClass2D(
        u=c.u,
        w=c.w,
        num_chunks=c.chunks_per_dev,
        wblk=c.wblk,
        scan_steps=c.scan_steps,
        identity=c.identity,
        val_i=c.val_i[0],
        row_i=c.row_i[0],
        gseg=c.gseg[0],
        ends=c.ends[0],
        xtile=c.xtile[0] if xtile is None else xtile[0],
        nslots=c.nslots[0],
        straddle=c.straddle[0],
    )


def dist_tr_spmv_pallas_2d(
    sfmt: ShardedStream2D, x: jax.Array, mesh: Mesh, axis: str = "d"
):
    """y = A.T @ x across the mesh on the u-blocked kernel (replicated x)."""

    def local(cls_shards, x_rep):
        x2d = pk2._x_2d(x_rep, sfmt.m)
        outs = [pk2d._run_class2d(_local_class(c), x2d) for c in cls_shards]
        return jnp.concatenate(outs)[None, :]

    class_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.classes
    )
    slots = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(class_specs, P()),
        out_specs=P(axis),
        check_vma=False,
    )(sfmt.classes, x)
    flat = slots.reshape(-1)
    if sfmt.y_plan is not None:
        return wg.apply_permute(sfmt.y_plan, flat)
    return flat[sfmt.y_perm]


def plan_halo_2d(sfmt: ShardedStream2D) -> HaloPlan:
    """Static halo plan from the 2-D shards' window-base sets (same
    construction as the 1-D :func:`..pallas_spmv.plan_halo` — the window
    geometry is identical, including straddling tiles' successor
    windows, which already appear in ``xtile``)."""
    from .pallas_spmv import plan_halo

    return plan_halo(sfmt)  # duck-typed: reads .ndev, .m, .classes[i].xtile


def dist_tr_spmv_pallas_2d_halo(
    sfmt: ShardedStream2D,
    halo: HaloPlan,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "d",
):
    """y = A.T @ x with x sharded by aligned tiles + one all-to-all halo."""
    D, tpd, H = halo.ndev, halo.tiles_per_dev, halo.hmax
    xg = (
        jnp.zeros(D * tpd * 1024, jnp.float32)
        .at[: sfmt.m]
        .set(x.astype(jnp.float32))
        .reshape(D, tpd * 8, 128)
    )

    def local(cls_shards, xt_locals, x_shard, send_idx):
        own = x_shard[0]
        tiles = own.reshape(tpd, 1024)
        send = tiles[send_idx[0]]
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )
        x2d = jnp.concatenate([own, recv.reshape(D * H * 8, 128)], axis=0)
        outs = [
            pk2d._run_class2d(_local_class(c, xtile=xtl), x2d)
            for c, xtl in zip(cls_shards, xt_locals)
        ]
        return jnp.concatenate(outs)[None, :]

    class_specs = tuple(
        jax.tree.map(lambda _: P(axis), c, is_leaf=lambda x_: hasattr(x_, "dtype"))
        for c in sfmt.classes
    )
    xt_specs = tuple(P(axis) for _ in halo.xtile_local)
    slots = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(class_specs, xt_specs, P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(sfmt.classes, halo.xtile_local, xg, halo.send_idx)
    flat = slots.reshape(-1)
    if sfmt.y_plan is not None:
        return wg.apply_permute(sfmt.y_plan, flat)
    return flat[sfmt.y_perm]
