"""Distributed v3 one-shot TrSpMV: column-stripe sharding over a Mesh.

The fast single-chip path (``ops/pallas_trspmv3`` one-shot, 83+
Gnnz/s measured) gets a multi-chip story by partitioning COLUMN
STRIPES across devices: shard d owns a contiguous run of stripes
(a column slice ``A[:, c0:c1]``), packs it ``mode="nat"`` — nat-mode
formats accept rectangular matrices, so a column slice is just a
narrower matrix — and computes its own slice of ``y = A.T @ x`` with
x replicated (the reference's multithreaded stripe scheduler analog,
``src/multiply_1DVBC.jl:169-177``, lifted to chips: stripes are the
unit of parallel decomposition, each owner writes a disjoint y
slice).  No collective is needed in the compute: the one all-gather
of x happens implicitly via replication, and y concatenates shard
slices.

Scope: uniform width-8 natural formats (the flagship / production
regime) with the stripe count divisible by the device count — other
formats keep the v2 distributed path (``parallel/pallas_spmv``).
Per-shard static shapes are padded to common maxima (chunk count,
window count) so the per-device formats stack into one [D, ...]
pytree for ``shard_map``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.partition import SplitPartition
from ..formats.vbc1d import VBC1D
from ..ops import pallas_trspmv3 as pk3

__all__ = ["Sharded3", "shard_oneshot3", "place3",
           "dist_tr_spmv_oneshot3"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "meta", "xtile", "nslots", "straddle"],
    meta_fields=["m", "n", "ndev", "cols_per_dev", "Ts", "nwin", "ng",
                 "ns"],
)
@dataclasses.dataclass(frozen=True)
class Sharded3:
    m: int
    n: int
    ndev: int
    cols_per_dev: int
    Ts: int  # padded chunks per device
    nwin: int
    ng: int
    ns: int
    vals: jax.Array  # [D, 64, Ts*ng]
    meta: jax.Array  # [D, 8, Ts*ng]
    xtile: jax.Array  # [D, Ts*(ng//128)*nwin]
    nslots: jax.Array  # [D, Ts]
    straddle: jax.Array  # [D, Ts]


def shard_oneshot3(B: VBC1D, ndev: int):
    """Column-stripe shard a uniform width-8 natural VBC1D into per-
    device nat-mode one-shot formats; None when out of scope."""
    widths = B.Phi.widths()
    if widths.size == 0 or not (widths == 8).all():
        return None
    spl = B.Phi.spl.astype(np.int64)
    S = spl.size - 1
    if not np.array_equal(spl, np.arange(S + 1) * 8) or S % ndev != 0:
        return None
    Sd = S // ndev
    pos = B.pos.astype(np.int64)
    ofs = B.ofs.astype(np.int64)

    fmts = []
    for d in range(ndev):
        s0, s1 = d * Sd, (d + 1) * Sd
        Bd = VBC1D(
            m=B.m, n=Sd * 8, W=B.W,
            Phi=SplitPartition(np.arange(Sd + 1, dtype=spl.dtype) * 8),
            pos=(pos[s0:s1 + 1] - pos[s0]).astype(B.pos.dtype),
            idx=B.idx[pos[s0]:pos[s1]],
            ofs=(ofs[s0:s1 + 1] - ofs[s0]).astype(B.ofs.dtype),
            val=B.val[ofs[s0]:ofs[s1]],
        )
        fmt = pk3.pack_stream3(Bd, mode="nat")
        if (fmt is None or not fmt.natural or fmt.ws != (8,)
                or fmt.has_scan or fmt.identities != (True,)):
            # _template hardcodes the identity (scan-free) kernel; a
            # scan-format shard (any stripe with >8 blocks) would run
            # the wrong kernel and silently return wrong y — refuse so
            # the operator falls back to the v2 distributed path.
            return None
        fmts.append(fmt)

    ng, ns = fmts[0].ng, fmts[0].ns
    nv = ng // 128
    Ts = max(f.num_chunks for f in fmts)
    nwin = max(f.nwin for f in fmts)
    vals = np.zeros((ndev, 64, Ts * ng), np.float32)
    meta = np.zeros((ndev, 8, Ts * ng), np.int32)
    xtile = np.zeros((ndev, Ts * nv * nwin), np.int32)
    nslots = np.zeros((ndev, Ts), np.int32)
    straddle = np.zeros((ndev, Ts), np.int32)
    for d, f in enumerate(fmts):
        T = f.num_chunks
        vals[d, :, : T * ng] = np.asarray(f.vals[0])
        meta[d, :, : T * ng] = np.asarray(f.meta_nat)
        xt = np.asarray(f.xtile_nat).reshape(T * nv, f.nwin)
        xt2 = np.concatenate(
            [xt, np.repeat(xt[:, :1], nwin - f.nwin, axis=1)], axis=1)
        xtile[d, : T * nv * nwin] = xt2.reshape(-1)
        nslots[d, :T] = np.asarray(f.nslots)
        straddle[d, :T] = np.asarray(f.straddle)
    return Sharded3(
        m=B.m, n=B.n, ndev=ndev, cols_per_dev=Sd * 8, Ts=Ts, nwin=nwin,
        ng=ng, ns=ns, vals=vals, meta=meta, xtile=xtile, nslots=nslots,
        straddle=straddle,
    )


def place3(sfmt: Sharded3, mesh: Mesh, axis: str = "d") -> Sharded3:
    """Place the [D, ...] leaves shard-per-device on the mesh."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return dataclasses.replace(
        sfmt,
        vals=put(jnp.asarray(sfmt.vals)),
        meta=put(jnp.asarray(sfmt.meta)),
        xtile=put(jnp.asarray(sfmt.xtile)),
        nslots=put(jnp.asarray(sfmt.nslots)),
        straddle=put(jnp.asarray(sfmt.straddle)),
    )


def _template(sfmt: Sharded3) -> pk3.StreamFormat3:
    """Static-field template for the per-device one-shot call (the
    kernel builder reads only static fields; data arrives as call
    arguments)."""
    z = np.zeros(0, np.float32)
    return pk3.StreamFormat3(
        ws=(8,), offs=(0, sfmt.Ts), scan_steps=(0,), identities=(True,),
        nwins=(sfmt.nwin,), nwin=sfmt.nwin, num_chunks=sfmt.Ts,
        has_straddle=False, has_scan=False, m=sfmt.m,
        n=sfmt.cols_per_dev, X=sfmt.Ts * sfmt.ns, natural=True,
        ng=sfmt.ng, ns=sfmt.ns, entry_mode="reshape",
        vals=(z,), meta_nat=z, meta_slot=z, xtile_nat=z, xtile_slot=z,
        nslots=z, straddle=z, gseg=None, ends=None, exit_plan=None,
        exit_idx=None, exit_wi=None, exit_lane=None, entry_plan=None,
        entry_gidx=None, entry_mask=None,
    )


def dist_tr_spmv_oneshot3(sfmt: Sharded3, x: jax.Array, mesh: Mesh,
                          axis: str = "d", alpha=None) -> jax.Array:
    """y = alpha * A.T @ x over the mesh: stripes sharded, x
    replicated, each device runs the nat-mode one-shot on its column
    slice and writes a disjoint natural y slice."""
    tmpl = _template(sfmt)
    R = -(-sfmt.m // 1024)
    Rb = -(-R // 8)
    nat_rows = Rb * 64
    xp = jnp.zeros(Rb * 8192, jnp.float32).at[: sfmt.m].set(
        x.astype(jnp.float32))
    xin = xp.reshape(nat_rows, 128)
    a = jnp.asarray(1.0 if alpha is None else alpha, jnp.float32)
    ab = jax.lax.bitcast_convert_type(
        jnp.stack([a, jnp.float32(0.0)]), jnp.int32).reshape(2)

    rows_c = sfmt.ns * 8 // 128

    def local(vals, meta, xtile, nslots, straddle, xin):
        out = pk3._oneshot_call(tmpl, Rb * 1024, nat_rows)(
            xtile[0], ab, nslots[0], straddle[0], meta[0], vals[0], xin)
        return out.reshape(1, sfmt.Ts * rows_c * 128)

    y = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(sfmt.vals, sfmt.meta, sfmt.xtile, sfmt.nslots, sfmt.straddle, xin)
    # each shard's flat prefix IS its natural y slice
    return y[:, : sfmt.cols_per_dev].reshape(-1)[: sfmt.n]
