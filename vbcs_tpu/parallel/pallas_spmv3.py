"""Distributed v3 one-shot TrSpMV: column-stripe sharding over a Mesh.

The fast single-chip path (``ops/pallas_trspmv3`` one-shot, 90-104
Gnnz/s measured) gets a multi-chip story by partitioning COLUMN
STRIPES across devices: shard d owns a contiguous run of stripes
(a column slice ``A[:, c0:c1]``), packs it ``mode="nat"`` — nat-mode
formats accept rectangular matrices, so a column slice is just a
narrower matrix — and computes its own slice of ``y = A.T @ x`` with
x replicated (the reference's multithreaded stripe scheduler analog,
``src/multiply_1DVBC.jl:169-177``, lifted to chips: stripes are the
unit of parallel decomposition, each owner writes a disjoint y
slice).  No collective is needed in the compute: the one all-gather
of x happens implicitly via replication, and y assembles from shard
slices through ONE windowed permute.

Round-5 widening (verdict item 8): the round-4 version required
uniform width-8 natural identity formats with the stripe count
divisible by the device count.  Now any per-shard pack is accepted as
long as every shard produces the SAME class signature (widths,
identity/scan split, scan depths — SPMD needs one program):

* stripe ranges are contiguous and near-equal (no divisibility);
* per-class chunk counts pad to the max across shards (pad chunks
  have nslots=0/zero values — the kernel masks them out);
* the slot->natural exit becomes ONE GLOBAL permutation over the
  ``[D, osz]`` kernel outputs, routed permute -> Clos -> multipass
  (never the XLA gather), so multi-class / scan / non-natural shards
  all work.  Shards whose class signatures differ fall back to the
  v2 distributed path (``parallel/pallas_spmv``).
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
from ..ops import multipass as mp
from ..ops import pallas_trspmv3 as pk3
from ..ops import windowed_gather as wg

__all__ = ["Sharded3", "shard_oneshot3", "place3",
           "dist_tr_spmv_oneshot3"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "meta", "xtile", "nslots", "straddle", "gseg",
                 "ends", "exit_plan"],
    meta_fields=["m", "n", "ndev", "Ts", "ws", "offs", "scan_steps",
                 "identities", "nwins", "nwin", "has_scan", "natural",
                 "ng", "ns", "osz", "exit_kind"],
)
@dataclasses.dataclass(frozen=True)
class Sharded3:
    m: int
    n: int
    ndev: int
    Ts: int  # padded total chunks per device
    ws: tuple  # common class widths
    offs: tuple  # common per-class chunk offsets (len C+1)
    scan_steps: tuple
    identities: tuple
    nwins: tuple
    nwin: int
    has_scan: bool
    natural: bool  # every shard natural (exit = global monotone slice)
    ng: int
    ns: int
    osz: int  # kernel output elements per shard (= 8 * Ts * ns)
    exit_kind: str  # "permute" | "multipass"
    vals: tuple  # per class [D, 8*w_c, Tc*ng]
    meta: jax.Array  # [D, 8, Ts*ng]
    xtile: jax.Array  # [D, Ts*(ng//128)*nwin]
    nslots: jax.Array  # [D, Ts]
    straddle: jax.Array  # [D, Ts]
    gseg: object  # [D, 1, Ts*ng] or None
    ends: object  # [D, 1, Ts*ns] or None
    exit_plan: object  # global [D*osz] -> y[n] permute plan


def _shard_ranges(S: int, ndev: int):
    """Contiguous near-equal stripe ranges (sizes differ by <= 1)."""
    cuts = [(S * d) // ndev for d in range(ndev + 1)]
    return [(cuts[d], cuts[d + 1]) for d in range(ndev)]


def shard_oneshot3(B: VBC1D, ndev: int):
    """Column-stripe shard a VBC1D into per-device nat-mode one-shot
    formats with a COMMON static structure; None when out of scope
    (any shard refuses to pack, or class signatures differ across
    shards — the caller then uses the v2 distributed path)."""
    widths = B.Phi.widths()
    if widths.size == 0 or int(widths.max(initial=0)) > 8:
        return None
    spl = B.Phi.spl.astype(np.int64)
    S = spl.size - 1
    if S < ndev:
        return None
    pos = B.pos.astype(np.int64)
    ofs = B.ofs.astype(np.int64)
    ranges = _shard_ranges(S, ndev)

    fmts = []
    for s0, s1 in ranges:
        Bd = VBC1D(
            m=B.m, n=int(spl[s1] - spl[s0]), W=B.W,
            Phi=SplitPartition(spl[s0:s1 + 1] - spl[s0]),
            pos=(pos[s0:s1 + 1] - pos[s0]).astype(B.pos.dtype),
            idx=B.idx[pos[s0]:pos[s1]],
            ofs=(ofs[s0:s1 + 1] - ofs[s0]).astype(B.ofs.dtype),
            val=B.val[ofs[s0]:ofs[s1]],
        )
        # split_identity=False: one class per width on every shard —
        # the identity/multi-group split is data-dependent and made
        # shard signatures diverge (a shard with no single-group
        # stripes lacked the identity class)
        fmt = pk3.pack_stream3(Bd, mode="nat", split_identity=False)
        if fmt is None:
            return None
        fmts.append(fmt)

    def sig(f):
        # scan_steps excluded: per-class maxima are taken below (extra
        # scan iterations are no-ops on shorter runs)
        return (f.ws, f.identities, f.has_scan, f.natural, f.entry_mode)

    if len({sig(f) for f in fmts}) != 1:
        return None
    f0 = fmts[0]
    C = len(f0.ws)
    ng, ns = f0.ng, f0.ns
    nv = ng // 128
    # common per-class chunk counts (padded to the max across shards)
    Tcs = [max(f.offs[c + 1] - f.offs[c] for f in fmts) for c in range(C)]
    offs = tuple(np.concatenate([[0], np.cumsum(Tcs)]).astype(int).tolist())
    Ts = offs[-1]
    nwins = tuple(max(f.nwins[c] for f in fmts) for c in range(C))
    nwin = max(nwins)
    scan_steps = tuple(
        max(f.scan_steps[c] for f in fmts) for c in range(C))
    has_scan = f0.has_scan

    vals = [np.zeros((ndev, 8 * f0.ws[c], Tcs[c] * ng), np.float32)
            for c in range(C)]
    meta = np.zeros((ndev, 8, Ts * ng), np.int32)
    xtile = np.zeros((ndev, Ts * nv * nwin), np.int32)
    nslots = np.zeros((ndev, Ts), np.int32)
    straddle = np.zeros((ndev, Ts), np.int32)
    gseg = np.zeros((ndev, 1, Ts * ng), np.int32) if has_scan else None
    ends = np.zeros((ndev, 1, Ts * ns), np.int32) if has_scan else None

    for d, f in enumerate(fmts):
        mn = np.asarray(f.meta_nat)
        xt = np.asarray(f.xtile_nat).reshape(-1, f.nwin)
        nsl = np.asarray(f.nslots)
        std = np.asarray(f.straddle)
        for c in range(C):
            o0, o1 = f.offs[c], f.offs[c + 1]
            Tdc = o1 - o0
            oc = offs[c]
            vals[c][d][:, : Tdc * ng] = np.asarray(f.vals[c])
            meta[d][:, oc * ng:(oc + Tdc) * ng] = mn[:, o0 * ng:o1 * ng]
            # xtile: pad extra window slots with the vreg's window 0
            # (in-bounds; meta never selects them)
            xtc = xt[o0 * nv:o1 * nv]
            if f.nwin < nwin:
                xtc = np.concatenate(
                    [xtc, np.repeat(xtc[:, :1], nwin - f.nwin, axis=1)],
                    axis=1)
            else:
                xtc = xtc[:, :nwin]
            xtile[d][oc * nv * nwin:(oc + Tdc) * nv * nwin] = \
                xtc.reshape(-1)
            nslots[d][oc:oc + Tdc] = nsl[o0:o1]
            straddle[d][oc:oc + Tdc] = std[o0:o1]
            if has_scan:
                gseg[d][:, oc * ng:(oc + Tdc) * ng] = \
                    np.asarray(f.gseg)[:, o0 * ng:o1 * ng]
                ends[d][:, oc * ns:(oc + Tdc) * ns] = \
                    np.asarray(f.ends)[:, o0 * ns:o1 * ns]

    # global exit: y[col_off_d + j] = out_flat[d*osz + eidx_d[j]],
    # where eidx is re-laid for the common (padded) chunk offsets
    osz = 8 * Ts * ns
    natural = bool(f0.natural)
    g = np.zeros(B.n, dtype=np.int64)
    for d, f in enumerate(fmts):
        (s0, s1) = ranges[d]
        col0 = int(spl[s0])
        nd = int(spl[s1] - spl[s0])
        if f.natural:
            # natural shard: out flat prefix IS its natural y slice
            eidx = np.arange(nd, dtype=np.int64)
        else:
            sub = np.asarray(f.exit_wi, dtype=np.int64)
            lane = np.asarray(f.exit_lane, dtype=np.int64)
            chunk_old = lane // ns
            slot = lane % ns
            ci = np.searchsorted(np.asarray(f.offs), chunk_old,
                                 side="right") - 1
            chunk_new = (np.asarray([offs[c] for c in range(C)])[ci]
                         + (chunk_old - np.asarray(f.offs)[ci]))
            eidx = sub * (Ts * ns) + chunk_new * ns + slot
        g[col0:col0 + nd] = d * osz + eidx
    exit_plan = wg.pack_permute(g, ndev * osz)
    exit_kind = "permute"
    if exit_plan is None:
        exit_plan = wg.pack_clos(g, ndev * osz, max_w=pk3.MAX_NWIN)
    if exit_plan is None:
        exit_plan = mp.pack_multipass(g, ndev * osz)
        exit_kind = "multipass"
    if exit_plan is None:
        return None

    return Sharded3(
        m=B.m, n=B.n, ndev=ndev, Ts=Ts, ws=f0.ws, offs=offs,
        scan_steps=scan_steps, identities=f0.identities, nwins=nwins,
        nwin=nwin, has_scan=has_scan, natural=natural, ng=ng, ns=ns,
        osz=osz, exit_kind=exit_kind, vals=tuple(vals), meta=meta,
        xtile=xtile, nslots=nslots, straddle=straddle, gseg=gseg,
        ends=ends, exit_plan=exit_plan,
    )


def place3(sfmt: Sharded3, mesh: Mesh, axis: str = "d") -> Sharded3:
    """Place the [D, ...] leaves shard-per-device on the mesh (the exit
    plan stays replicated — it runs on the gathered output)."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    def put_rep(tree):
        return jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree)

    return dataclasses.replace(
        sfmt,
        vals=tuple(put(v) for v in sfmt.vals),
        meta=put(sfmt.meta),
        xtile=put(sfmt.xtile),
        nslots=put(sfmt.nslots),
        straddle=put(sfmt.straddle),
        gseg=put(sfmt.gseg) if sfmt.gseg is not None else None,
        ends=put(sfmt.ends) if sfmt.ends is not None else None,
        exit_plan=put_rep(sfmt.exit_plan),
    )


def _template(sfmt: Sharded3) -> pk3.StreamFormat3:
    """Static-field template for the per-device one-shot call (the
    kernel builder reads only static fields; data arrives as call
    arguments)."""
    z = np.zeros(0, np.float32)
    return pk3.StreamFormat3(
        ws=sfmt.ws, offs=sfmt.offs, scan_steps=sfmt.scan_steps,
        identities=sfmt.identities, nwins=sfmt.nwins, nwin=sfmt.nwin,
        num_chunks=sfmt.Ts, has_straddle=True, has_scan=sfmt.has_scan,
        m=sfmt.m, n=0, X=sfmt.Ts * sfmt.ns, natural=sfmt.natural,
        ng=sfmt.ng, ns=sfmt.ns, entry_mode="reshape",
        vals=(z,), meta_nat=z, meta_slot=z, xtile_nat=z, xtile_slot=z,
        nslots=z, straddle=z, gseg=None, ends=None, exit_plan=None,
        exit_idx=None, exit_wi=None, exit_lane=None, entry_plan=None,
        entry_gidx=None, entry_mask=None,
    )


def _apply_exit(plan, flat):
    if isinstance(plan, mp.MultipassPlan):
        return mp.apply_multipass(plan, flat)
    return wg.apply_permute(plan, flat)


def dist_tr_spmv_oneshot3(sfmt: Sharded3, x: jax.Array, mesh: Mesh,
                          axis: str = "d", alpha=None) -> jax.Array:
    """y = alpha * A.T @ x over the mesh: stripes sharded, x
    replicated, each device runs the nat-mode one-shot on its column
    slice; shard outputs assemble into natural y through one global
    windowed permute."""
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

    call = pk3._oneshot_call(tmpl, Rb * 1024, nat_rows)

    def local(vals, meta, xtile, nslots, straddle, gseg, ends, xin):
        args = [meta[0]]
        if sfmt.has_scan:
            args += [gseg[0], ends[0]]
        args += [v[0] for v in vals]
        args.append(xin)
        out = call(xtile[0], ab, nslots[0], straddle[0], *args)
        return out.reshape(1, sfmt.osz)

    spec_d = P(axis)
    in_specs = (tuple(spec_d for _ in sfmt.vals), spec_d, spec_d,
                spec_d, spec_d,
                spec_d if sfmt.has_scan else P(),
                spec_d if sfmt.has_scan else P(), P())
    dummy = jnp.zeros((sfmt.ndev, 1, 1), jnp.int32)
    y = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axis),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(sfmt.vals, sfmt.meta, sfmt.xtile, sfmt.nslots, sfmt.straddle,
      sfmt.gseg if sfmt.gseg is not None else dummy,
      sfmt.ends if sfmt.ends is not None else dummy, xin)
    return _apply_exit(sfmt.exit_plan, y.reshape(-1))
