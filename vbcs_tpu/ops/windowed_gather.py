"""Static permutation / gather via windowed Pallas lane-gathers.

XLA's gather lowers to a ~per-element loop on this TPU backend
(~0.6 GB/s measured), so any per-call permutation must be a kernel.
This utility applies a *static* index map ``out[i] = src[perm[i]]``
when the map is piecewise-local: each 1024-element output segment's
source indices must lie inside ``wblk <= MAX_WBLK`` aligned
1024-element windows of ``src``.  That holds for the slot->natural
maps produced by the VBC stream packers (slots are monotone within a
class, with bounded padding jumps) and for bounded-bandwidth row
permutations.

Output chunks of 8192 elements are stored chunk-column-major
(element ``e`` of chunk ``g`` at sublane ``e % 8``, lane ``e // 8``)
so that each (8, 128) vreg covers 1024 *consecutive* output elements
and gets its own source window — keeping window spans at the segment
scale rather than the chunk scale.

``pack_permute`` returns ``None`` when the map is not local enough —
callers then fall back to the XLA gather.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PermutePlan", "pack_permute", "apply_permute",
           "pad_plan_windows"]

CO = 8192  # output elements per grid step (8 vregs of 1024)
NV = 8  # vregs per chunk
MAX_WBLK = 6


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["local", "xtile", "valid"],
    meta_fields=["n_out", "src_len", "wblk", "num_chunks"],
)
@dataclasses.dataclass(frozen=True)
class PermutePlan:
    n_out: int
    src_len: int
    wblk: int
    num_chunks: int
    local: jax.Array  # [8, T*1024] int32 window-local source offsets
    xtile: jax.Array  # [T*NV] int32 per-vreg window base (1024-unit)
    valid: jax.Array  # [8, T*1024] f32 output mask


def pack_permute(perm: np.ndarray, src_len: int, mask=None):
    """Build a windowed-gather plan for ``out[i] = src[perm[i]]``.

    Prefers the Clos 3-take plan (conflict-free routed gather, ~2x the
    ladder's rate); falls back to the broadcast-ladder plan, then to
    None (caller uses an XLA gather).  ``mask`` (bool [n]) marks output
    positions to produce (others are zeroed)."""
    plan = pack_clos(np.asarray(perm, dtype=np.int64), src_len, mask=mask)
    if plan is not None:
        return plan
    if mask is None:
        return _pack_ladder(perm, src_len)
    return None


def pack_permute2d(perm2d: np.ndarray, mask2d: np.ndarray, src_len: int):
    """Clos plan producing a 2-D (8, N) buffer directly:
    ``out[s, l] = src[perm2d[s, l]]`` (N must be a multiple of 128).
    The masked cells are zero.  Locality bound: each (8, 128-lane)
    column window draws from <= MAX_WBLK aligned 1024-element source
    tiles.  Returns None when not routable."""
    perm2d = np.asarray(perm2d, dtype=np.int64)
    assert perm2d.shape[0] == 8 and perm2d.shape[1] % 128 == 0
    # interleave to the flat element order used by pack_clos segments:
    # element e of segment v sits at (s = e % 8, l = 128*v + e // 8)
    perm_flat = perm2d.T.reshape(-1)
    mask_flat = np.asarray(mask2d, dtype=bool).T.reshape(-1)
    return pack_clos(perm_flat, src_len, mask=mask_flat, layout="2d")


def _pack_ladder(perm: np.ndarray, src_len: int) -> PermutePlan | None:
    """Broadcast-ladder windowed-gather plan (legacy fallback)."""
    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    T = max(1, -(-n // CO))
    pp = np.zeros(T * CO, dtype=np.int64)
    pp[:n] = perm
    vmask = np.zeros(T * CO, dtype=np.float32)
    vmask[:n] = 1.0

    # segment = 1024 consecutive outputs = one vreg; each segment gets
    # up to MAX_WBLK *independent* aligned 1024-element source tiles
    # (weaker than a contiguous-span bound; fewer windows for banded maps)
    nseg = T * NV
    seg_vals = pp.reshape(nseg, 1024)
    seg_mask = vmask.reshape(nseg, 1024) > 0
    seg_id = np.broadcast_to(np.arange(nseg)[:, None], seg_vals.shape)
    tiles = seg_vals >> 10
    ntile_tot = int(tiles.max(initial=0)) + 1
    pair = (seg_id.astype(np.int64) * ntile_tot + tiles)[seg_mask]
    uniq = np.unique(pair)
    uv = uniq // ntile_tot
    ut = uniq % ntile_tot
    counts = np.bincount(uv, minlength=nseg)
    wblk = int(max(1, counts.max(initial=1)))
    if wblk > MAX_WBLK:
        return None
    start = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(counts, out=start[1:])
    d_of_uniq = np.arange(uniq.size) - start[uv]
    xtile = np.zeros((nseg, wblk), dtype=np.int32)
    xtile[uv, d_of_uniq] = ut
    xtile = xtile.reshape(-1)  # [nseg*wblk]

    pair_full = seg_id.astype(np.int64) * ntile_tot + tiles
    u_idx = np.minimum(np.searchsorted(uniq, pair_full), max(uniq.size - 1, 0))
    d_seg = np.where(seg_mask, d_of_uniq[u_idx] if uniq.size else 0, 0)
    local_seg = np.where(
        seg_mask, d_seg * 1024 + (seg_vals & 1023), 0
    ).astype(np.int32)

    # chunk-column-major placement: element e of chunk g ->
    # (sublane e % 8, lane g*1024 + e // 8); within segment v of chunk g,
    # e = v*1024 + t  ->  sublane t' = e % 8, lane = g*1024 + v*128 + ...
    local = np.zeros((8, T * 1024), dtype=np.int32)
    valid = np.zeros((8, T * 1024), dtype=np.float32)
    e_idx = np.arange(CO)
    sub = e_idx % 8
    lane = e_idx // 8
    for g in range(T):
        vals_g = np.concatenate(
            [local_seg[g * NV + v] for v in range(NV)]
        )  # [CO] in element order
        mask_g = vmask[g * CO : (g + 1) * CO]
        local[sub, g * 1024 + lane] = vals_g
        valid[sub, g * 1024 + lane] = mask_g
    return jax.device_put(
        PermutePlan(
            n_out=int(n),
            src_len=int(src_len),
            wblk=wblk,
            num_chunks=int(T),
            local=local,
            xtile=xtile,
            valid=valid,
        )
    )


def pad_plan_windows(plan, wblk_new: int):
    """Pad a plan's window count to ``wblk_new`` (no-op when already
    there).  Padded windows are never selected — ClosPlan's WID /
    PermutePlan's window-id field only reference real windows — and
    their bases alias window 0 (in-bounds).  Used to shape-normalize
    per-device plans so they stack into one [D, ...] pytree for
    ``shard_map``."""
    if plan is None or plan.wblk == wblk_new:
        return plan
    assert plan.wblk < wblk_new
    nseg = plan.num_chunks * NV
    xt = np.asarray(plan.xtile).reshape(nseg, plan.wblk)
    xt2 = np.concatenate(
        [xt, np.repeat(xt[:, :1], wblk_new - plan.wblk, axis=1)], axis=1
    ).reshape(-1)
    if isinstance(plan, ClosPlan):
        meta = np.asarray(plan.meta)
        pad = np.zeros((wblk_new - plan.wblk,) + meta.shape[1:], meta.dtype)
        on_host = isinstance(plan.meta, np.ndarray)
        meta2 = np.concatenate([meta, pad], axis=0)
        return dataclasses.replace(
            plan, wblk=wblk_new,
            xtile=xt2 if on_host else jnp.asarray(xt2),
            meta=meta2 if on_host else jnp.asarray(meta2))
    return dataclasses.replace(plan, wblk=wblk_new, xtile=jnp.asarray(xt2))


def _permute_kernel(wblk: int):
    def kernel(xtile_ref, local_ref, valid_ref, *rest):
        win_refs = rest[: NV * wblk]
        out_ref = rest[NV * wblk]
        local = local_ref[...]  # [8, 1024]
        hi = jax.lax.shift_right_logical(local, jnp.int32(7))
        lo = jax.lax.bitwise_and(local, jnp.int32(127))
        parts = []
        valid = valid_ref[...]
        for v_ in range(NV):
            lo_s = lo[:, v_ * 128 : (v_ + 1) * 128]
            hi_s = hi[:, v_ * 128 : (v_ + 1) * 128]
            acc = jnp.zeros((8, 128), jnp.float32)
            for wi_ in range(wblk):
                wv = win_refs[v_ * wblk + wi_][...]
                for s in range(8):
                    tbl = jnp.broadcast_to(wv[s : s + 1, :], (8, 128))
                    cand = jnp.take_along_axis(tbl, lo_s, axis=1)
                    acc = jnp.where(hi_s == wi_ * 8 + s, cand, acc)
            acc = acc * valid[:, v_ * 128 : (v_ + 1) * 128]
            # (sub, lane) holds element v_*1024 + lane*8 + sub of this
            # chunk; transpose so the [128, 8] store is flat in element
            # order — no XLA transpose pass after the kernel.
            parts.append(acc.T)
        out_ref[...] = jnp.concatenate(parts, axis=0)  # [1024, 8]

    return kernel


def apply_permute(plan, src: jax.Array) -> jax.Array:
    """out[i] = src[perm[i]] (f32), shape [n_out]."""
    if isinstance(plan, ClosPlan):
        return apply_clos(plan, src)
    T, wblk = plan.num_chunks, plan.wblk
    rows = -(-plan.src_len // 1024) * 8 + 8 * max(MAX_WBLK, wblk)
    sp = jnp.zeros(rows * 128, jnp.float32).at[: plan.src_len].set(
        src.astype(jnp.float32)
    )
    s2d = sp.reshape(rows, 128)
    win_specs = [
        pl.BlockSpec(
            (8, 128),
            (
                lambda v, d: (
                    lambda g, xtile: (xtile[(g * NV + v) * wblk + d], 0)
                )
            )(v, d),
            memory_space=pltpu.VMEM,
        )
        for v in range(NV)
        for d in range(wblk)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, 1024), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1024), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            *win_specs,
        ],
        out_specs=pl.BlockSpec(
            (1024, 8), lambda g, *_: (g, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _permute_kernel(wblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * 1024, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(plan.xtile, plan.local, plan.valid, *([s2d] * (NV * wblk)))
    # transposed store: flat order is already element order
    return out.reshape(-1)[: plan.n_out]


# --------------------------------------------------------------------------
# Clos 3-take gather — the fast path behind pack_permute.
#
# Any map from an aligned (8, 128) source window into an output vreg
# factors as take_axis0 -> take_axis1 -> take_axis0 (a 3-stage Clos
# network: spread within source columns, route along lanes, collect
# within output columns).  Routing is computed at pack time: each
# distinct source element gets one or more "spread rows" r such that
# (a) cells A0[r, src_col] are consistent and (b) elements co-needed in
# an output column hold distinct r.  Duplicates ride the take_axis1
# stage for free.  This replaces the 8-step broadcast ladder (~1.4 us
# -> ~0.2 us per 8192-element chunk measured on v5e).
#
# Meta: ONE int32 [8, 128] plane per (vreg, window):
#   bits 0-2   A0[r, p]   source sublane spread to row r at lane p
#   bits 3-9   L1[r, l]   lane of the window element routed to (r, l)
#   bits 10-12 A2[s, l]   spread row consumed by output (s, l)
#   bits 13-15 WID[s, l]  window id of output (s, l) (plane 0 only)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["meta", "xtile", "valid"],
    meta_fields=["n_out", "src_len", "wblk", "num_chunks", "layout"],
)
@dataclasses.dataclass(frozen=True)
class ClosPlan:
    n_out: int
    src_len: int
    wblk: int
    num_chunks: int
    meta: jax.Array  # [wblk, 8, T*1024] int32
    xtile: jax.Array  # [T*NV*wblk] int32 window base tile (1024-unit)
    valid: jax.Array  # [8, T*1024] f32 output mask
    layout: str = "flat"  # "flat" -> [n_out]; "2d" -> (8, T*1024) buffer


def pack_clos(perm: np.ndarray, src_len: int,
              max_w: int = MAX_WBLK, mask=None,
              layout: str = "flat",
              device: bool = True) -> "ClosPlan | None":
    """Clos-routed plan for ``out[i] = src[perm[i]]`` (any index map).
    ``device=False`` keeps the plan's arrays on host (numpy) — for
    callers like pack_multipass that assemble several plans and ship
    ONE device_put at the end (each put is a tunnel round trip)."""
    perm = np.asarray(perm, dtype=np.int64)
    n = perm.size
    T = max(1, -(-n // CO))
    pp = np.zeros(T * CO, dtype=np.int64)
    pp[:n] = perm
    vmask = np.zeros(T * CO, dtype=np.float32)
    if mask is None:
        vmask[:n] = 1.0
    else:
        vmask[:n] = np.asarray(mask, dtype=np.float32)
        pp[:n] = np.where(np.asarray(mask, dtype=bool), pp[:n], 0)

    nseg = T * NV
    seg_vals = pp.reshape(nseg, 1024)
    seg_mask = vmask.reshape(nseg, 1024) > 0

    # vectorized feasibility pre-check: a segment needing more distinct
    # source tiles than max_w can never route — bail before the
    # (per-element Python) routing loop
    tiles_chk = np.where(seg_mask, seg_vals >> 10, -1)
    ntile_tot = int(tiles_chk.max(initial=0)) + 2
    pair = np.arange(nseg)[:, None] * ntile_tot + (tiles_chk + 1)
    uniq_seg = np.unique(pair[seg_mask]) // ntile_tot
    if np.bincount(uniq_seg, minlength=nseg).max(initial=0) > max_w:
        return None

    # C++ fast path (exact port of the loop below; parity-tested)
    from ..native import clos_route_native

    routed = clos_route_native(seg_vals, seg_mask, max_w)
    if routed is False:
        return None
    if routed is not None:
        planes_all, xtiles_n, nwin_seg = routed
        wblk = max(1, int(nwin_seg.max(initial=1)))
        meta = np.ascontiguousarray(
            planes_all[:, :wblk].transpose(1, 2, 0, 3).reshape(
                wblk, 8, T * 1024))
        valid = np.ascontiguousarray(
            vmask.reshape(T, 1024, 8).transpose(2, 0, 1).reshape(
                8, T * 1024))
        plan = ClosPlan(
            n_out=int(n), src_len=int(src_len), wblk=int(wblk),
            num_chunks=int(T),
            meta=meta, xtile=xtiles_n[:, :wblk].reshape(-1),
            valid=valid, layout=layout,
        )
        return jax.device_put(plan) if device else plan

    metas = []  # per vreg: list of [8,128] int32 planes
    xtiles = np.zeros((nseg, max_w), dtype=np.int32)
    wblk_all = 1
    for v in range(nseg):
        vals = seg_vals[v]
        msk = seg_mask[v]
        # element e (0..1023) at out (s=e%8, l=e//8)
        windows = []  # (tile, A0[8][128], reg: elem -> [r], usedA0 count)
        A2 = np.zeros((8, 128), dtype=np.int64)
        WID = np.zeros((8, 128), dtype=np.int64)
        ok = True
        for l in range(128):
            if not ok:
                break
            es = [l * 8 + s for s in range(8) if msk[l * 8 + s]]
            if not es:
                continue
            used_r_by_win = {}
            for e in es:
                tgt = int(vals[e])
                tile, hi, lo = tgt >> 10, (tgt >> 7) & 7, tgt & 127
                placed = False
                for wi, (wtile, A0, L1, regs) in enumerate(windows):
                    if wtile != tile:
                        continue
                    used = used_r_by_win.setdefault(wi, {})
                    # reuse a registration not yet used in this column
                    for r in regs.get((hi, lo), ()):   
                        if r not in used or used[r] == (hi, lo):
                            if r in used and used[r] != (hi, lo):
                                continue
                            if L1[r][l] in (-1, lo):
                                L1[r][l] = lo
                                A2[e % 8, l] = r
                                WID[e % 8, l] = wi
                                used[r] = (hi, lo)
                                placed = True
                                break
                    if placed:
                        break
                    # new registration in a free row
                    for r in range(8):
                        if r in used and used[r] != (hi, lo):
                            continue
                        if A0[r][lo] in (-1, hi) and L1[r][l] in (-1, lo):
                            A0[r][lo] = hi
                            L1[r][l] = lo
                            regs.setdefault((hi, lo), []).append(r)
                            A2[e % 8, l] = r
                            WID[e % 8, l] = wi
                            used[r] = (hi, lo)
                            placed = True
                            break
                    if placed:
                        break
                if not placed:
                    if len(windows) >= max_w:
                        ok = False
                        break
                    A0 = np.full((8, 128), -1, dtype=np.int64)
                    L1 = np.full((8, 128), -1, dtype=np.int64)
                    windows.append((tile, A0, L1, {}))
                    wi = len(windows) - 1
                    used = used_r_by_win.setdefault(wi, {})
                    r = next(rr for rr in range(8) if rr not in used)
                    A0[r][lo] = hi
                    L1[r][l] = lo
                    windows[wi][3][(hi, lo)] = [r]
                    A2[e % 8, l] = r
                    WID[e % 8, l] = wi
                    used[r] = (hi, lo)
        if not ok:
            return None
        if not windows:
            windows.append((0, np.full((8, 128), -1, np.int64),
                            np.full((8, 128), -1, np.int64), {}))
        planes = []
        for wi, (wtile, A0, L1, _) in enumerate(windows):
            plane = (np.maximum(A0, 0)
                     | (np.maximum(L1, 0) << 3)).astype(np.int64)
            if wi == 0:
                plane = plane | (A2 << 10) | (WID << 13)
            planes.append(plane.astype(np.int32))
            xtiles[v, wi] = wtile
        for wi in range(len(windows), max_w):
            xtiles[v, wi] = windows[0][0]
        wblk_all = max(wblk_all, len(windows))
        metas.append(planes)

    wblk = wblk_all
    meta = np.zeros((wblk, 8, T * 1024), dtype=np.int32)
    for v in range(nseg):
        g, vv = divmod(v, NV)
        col = g * 1024 + vv * 128
        for wi, plane in enumerate(metas[v]):
            meta[wi, :, col:col + 128] = plane
    valid = np.zeros((8, T * 1024), dtype=np.float32)
    e_idx = np.arange(CO)
    for g in range(T):
        valid[e_idx % 8, g * 1024 + e_idx // 8] = vmask[g * CO:(g + 1) * CO]
    plan = ClosPlan(
        n_out=int(n), src_len=int(src_len), wblk=int(wblk),
        num_chunks=int(T), meta=meta, xtile=xtiles[:, :wblk].reshape(-1),
        valid=valid, layout=layout,
    )
    return jax.device_put(plan) if device else plan


def _clos_kernel(wblk: int, layout: str = "flat"):
    def kernel(xtile_ref, valid_ref, meta_ref, *rest):
        win_refs = rest[: NV * wblk]
        out_ref = rest[NV * wblk]
        valid = valid_ref[...]
        meta = meta_ref[...]  # [wblk, 8, 1024]
        m0 = meta[0]
        if layout == "tiles":
            # constant in-vreg shuffle (s, l) -> natural flat l*8 + s:
            # lane permute idx1 then 3 Eklundh butterfly stages (same
            # pattern as the v3 nat store, pallas_trspmv3 _oneshot)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            idx1 = (16 * jax.lax.bitwise_and(lane_i, jnp.int32(7))
                    + jax.lax.shift_right_logical(lane_i, jnp.int32(3)))
            ek_masks = []
            for s in (4, 2, 1):
                a_sw = (jax.lax.bitwise_and(sub_i, jnp.int32(s)) == 0) & (
                    jax.lax.bitwise_and(lane_i, jnp.int32(s)) != 0)
                b_sw = (jax.lax.bitwise_and(sub_i, jnp.int32(s)) != 0) & (
                    jax.lax.bitwise_and(lane_i, jnp.int32(s)) == 0)
                ek_masks.append((s, a_sw, b_sw))
        parts = []
        for v_ in range(NV):
            m0v = m0[:, v_ * 128:(v_ + 1) * 128]
            A2 = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(m0v, jnp.int32(10)), jnp.int32(7))
            WIDv = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(m0v, jnp.int32(13)), jnp.int32(7))
            acc = jnp.zeros((8, 128), jnp.float32)
            for wi in range(wblk):
                mv = m0v if wi == 0 else meta[wi][:, v_ * 128:(v_ + 1) * 128]
                A0 = jax.lax.bitwise_and(mv, jnp.int32(7))
                L1 = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(mv, jnp.int32(3)),
                    jnp.int32(127))
                win = win_refs[v_ * wblk + wi][...]
                t0 = jnp.take_along_axis(win, A0, axis=0)
                t1 = jnp.take_along_axis(t0, L1, axis=1)
                c = jnp.take_along_axis(t1, A2, axis=0)
                acc = jnp.where(WIDv == wi, c, acc) if wblk > 1 else c
            acc = acc * valid[:, v_ * 128:(v_ + 1) * 128]
            if layout == "tiles":
                u = jnp.take_along_axis(acc, idx1, axis=1)
                for s, a_sw, b_sw in ek_masks:
                    ua = pltpu.roll(pltpu.roll(u, 8 - s, 0), s, 1)
                    ub = pltpu.roll(pltpu.roll(u, s, 0), 128 - s, 1)
                    u = jnp.where(a_sw, ua, jnp.where(b_sw, ub, u))
                out_ref[8 * v_:8 * (v_ + 1), :] = u
            else:
                parts.append(acc.T if layout == "flat" else acc)
        if layout == "flat":
            out_ref[...] = jnp.concatenate(parts, axis=0)  # [1024, 8]
        elif layout == "2d":
            out_ref[...] = jnp.concatenate(parts, axis=1)  # [8, 1024]

    return kernel


def apply_clos(plan: ClosPlan, src: jax.Array) -> jax.Array:
    """``layout="flat"``: out[i] = src[perm[i]] (f32), shape [n_out].
    ``layout="2d"``: the (8, T*1024) buffer with out[s, l] = src[perm2d[s, l]]."""
    T, wblk = plan.num_chunks, plan.wblk
    rows = -(-plan.src_len // 1024) * 8 + 8 * max(MAX_WBLK, wblk)
    sp = jnp.zeros(rows * 128, jnp.float32).at[: plan.src_len].set(
        src.astype(jnp.float32)
    )
    s2d = sp.reshape(rows, 128)
    out = _apply_clos_arrays(plan.xtile, plan.valid, plan.meta, s2d,
                             T, wblk, plan.layout, plan.n_out)
    if plan.layout == "tiles":
        return out.reshape(-1)[: plan.n_out]
    return out


def _apply_clos_arrays(xtile, valid, meta, s2d, T: int, wblk: int,
                       layout: str, n_out: int) -> jax.Array:
    """apply_clos core on raw arrays — also the ``lax.scan`` body for
    same-shape pass chains (``multipass.apply_multipass`` stacks the
    per-pass meta/xtile/valid and scans, so a 5-pass radix chain
    lowers to ONE Mosaic kernel instead of five)."""
    win_specs = [
        pl.BlockSpec(
            (8, 128),
            (
                lambda v, d: (
                    lambda g, xtile: (xtile[(g * NV + v) * wblk + d], 0)
                )
            )(v, d),
            memory_space=pltpu.VMEM,
        )
        for v in range(NV)
        for d in range(wblk)
    ]
    if layout == "flat":
        out_spec = pl.BlockSpec((1024, 8), lambda g, *_: (g, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T * 1024, 8), jnp.float32)
    elif layout == "tiles":
        # natural (8, 128)-window layout: element e of chunk g at
        # (row 8g*8 + e//128, lane e%128).  Full-lane stores (the
        # (1024, 8) flat store is 16 partial tiles per vreg), and the
        # output IS a valid window source for a following clos pass —
        # multipass chains with zero inter-pass relayout.
        out_spec = pl.BlockSpec((64, 128), lambda g, *_: (g, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T * 64, 128), jnp.float32)
    else:
        out_spec = pl.BlockSpec((8, 1024), lambda g, *_: (0, g),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8, T * 1024), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, 1024), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, 8, 1024), lambda g, *_: (0, 0, g),
                         memory_space=pltpu.VMEM),
            *win_specs,
        ],
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        _clos_kernel(wblk, layout),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(xtile, valid, meta, *([s2d] * (NV * wblk)))
    if layout == "flat":
        return out.reshape(-1)[: n_out]
    return out  # "2d": (8, T*1024); "tiles": (T*64, 128)
