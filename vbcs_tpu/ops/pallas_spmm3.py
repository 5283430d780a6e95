"""Pallas SpMM v3: Y = A.T @ X for dense RHS at the (val + X + Y) roofline.

BASELINE.json config 4 (k = 32/128 dense RHS columns).  Built on the v3
stream format (:mod:`vbcs_tpu.ops.pallas_trspmv3`): the exact 2-take
gather's A-tables are shared across RHS columns — per chunk the row
indices are decoded once and only the *window data* differs per column.
Single-width-class formats only (the caller falls back to the v2 SpMM
for mixed-width partitions); gathers use the format's natural-layout
meta (``meta_nat`` / ``xtile_nat``).

Traffic shape (the thing that matters at k = 128, where the RHS dwarfs
the value stream): per chunk each (vreg, window) streams a
``(KT, 8, 128)`` slab of the k-major RHS — X is read ~``2x`` total
(window over-read) and the value stream ``k / KT`` times, so for
``KT = 32`` total bytes are ~1.6x the (val + X + Y)-once roofline.

The per-column compute is a pure FMA accumulation (``acc += val * xg``)
— for 1xw blocks the MXU has no contraction to exploit (u = 1); dense
u x w tiles route to the MXU through the 2-D operator's einsum path
instead (``ops/xla.py tr_spmm`` on ``bin_vbc2d``, reference
``src/multiply_VBC.jl:104-189``).

Output is written k-major (``Yt [k, w, T*NS]`` slot planes); the final
[n, k] transpose is one XLA pass, reported in the bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_trspmv3 as pk3

__all__ = ["tr_spmm_pallas3", "KT"]

KT = 32  # RHS columns per pass


def _spmm3_kernel(w, nwin, scan_steps, identity, kt, ng, ns):
    nv = ng // 128

    def kernel(xtile_ref, nslots_ref, straddle_ref, val_ref, meta_ref,
               *rest):
        if identity:
            win_refs = rest[: nv * nwin]
            out_ref = rest[nv * nwin]
            carry = rest[nv * nwin + 1]
            gseg_ref = ends_ref = None
        else:
            gseg_ref, ends_ref = rest[0], rest[1]
            win_refs = rest[2 : 2 + nv * nwin]
            out_ref = rest[2 + nv * nwin]
            carry = rest[2 + nv * nwin + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        meta = meta_ref[...]
        lo = jax.lax.bitwise_and(meta, jnp.int32(127))
        dwin = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(meta, jnp.int32(7)), jnp.int32(7)
        )
        val = val_ref[...]

        if not identity:
            seg = gseg_ref[...]
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, ng), 1)
            sames = []
            k = 1
            for _ in range(scan_steps):
                sames.append((seg == pltpu.roll(seg, k, 1)) & (lane1 >= k))
                k *= 2
            ends_all = ends_ref[...]
            laneN = jax.lax.broadcasted_iota(jnp.int32, (w, ns), 1)
            nsl = nslots_ref[t]
        prev_str = jax.lax.select(
            t > 0, straddle_ref[jnp.maximum(t - 1, 0)],
            jnp.zeros((), jnp.int32))
        is_str = straddle_ref[t] == 1

        # decode per-vreg gather index planes once (shared across k)
        decoded = []
        for v_ in range(nv):
            lo_s = lo[:, v_ * 128:(v_ + 1) * 128]
            d_s = dwin[:, v_ * 128:(v_ + 1) * 128]
            m_s = meta[:, v_ * 128:(v_ + 1) * 128]
            Ads = [
                jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(m_s, jnp.int32(10 + 3 * dd)),
                    jnp.int32(7))
                for dd in range(nwin)
            ]
            decoded.append((lo_s, d_s, Ads))

        outs = []
        for kk in range(kt):
            xg_slices = []
            for v_ in range(nv):
                lo_s, d_s, Ads = decoded[v_]
                acc = jnp.zeros((8, 128), jnp.float32)
                for dd in range(nwin):
                    win = win_refs[v_ * nwin + dd][kk]
                    t0 = jnp.take_along_axis(win, Ads[dd], axis=0)
                    cand = jnp.take_along_axis(t0, lo_s, axis=1)
                    acc = jnp.where(d_s == dd, cand, acc) if nwin > 1 else cand
                xg_slices.append(acc)
            xg = jnp.concatenate(xg_slices, axis=1)
            prod = val * jnp.concatenate([xg] * w, axis=0)
            red = prod.reshape(w, 8, ng).sum(axis=1)  # [w, ng]
            if identity or scan_steps == 0:
                sc = red
                tot = red[:, :ns]
            else:
                sc = red
                k = 1
                for same in sames:
                    sc = sc + jnp.where(same, pltpu.roll(sc, k, 1), 0.0)
                    k *= 2
                wq = 8 if w == 1 else w
                parts = []
                for j in range(ns // 128):
                    ej = ends_all[:, j * 128:(j + 1) * 128]
                    ehi = jax.lax.shift_right_logical(ej, jnp.int32(7))
                    elo = jax.lax.bitwise_and(ej, jnp.int32(127))
                    elo_b = jnp.broadcast_to(elo, (wq, 128))
                    accp = jnp.zeros((wq, 128), jnp.float32)
                    for q in range(nv):
                        scq = sc[:, q * 128:(q + 1) * 128]
                        if wq != w:
                            scq = jnp.broadcast_to(scq, (wq, 128))
                        cand = jnp.take_along_axis(scq, elo_b, axis=1)
                        accp = jnp.where(
                            jnp.broadcast_to(ehi == q, (wq, 128)), cand, accp)
                    parts.append(accp[:w])
                tot = jnp.concatenate(parts, axis=1)
                tot = jnp.where(laneN < nsl, tot, 0.0)
            # carry chain per column
            laneC = jax.lax.broadcasted_iota(jnp.int32, (w, ns), 1)
            carry_vec = carry[kk * 8: kk * 8 + w, 0:1]
            nsl_t = nslots_ref[t]
            tot = tot + jnp.where(
                (laneC == 0) & (prev_str == 1) & (nsl_t > 0), carry_vec, 0.0)
            tail = sc[:, ng - 1: ng]
            carry_new = tail + jnp.where(
                (prev_str == 1) & (nsl_t == 0), carry_vec, 0.0)
            carry[kk * 8: kk * 8 + w, 0:1] = jnp.where(is_str, carry_new, 0.0)
            outs.append(tot)

        out_ref[...] = jnp.stack(outs, axis=0)  # [KT, w, ns]

    return kernel


def _xt_planes(fmt: pk3.StreamFormat3, X: jax.Array) -> jax.Array:
    """RHS [m, k] -> k-major buffer planes [k, 8, XL] (each column laid
    out exactly like the SpMV chain's natural x buffer: x[r] at
    ((r>>7)&7, (r>>10)*128 + (r&127)))."""
    XL, m = fmt.X, fmt.m
    k = X.shape[1]
    R = XL // 128
    Xp = jnp.zeros((R * 1024, k), jnp.float32).at[:m].set(
        X.astype(jnp.float32))
    return Xp.reshape(R, 8, 128, k).transpose(3, 1, 0, 2).reshape(k, 8, XL)


def tr_spmm_pallas3(fmt: pk3.StreamFormat3, X: jax.Array,
                    kt: int = KT) -> jax.Array:
    """Y = A.T @ X, [n, k] (k-tiled v3 stream SpMM; single-class fmt).

    Requires a ``mode="nat"`` pack: the RHS column planes are laid out
    in the tile-interleaved NATURAL layout, so the gather tables must
    target it (slot-mode formats' ``meta_nat`` aliases the slot meta
    since slot-only matching became the chain default)."""
    assert len(fmt.ws) == 1, "v3 SpMM runs single-width-class formats"
    assert fmt.entry_mode in ("reshape", "tile"), \
        "v3 SpMM needs natural gather tables: pack_stream3(B, mode='nat')"
    m, k = X.shape
    w, T, ng, ns = fmt.ws[0], fmt.num_chunks, fmt.ng, fmt.ns
    nwin = fmt.nwin
    identity = fmt.identities[0]
    scan_steps = fmt.scan_steps[0]
    nv = ng // 128
    kt = min(kt, max(1, k))
    k_pad = -(-k // kt) * kt
    if k_pad != k:
        X = jnp.concatenate([X, jnp.zeros((m, k_pad - k), X.dtype)], axis=1)
    win_specs = [
        pl.BlockSpec(
            (kt, 8, 128),
            (lambda v, d: (
                lambda g, xtile, *_: (0, 0, xtile[(g * nv + v) * nwin + d]
                                      // 128)
            ))(v, d),
            memory_space=pltpu.VMEM,
        )
        for v in range(nv)
        for d in range(nwin)
    ]
    in_specs = [
        pl.BlockSpec((8 * w, ng), lambda g, *_: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, ng), lambda g, *_: (0, g),
                     memory_space=pltpu.VMEM),
    ]
    args = [fmt.vals[0], fmt.meta_nat]
    if not identity:
        in_specs += [
            pl.BlockSpec((1, ng), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
        ]
        args += [fmt.gseg, fmt.ends]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=in_specs + win_specs,
        out_specs=pl.BlockSpec(
            (kt, w, ns), lambda g, *_: (0, 0, g), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8 * kt, 128), jnp.float32)],
    )
    call = pl.pallas_call(
        _spmm3_kernel(w, nwin, scan_steps, identity, kt, ng, ns),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kt, w, T * ns), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    y_tiles = []
    for k0 in range(0, k_pad, kt):
        Xt = _xt_planes(fmt, X[:, k0:k0 + kt])
        out = call(fmt.xtile_nat, fmt.nslots, fmt.straddle, *args,
                   *([Xt] * (nv * nwin)))  # [kt, w, T*ns]
        y_tiles.append(out)
    Yt = jnp.concatenate(y_tiles, axis=0)  # [k_pad, w, T*ns]
    if fmt.natural:
        Y = Yt.transpose(2, 1, 0).reshape(-1, k_pad)[: fmt.n]
    else:
        Y = Yt[:, fmt.exit_wi, fmt.exit_lane].T
    return Y[:, :k]
