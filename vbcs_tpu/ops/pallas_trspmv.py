"""Pallas TrSpMV — the TPU-native re-design of the reference's hot kernel
(`mul!(y, B', x)`, reference ``src/multiply_1DVBC.jl:90-180``).

Why a custom kernel: on TPU, XLA lowers gather/scatter/segment-sum to
~per-element loops (measured ~0.6 GB/s on this chip — 3 orders of
magnitude under HBM bandwidth), so the jnp path in
:mod:`vbcs_tpu.ops.xla` is correctness-only.  This kernel streams the
block values once at DMA rate and performs the per-stripe segmented
reduction on-chip.

Design (constraints discovered by probing Mosaic on this backend:
dynamic gathers limited to one vreg along the gather axis; dynamic lane
slices must be 128-aligned; no strided slices; MXU is bf16 unless
precision=HIGHEST):

* **Exact-width classes**: stripes grouped by exact width w (1..W), so
  no width padding in ``val`` and — crucially — each chunk's stripe
  outputs form a *contiguous natural-order y range*, making slot<->
  natural conversion piecewise-contiguous.
* **Transposed value stream** ``val_t [w, Q]``: lanes run along blocks
  (128 blocks/vreg), sublanes along the block row-slice.
* **Chunked grid**: each grid step consumes a chunk of ``CQ`` blocks
  covering at most ``NS = 128`` stripes (pack-time guarantee; chunks are
  padded with inert blocks).  Stripes may straddle chunks.
* **MXU one-hot segmented reduction**: per chunk, stripe totals
  ``[w, NS] = prod [w, CQ] @ S [CQ, NS]`` where ``S[q, s] = (seg_rel[q]
  == s)`` is built on-chip by an iota compare.  ``precision=HIGHEST``
  keeps f32 accuracy (exact for one-hot basis inputs).  This is the
  TPU answer to the reference's per-stripe SIMD accumulator loop.
* **Carry chain**: a stripe straddling a chunk boundary has its partial
  total zeroed (masked at lane ``s_last``) and carried in a VMEM
  scratch; the next chunk adds the carry into slot 0.  The grid is
  sequential ("arbitrary" dimension semantics), so the carry is exact.
* **Slot-space output** ``out [w, T * NS]``: chunk g owns the aligned
  slot block ``[g*NS, (g+1)*NS)``; every stripe's total lands in exactly
  one slot (the chunk where it ends).  Conversion to natural y order is
  a static permutation (pack-time); chained SpMV can stay in slot space.

``x`` is pre-gathered (``xg = x[row]``) outside the kernel for now — the
in-kernel windowed gather is the next optimization stage.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.vbc1d import VBC1D

__all__ = ["StreamClass", "StreamFormat", "pack_stream", "tr_spmv_pallas"]

NS = 128  # stripe slots per chunk (one lane-vreg of output)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val_t", "row", "seg_rel", "s_last", "straddle"],
    meta_fields=["w", "cq", "num_chunks", "num_stripes"],
)
@dataclasses.dataclass(frozen=True)
class StreamClass:
    """One exact-width class, chunked for the kernel."""

    w: int  # exact stripe width (static)
    cq: int  # blocks per chunk (static)
    num_chunks: int
    num_stripes: int
    val_t: jax.Array  # [w, T*cq] f32 — transposed block values
    row: jax.Array  # [T*cq] int32 — natural row index per block (pad: 0)
    seg_rel: jax.Array  # [T*cq, 1] int32 — slot in chunk (pad: NS)
    s_last: jax.Array  # [T] int32 — slot of last stripe in chunk
    straddle: jax.Array  # [T] int32 — 1 if chunk ends mid-stripe


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["classes", "y_perm", "y_scale"],
    meta_fields=["m", "n", "total_slots"],
)
@dataclasses.dataclass(frozen=True)
class StreamFormat:
    """Full stream format: per-width classes + the natural-order map."""

    m: int
    n: int
    total_slots: int  # sum over classes of T*NS*w (flattened slot space)
    classes: tuple  # tuple[StreamClass, ...]
    y_perm: jax.Array  # [n] int32 — natural j -> flat slot index
    y_scale: jax.Array  # [n] f32 — 1.0 (reserved for scaling variants)


def pack_stream(B: VBC1D, ns: int = NS, cq_cap: int = 4096,
                device: bool = True) -> StreamFormat:
    """Host-side packer: VBC1D -> chunked per-width streams.

    ``device=False`` returns the format with host (NumPy) arrays —
    callers that post-process the arrays (e.g. pack_stream2's fallback
    gather plans) avoid a device round trip through the TPU tunnel.

    Chunk rule: accumulate blocks stripe by stripe; cut when the chunk
    reaches ``cq`` blocks (straddle, with carry) or would exceed ``ns``
    stripes (pad remaining block lanes).  ``cq`` is chosen per class to
    keep chunks block-full: ns * mean-blocks-per-stripe, rounded to 128.
    """
    widths = B.Phi.widths()
    classes = []
    flat_base = 0
    y_perm = np.zeros(B.n, dtype=np.int64)

    for w in range(1, B.W + 1):
        stripes = np.flatnonzero(widths == w)
        if stripes.size == 0:
            continue
        nblocks = (B.pos[stripes + 1] - B.pos[stripes]).astype(np.int64)
        total_blocks = int(nblocks.sum())
        avg_d = max(1.0, total_blocks / stripes.size)
        cq = int(min(cq_cap, max(128, 128 * round(ns * avg_d / 128 + 0.5))))

        # Walk stripes, assigning blocks to chunks.
        chunks_val = []  # list of [w, cq] arrays
        chunks_row = []
        chunks_seg = []
        s_last_l, straddle_l = [], []
        cur_val = np.zeros((w, cq), dtype=np.float32)
        cur_row = np.zeros(cq, dtype=np.int32)
        cur_seg = np.full(cq, ns, dtype=np.int32)
        qpos = 0  # block lanes used in current chunk
        slot = 0  # next stripe slot in current chunk
        slot_of_stripe = []  # (chunk, slot) where each stripe ENDS

        def flush(straddled):
            nonlocal cur_val, cur_row, cur_seg, qpos, slot
            chunks_val.append(cur_val)
            chunks_row.append(cur_row)
            chunks_seg.append(cur_seg)
            # straddle-flush: the open stripe occupies slot `slot` (it has
            # not ended, so `slot` was not advanced); boundary-flush: the
            # last completed stripe sat at slot-1 (s_last unused then).
            s_last_l.append(slot if straddled else max(0, slot - 1))
            straddle_l.append(1 if straddled else 0)
            cur_val = np.zeros((w, cq), dtype=np.float32)
            cur_row = np.zeros(cq, dtype=np.int32)
            cur_seg = np.full(cq, ns, dtype=np.int32)
            qpos = 0
            slot = 0

        for si, l in enumerate(stripes):
            nb = int(nblocks[si])
            if slot >= ns or qpos >= cq:
                flush(False)  # chunk full at a stripe boundary
            vals = B.stripe_vals(int(l)).astype(np.float32)  # [nb, w]
            rows = B.idx[B.pos[l] : B.pos[l + 1]].astype(np.int32)
            taken = 0
            while taken < nb:
                room = cq - qpos
                take = min(room, nb - taken)
                cur_val[:, qpos : qpos + take] = vals[taken : taken + take].T
                cur_row[qpos : qpos + take] = rows[taken : taken + take]
                cur_seg[qpos : qpos + take] = slot
                qpos += take
                taken += take
                if qpos == cq and taken < nb:
                    flush(True)  # stripe continues in next chunk at slot 0
            slot_of_stripe.append((len(chunks_val), slot))  # ends in current
            slot += 1
        if qpos > 0 or slot > 0:
            flush(False)

        T = len(chunks_val)
        val_t = np.concatenate(chunks_val, axis=1)
        row = np.concatenate(chunks_row)
        seg_rel = np.concatenate(chunks_seg).reshape(-1, 1)

        # natural-order map: stripe si (class-local) -> slot (g, s); its w
        # columns j = Phi.spl[l] + delta map to flat slot index
        # flat_base + (g*ns + s)*w + delta.
        for si, l in enumerate(stripes):
            g, s = slot_of_stripe[si]
            j0 = int(B.Phi.spl[l])
            base = flat_base + (g * ns + s) * w
            y_perm[j0 : j0 + w] = base + np.arange(w)

        classes.append(
            StreamClass(
                w=w,
                cq=cq,
                num_chunks=T,
                num_stripes=int(stripes.size),
                val_t=val_t,
                row=row,
                seg_rel=seg_rel,
                s_last=np.asarray(s_last_l, dtype=np.int32),
                straddle=np.asarray(straddle_l, dtype=np.int32),
            )
        )
        flat_base += T * ns * w

    fmt = StreamFormat(
        m=B.m,
        n=B.n,
        total_slots=flat_base,
        classes=tuple(classes),
        y_perm=y_perm.astype(np.int32),
        y_scale=np.ones(B.n, dtype=np.float32),
    )
    return jax.device_put(fmt) if device else fmt


def _class_kernel(w: int, cq: int):
    """Kernel body for one class (w, cq static)."""

    def kernel(s_last_ref, straddle_ref, val_ref, xg_ref, seg_ref, out_ref, carry):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        prod = val_ref[...] * xg_ref[...]  # [w, cq] * [1, cq] broadcast
        S = (
            seg_ref[...]
            == jax.lax.broadcasted_iota(jnp.int32, (cq, NS), 1)
        ).astype(jnp.float32)
        totals = jax.lax.dot_general(
            prod,
            S,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [w, NS]

        lane = jax.lax.broadcasted_iota(jnp.int32, (w, NS), 1)
        # carry-in: previous chunk ended mid-stripe -> its continuation is
        # slot 0 here.
        prev_straddle = jax.lax.select(
            g > 0,
            straddle_ref[jnp.maximum(g - 1, 0)],
            jnp.zeros((), straddle_ref.dtype),
        )
        carry_in = jnp.where(
            (lane == 0) & (prev_straddle == 1), carry[:w, 0:1], 0.0
        )
        totals = totals + carry_in

        # carry-out: zero the partial at s_last and stash it.
        s_last = s_last_ref[g]
        is_straddle = straddle_ref[g] == 1
        sel = lane == s_last
        partial_col = jnp.sum(jnp.where(sel, totals, 0.0), axis=1, keepdims=True)
        new_carry = jnp.where(is_straddle, partial_col, 0.0)  # [w, 1]
        carry[:w, 0:1] = new_carry
        totals = jnp.where(sel & is_straddle, 0.0, totals)

        out_ref[...] = totals

    return kernel


def _run_class(c: StreamClass, xg: jax.Array) -> jax.Array:
    """Run the kernel for one class; returns slot-space totals [w, T*NS]."""
    w, cq, T = c.w, c.cq, c.num_chunks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # s_last, straddle
        grid=(T,),
        in_specs=[
            pl.BlockSpec((w, cq), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, 1), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (w, NS), lambda g, *_: (0, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return pl.pallas_call(
        _class_kernel(w, cq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w, T * NS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(c.s_last, c.straddle, c.val_t, xg.reshape(1, -1), c.seg_rel)


def tr_spmv_pallas(fmt: StreamFormat, x: jax.Array) -> jax.Array:
    """y = A.T @ x in natural order (slot-space kernel + static unpermute)."""
    outs = []
    for c in fmt.classes:
        xg = x[c.row]  # XLA pre-gather (optimization target: in-kernel)
        out = _run_class(c, xg.astype(jnp.float32))  # [w, T*NS]
        # flatten to slot space: slot (g*NS+s) has w values at
        # [(g*NS+s)*w + delta] -> transpose to [T*NS, w] then ravel.
        outs.append(out.T.reshape(-1))
    flat = jnp.concatenate(outs) if outs else jnp.zeros(0, jnp.float32)
    return flat[fmt.y_perm]
