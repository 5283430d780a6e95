"""Per-kernel roofline accounting + profiler trace helpers.

The reference has no built-in tracing; measurement is external
(BenchmarkTools in ``src/costs.jl:87-94``, ``bin/test_table.jl:40``).
The TPU-native observability analog (SURVEY §5): account the bytes each
stream format must move, derive the HBM-roofline time on the local
device, and compare with measured time; plus a thin wrapper over
``jax.profiler`` for trace capture.
"""

from __future__ import annotations

import contextlib
import dataclasses

import numpy as np

__all__ = ["hbm_bandwidth", "stream_bytes", "roofline", "trace"]

_HBM_BY_KIND = {
    "v6": 1640e9,
    "v5p": 2765e9,
    "v5": 819e9,  # v5e / v5 lite
    "v4": 1228e9,
    "v3": 900e9,
    "v2": 700e9,
}


def hbm_bandwidth(device=None) -> float:
    """Peak HBM bytes/s for a device (conservative table by generation)."""
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _HBM_BY_KIND.items():
        if key in kind:
            return bw
    return 50e9  # host-memory ballpark for CPU runs


def stream_bytes(fmt) -> int:
    """Bytes one TrSpMV over a :class:`StreamFormat2` must move from HBM:
    interleaved values + row/segment metadata + x + y."""
    cls_bytes = sum(
        c.val_i.size * 4 + c.row_i.size * 4 + c.gseg.size * 4
        for c in fmt.classes
    )
    if fmt.fallback is not None:
        cls_bytes += sum(
            c.val.size * 4 + c.row.size * 4 for c in fmt.fallback.classes
        )
    return int(cls_bytes + 4 * (fmt.m + fmt.n))


@dataclasses.dataclass(frozen=True)
class Roofline:
    bytes_moved: int
    bandwidth: float
    ideal_s: float
    measured_s: float | None
    fraction: float | None  # ideal / measured

    def __str__(self):
        s = (
            f"{self.bytes_moved/1e6:.2f} MB @ {self.bandwidth/1e9:.0f} GB/s "
            f"-> ideal {self.ideal_s*1e6:.1f} us"
        )
        if self.measured_s is not None:
            s += (
                f"; measured {self.measured_s*1e6:.1f} us "
                f"({100*self.fraction:.0f}% of roofline)"
            )
        return s


def roofline(fmt, measured_s: float | None = None, device=None) -> Roofline:
    """Roofline report for a stream format (optionally vs a measurement)."""
    b = stream_bytes(fmt)
    bw = hbm_bandwidth(device)
    ideal = b / bw
    frac = (ideal / measured_s) if measured_s else None
    return Roofline(
        bytes_moved=b,
        bandwidth=bw,
        ideal_s=ideal,
        measured_s=measured_s,
        fraction=frac,
    )


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a ``jax.profiler`` trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
