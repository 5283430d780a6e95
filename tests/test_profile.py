"""Roofline accounting helpers (SURVEY §5 observability analog)."""

import numpy as np
import scipy.sparse as sp

import vbcs_tpu as v
from vbcs_tpu.ops import pallas_trspmv2 as pk2
from vbcs_tpu.utils import profile as prof


def test_stream_bytes_and_roofline():
    A = sp.random(2000, 1500, 0.01, random_state=1, format="csc")
    B = v.vbc1d(A, 4)
    fmt = pk2.pack_stream2(B)
    b = prof.stream_bytes(fmt)
    expect = sum(
        c.val_i.size * 4 + c.row_i.size * 4 + c.gseg.size * 4
        for c in fmt.classes
    )
    if fmt.fallback is not None:
        expect += sum(
            c.val.size * 4 + c.row.size * 4 for c in fmt.fallback.classes
        )
    assert b == expect + 4 * (fmt.m + fmt.n)
    r = prof.roofline(fmt, measured_s=2 * b / prof.hbm_bandwidth())
    assert 0.49 < r.fraction < 0.51
    assert "% of roofline" in str(r)


def test_hbm_table_has_known_generations():
    class FakeDev:
        device_kind = "TPU v5 lite"

    assert prof.hbm_bandwidth(FakeDev()) == 819e9
