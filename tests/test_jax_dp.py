"""Jittable lax.scan DP == NumPy/C++ DP (bitwise split points)."""

import numpy as np
import scipy.sparse as sp

from vbcs_tpu.formats.csc import CSC
from vbcs_tpu.models.cost import (
    ColumnBlockComponentCostModel,
    model_1dvbc_memory,
)
from vbcs_tpu.plan.dynamic import dp_partition
from vbcs_tpu.plan.jax_dp import dp_partition_jit


def test_jax_dp_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(4):
        m, n = int(rng.integers(20, 150)), int(rng.integers(20, 250))
        A = CSC.from_scipy(
            sp.random(m, n, 0.06, random_state=trial, format="csc")
        )
        for model in [
            model_1dvbc_memory(8, 8),
            ColumnBlockComponentCostModel(2.0, 1.5),
        ]:
            assert dp_partition_jit(A, model, 5) == dp_partition(A, model, 5)


def test_jit_2d_matches_numpy_dp():
    """Jittable 2-D column pass == NumPy/C++ DP under the same Pi."""
    import scipy.sparse as sp

    from vbcs_tpu.formats.partition import SplitPartition
    from vbcs_tpu.models.cost import BlockComponentCostModel, total_value
    from vbcs_tpu.plan.dynamic import dp_partition
    from vbcs_tpu.plan.jax_dp import dp_partition_jit_2d

    rng = np.random.default_rng(21)
    A = CSC.from_scipy(sp.random(120, 150, 0.08, random_state=21, format="csc"))
    Pi = SplitPartition.equi(A.m, 3)
    mdl = BlockComponentCostModel(
        alpha_row=2.0,
        alpha_col=np.array([5.0, 6.0, 8.0, 9.0]),
        beta_row=(np.array([1.0, 1.5, 2.0]),),
        beta_col=(np.array([1.0, 1.2, 1.7, 2.5]),),
    )
    want = dp_partition(A, mdl, 4, row_partition=Pi)
    got = dp_partition_jit_2d(A, mdl, 4, Pi=Pi)
    cv_want = total_value(A, want, mdl, Pi=Pi)
    cv_got = total_value(A, got, mdl, Pi=Pi)
    assert abs(cv_want - cv_got) < 1e-6 * max(1.0, abs(cv_want))
    np.testing.assert_array_equal(want.spl, got.spl)
