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
