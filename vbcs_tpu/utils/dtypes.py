"""Dtype promotion rules for sparse kernels.

The reference supports non-float semirings (Bool and Int32 matrices,
``test/runtests.jl:15-16`` with the Bool SIMD shim ``src/hacks.jl:1``).
Julia's Bool arithmetic promotes to Int (true + true == 2); we adopt the
same accumulation rule so bool matrices count path multiplicities rather
than saturating.
"""

import numpy as np

__all__ = ["acc_dtype"]


def acc_dtype(a, b):
    """Accumulator dtype for products of dtypes ``a`` and ``b``."""
    t = np.result_type(a, b)
    if t == np.bool_:
        return np.dtype(np.int64)
    return t
