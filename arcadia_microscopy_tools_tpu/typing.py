"""Array type aliases shared across the framework.

Mirrors the type vocabulary of the reference library
(`src/arcadia_microscopy_tools/typing.py:1-13`) and extends it with JAX-side
aliases: host-facing APIs speak NumPy dtypes (uint16 in, float64 out), while
device kernels speak ``jax.Array``.
"""

from __future__ import annotations

from typing import Union

import jax
import numpy as np
from numpy.typing import NDArray

# Host-side (NumPy) aliases - the public API dtype contract.
BoolArray = NDArray[np.bool_]
UByteArray = NDArray[np.uint8]
UInt16Array = NDArray[np.uint16]
Int64Array = NDArray[np.int64]
Float32Array = NDArray[np.float32]
Float64Array = NDArray[np.float64]

# Union type for arrays with numeric or boolean scalar types.
ScalarArray = Union[
    BoolArray, UByteArray, UInt16Array, Int64Array, Float32Array, Float64Array
]

# Device-side alias: any array living on a TPU chip (or traced inside jit).
DeviceArray = jax.Array

# Either side of the host<->device boundary.
AnyArray = Union[np.ndarray, jax.Array]
