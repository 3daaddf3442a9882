"""Image operations facade (reference module parity:
`src/arcadia_microscopy_tools/operations.py`).

Users of the reference can keep their imports:

    from arcadia_microscopy_tools_tpu.operations import (
        rescale_by_percentile, subtract_background_dog,
        crop_to_center, apply_threshold,
    )

All four are traceable device functions; wrap them in `ImageOperation`s and a
`Pipeline` to fuse them into one XLA program. At the host boundary the
reference dtype contract holds: NumPy in -> NumPy out, with floating results
upcast to float64 (operations.py:62,97 in the reference return float64);
inside jit (tracer in) results stay float32 on device.
"""

from __future__ import annotations

import functools

import numpy as np

from .ops import basic as _basic
from .ops import threshold as _threshold

__all__ = [
    "apply_threshold",
    "crop_to_center",
    "rescale_by_percentile",
    "subtract_background_dog",
]


def _host_boundary(fn):
    """NumPy in -> NumPy out (float64 for floating results); tracers/JAX
    arrays pass through untouched so the op remains fully fusable."""

    @functools.wraps(fn)
    def wrapper(intensities, *args, **kwargs):
        result = fn(intensities, *args, **kwargs)
        if isinstance(intensities, np.ndarray):
            host = np.asarray(result)
            if np.issubdtype(host.dtype, np.floating):
                host = host.astype(np.float64)
            return host
        return result

    return wrapper


rescale_by_percentile = _host_boundary(_basic.rescale_by_percentile)
subtract_background_dog = _host_boundary(_basic.subtract_background_dog)
crop_to_center = _basic.crop_to_center
apply_threshold = _host_boundary(_threshold.apply_threshold)
