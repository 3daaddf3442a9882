"""Core preprocessing operations as traceable device functions.

Behavioral twins of the reference ops (`src/arcadia_microscopy_tools/
operations.py:10-132`): percentile contrast stretching, difference-of-
Gaussians background subtraction, and center cropping - but expressed as pure
jnp functions over (..., H, W) arrays so a whole plate batch can run as one
fused XLA program (vmap over the batch axis, shard_map over the mesh).

The degenerate-input branches (empty / constant image) are resolved with
`jnp.where` instead of Python control flow so they stay inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .filters import difference_of_gaussians
from .stats import percentile as _percentile

__all__ = ["rescale_by_percentile", "subtract_background_dog", "crop_to_center"]


def rescale_by_percentile(
    intensities: jax.Array,
    percentile_range: tuple[float, float] = (0, 100),
    out_range: tuple[float, float] = (0, 1),
) -> jax.Array:
    """Rescale image intensities using percentile-based contrast stretching.

    Maps the intensity values from the specified input percentile range to the
    output range (reference operations.py:10-54). Constant images map to
    ``out_range[0]``; empty images return zeros.

    Args:
        intensities: Input image array (any shape; percentiles are global).
        percentile_range: (min, max) percentiles for intensity scaling.
        out_range: (min, max) values of the output intensity range.

    Returns:
        Rescaled float32 image with intensities mapped to the output range.

    Raises:
        ValueError: If percentile_range values are invalid (checked eagerly -
            these are static configuration, not traced data).
    """
    if not (0 <= percentile_range[0] < percentile_range[1] <= 100):
        raise ValueError(
            f"Invalid percentile range: {percentile_range}. "
            f"Values must be in ascending order between 0 and 100."
        )

    x = jnp.asarray(intensities)
    if x.size == 0:
        return jnp.zeros(x.shape, dtype=jnp.float32)

    xf = x.astype(jnp.float32)
    p = _percentile(xf, jnp.asarray(percentile_range, dtype=jnp.float32))
    p1, p2 = p[0], p[1]
    o1, o2 = float(out_range[0]), float(out_range[1])

    clipped = jnp.clip(xf, p1, p2)
    scale = jnp.where(p2 > p1, (o2 - o1) / jnp.maximum(p2 - p1, 1e-30), 0.0)
    rescaled = (clipped - p1) * scale + o1

    # Constant-image check with a relative epsilon: device float filters are
    # per-pixel-rounded (the TPU band matmuls do not produce bitwise-equal
    # outputs for a constant input the way scipy's f64 correlate does), so a
    # constant source arrives here with a span of ~1e-8 rounding noise.
    # Anything below 1e-7 of the data magnitude is far beneath one uint16
    # count (1.5e-5 in [0,1] units), so no genuine image contrast is caught.
    mn, mx = jnp.min(xf), jnp.max(xf)
    tol = 1e-7 * jnp.maximum(1.0, jnp.maximum(jnp.abs(mn), jnp.abs(mx)))
    is_constant = (mx - mn) <= tol
    return jnp.where(is_constant, jnp.full_like(rescaled, o1), rescaled)


def subtract_background_dog(
    intensities: jax.Array,
    low_sigma: float = 0.6,
    high_sigma: float = 16.0,
    percentile: float = 0,
) -> jax.Array:
    """Difference-of-Gaussians feature enhancement with percentile background
    subtraction (reference operations.py:57-97).

    The input is converted to float in [0, 1] (uint16 / 65535, matching
    skimage's img_as_float contract inside difference_of_gaussians), band-pass
    filtered, then the `percentile`-th percentile of the filtered image is
    subtracted and negatives are clipped to zero.

    Args:
        intensities: Input image array (..., H, W).
        low_sigma: Std-dev of the smaller Gaussian (fine detail). Default 0.6.
        high_sigma: Std-dev of the larger Gaussian (background extent). Default 16.
        percentile: Percentile of the filtered image used as the background
            level (0-100). Default 0 (minimum).

    Returns:
        Background-subtracted float32 image, negatives clipped to zero.
    """
    if not (0 <= percentile <= 100):
        raise ValueError(f"Percentile must be between 0 and 100, got {percentile}")
    if low_sigma >= high_sigma:
        raise ValueError(
            f"low_sigma ({low_sigma}) must be smaller than high_sigma ({high_sigma})"
        )

    dog = difference_of_gaussians(intensities, low_sigma, high_sigma)
    background_level = _percentile(dog, jnp.float32(percentile))
    return jnp.clip(dog - background_level, 0.0, None)


def crop_to_center(
    intensities: jax.Array,
    output_shape: tuple[int, int],
) -> jax.Array:
    """Center-crop the last two axes to `output_shape`
    (reference operations.py:100-132). Static slicing - free under jit.
    """
    x = jnp.asarray(intensities)
    height, width = x.shape[-2:]
    crop_height, crop_width = output_shape

    crop_width = min(width, crop_width)
    crop_height = min(height, crop_height)

    left = (width - crop_width) // 2
    top = (height - crop_height) // 2

    return x[..., top : top + crop_height, left : left + crop_width]
