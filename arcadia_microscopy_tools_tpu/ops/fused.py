"""Fused classical-segmentation frontend: DoG -> rescale -> threshold as ONE
histogram pass.

The reference pipeline (`src/arcadia_microscopy_tools/operations.py:57-97`
difference-of-Gaussians background subtraction, `:10-54` percentile rescale,
`:135-216` global threshold) computes, per image: a sort for the percentiles,
a full rescale pass, and a histogram for the threshold. On TPU the sort alone
costs ~16 ms at 2048^2.

Observation: once the DoG output is quantized to 16 bits (far below noise -
the plate path already quantizes before thresholding), BOTH the percentile
rescale and the histogram threshold are functions of one 65536-bin histogram:

- np.percentile's linear interpolation needs two order statistics, which drop
  out of the histogram's cumulative sum exactly;
- the rescale is a monotone affine clip, so the rescaled image's histogram is
  a pushforward of the original histogram (a 65536-element remap, not an
  image pass);
- the final mask `rescaled > t` pulls back through the monotone map to a
  single comparison against the ORIGINAL image.

Net: one histogram (a bf16 one-hot matmul, ~5 ms) + one compare pass replace
sort + rescale + second histogram (~26 ms).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .filters import difference_of_gaussians
from .stats import histogram_int
from .threshold import (
    _isodata_from_hist,
    _minimum_from_hist,
    _otsu_from_hist,
    _triangle_from_hist,
    _yen_from_hist,
)

__all__ = ["fused_classical_mask", "HIST_THRESHOLD_METHODS"]

_BINS = 65536


def _mean_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    total = jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.sum(counts * centers) / total


HIST_THRESHOLD_METHODS = {
    "otsu": _otsu_from_hist,
    "isodata": _isodata_from_hist,
    "yen": _yen_from_hist,
    "triangle": _triangle_from_hist,
    "minimum": _minimum_from_hist,
    "mean": _mean_from_hist,
}


def _order_statistic(cum: jax.Array, k: jax.Array) -> jax.Array:
    """Value of the k-th (0-indexed) order statistic from a cumulative
    histogram: the smallest bin whose cumulative count exceeds k."""
    return jnp.sum((cum < k + 1.0).astype(jnp.float32))


def _percentile_from_cum(cum: jax.Array, q: float, n: int) -> jax.Array:
    """np.percentile('linear') for integer-binned data, from the cumsum.

    The order-statistic position is static, so floor/frac are computed in
    Python float64: casting pos to float32 first would round it (float32
    spacing at 4M is 0.5), shifting the selected order statistic by one for
    2048^2-and-larger images and breaking the exact np.percentile match.
    """
    import math

    pos = q / 100.0 * (n - 1)
    k_i = math.floor(pos)
    frac = jnp.float32(pos - k_i)
    k = jnp.float32(k_i)
    v0 = _order_statistic(cum, k)
    v1 = _order_statistic(cum, jnp.minimum(k + 1, n - 1))
    return v0 + frac * (v1 - v0)


@partial(
    jax.jit,
    static_argnames=("low_sigma", "high_sigma", "percentile_range", "method"),
)
def fused_classical_mask(
    intensities: jax.Array,
    low_sigma: float = 1.0,
    high_sigma: float = 16.0,
    percentile_range: tuple[float, float] = (0.5, 99.9),
    method: str = "otsu",
) -> jax.Array:
    """Boolean foreground mask via DoG -> percentile rescale -> threshold,
    with the rescale and threshold both served by one histogram.

    Numerics: the DoG output is quantized to 65536 levels across its data
    range before the percentile/threshold logic (quantization step =
    range/65535, orders of magnitude below shot noise). Within that
    quantization the percentiles match np.percentile exactly and the
    threshold matches the skimage algorithm bin-for-bin.

    Args:
        intensities: (H, W) image (uint16 or float).
        low_sigma / high_sigma: DoG band-pass sigmas
            (reference operations.py:57-97).
        percentile_range: rescale percentiles (reference operations.py:10-54).
        method: any of HIST_THRESHOLD_METHODS (reference operations.py:135-216).

    Returns:
        (H, W) boolean mask.
    """
    if method not in HIST_THRESHOLD_METHODS:
        supported = ", ".join(HIST_THRESHOLD_METHODS)
        raise ValueError(
            f"fused_classical_mask supports histogram thresholds ({supported}); "
            f"got {method!r}"
        )
    dog = difference_of_gaussians(intensities, low_sigma, high_sigma)
    h, w = dog.shape
    n = h * w

    mn = jnp.min(dog)
    mx = jnp.max(dog)
    span = jnp.maximum(mx - mn, 1e-30)
    step = span / 65535.0
    q0 = jnp.clip(
        jnp.floor((dog - mn) / step), 0.0, 65535.0
    ).astype(jnp.uint16)

    counts, _ = histogram_int(q0, _BINS)
    cum = jnp.cumsum(counts)

    # percentile rescale endpoints, in quantized units
    p1 = _percentile_from_cum(cum, float(percentile_range[0]), n)
    p2 = _percentile_from_cum(cum, float(percentile_range[1]), n)
    scale = jnp.where(p2 > p1, 65535.0 / jnp.maximum(p2 - p1, 1e-30), 0.0)

    # pushforward: rescaled-quantized value of each original bin
    i = jnp.arange(_BINS, dtype=jnp.float32)
    j = jnp.floor(jnp.clip((i - p1) * scale, 0.0, 65535.0))
    hist2 = jnp.zeros((_BINS,), jnp.float32).at[j.astype(jnp.int32)].add(counts)

    t2 = HIST_THRESHOLD_METHODS[method](hist2, i)

    # pull the threshold back through the monotone map: mask = j(q0) > t2
    c0 = jnp.sum((j <= t2).astype(jnp.int32)) - 1  # largest bin with j <= t2
    mask = q0.astype(jnp.int32) > c0

    # degenerate (constant) images -> all background, as the reference's
    # apply_threshold does for constant inputs. The span check carries a
    # relative epsilon because a constant source reaches this point with
    # ~1e-8 of per-pixel matmul rounding, not an exactly-equal field; 1e-7
    # of the data magnitude is far below one uint16 count of real contrast.
    tol = 1e-7 * jnp.maximum(1.0, jnp.maximum(jnp.abs(mn), jnp.abs(mx)))
    return jnp.where(mx - mn > tol, mask, jnp.zeros_like(mask))
