"""Thresholding methods as jittable TPU kernels.

Re-implements the ten methods dispatched by the reference's `apply_threshold`
(`src/arcadia_microscopy_tools/operations.py:135-216`, backed there by
skimage.filters.threshold_*). All global methods run on device-side
histograms (sort + binary search, see ops/stats.py) and follow skimage's
published algorithms bin-for-bin, so integer-image thresholds are exact
matches; float images use the same 256-bin convention as skimage.

Global methods return a scalar threshold; local methods (local / niblack /
sauvola) return a threshold *image*. `apply_threshold` composes either into a
boolean mask and is safe to fuse into larger jitted pipelines.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .filters import box_filter, gaussian_filter, median_filter, window_mean_std
from .stats import histogram_float, histogram_int, integer_bin_count

__all__ = [
    "apply_threshold",
    "threshold_otsu",
    "threshold_isodata",
    "threshold_yen",
    "threshold_li",
    "threshold_mean",
    "threshold_minimum",
    "threshold_triangle",
    "threshold_local",
    "threshold_niblack",
    "threshold_sauvola",
]

# NumPy scalar, not jnp: a module-level jnp constant would initialize the
# JAX backend at import time, which breaks jax.distributed.initialize (it
# must run before any backend exists in multi-process deployments)
_NEG_INF = np.float32(-np.inf)


def _histogram_for(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    n = integer_bin_count(x.dtype)
    if n is not None:
        return histogram_int(x, n)
    return histogram_float(x, 256)


def _occupied_range_masks(counts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Boolean masks marking bins at-or-after the first nonzero count and
    at-or-before the last nonzero count.

    skimage trims its histogram to [image.min(), image.max()]; we keep static
    full-range bins and mask instead, which is jit-friendly and numerically
    identical.
    """
    nonzero = counts > 0
    after_first = jnp.cumsum(nonzero) > 0
    before_last = jnp.cumsum(nonzero[::-1])[::-1] > 0
    return after_first, before_last


# -- Global histogram thresholds ------------------------------------------------


def _otsu_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    """Otsu's method (between-class variance maximization).

    m2[i] must be the mean over bins j >= i (a reversed cumulative sum of
    the weighted counts), NOT (total - csum[i]) / w2[i], whose numerator
    excludes bin i while the denominator includes it - that off-by-one
    shifted the argmax on most bimodal histograms (round-3 audit vs the
    published algorithm / brute-force between-class variance).
    """
    w1 = jnp.cumsum(counts)
    w2 = jnp.cumsum(counts[::-1])[::-1]
    csum = jnp.cumsum(counts * centers)
    csum2 = jnp.cumsum((counts * centers)[::-1])[::-1]
    m1 = jnp.where(w1 > 0, csum / jnp.maximum(w1, 1e-30), 0.0)
    m2 = jnp.where(w2 > 0, csum2 / jnp.maximum(w2, 1e-30), 0.0)
    # candidate split between bin t and t+1
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    valid = (w1[:-1] > 0) & (w2[1:] > 0)
    var12 = jnp.where(valid, var12, _NEG_INF)
    idx = jnp.argmax(var12)
    return centers[idx]


def _isodata_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    """ISODATA (Ridler-Calvard) threshold: t such that t is midway between
    the means of the two classes it induces; returns the first crossing."""
    csuml = jnp.cumsum(counts)
    csumh = csuml[-1] - csuml
    csum_i = jnp.cumsum(counts * centers)
    total_i = csum_i[-1]
    lower = jnp.where(csuml[:-1] > 0, csum_i[:-1] / jnp.maximum(csuml[:-1], 1e-30), jnp.nan)
    higher = jnp.where(
        csumh[:-1] > 0, (total_i - csum_i[:-1]) / jnp.maximum(csumh[:-1], 1e-30), jnp.nan
    )
    all_mean = (lower + higher) / 2.0
    bin_width = centers[1] - centers[0]
    distances = all_mean - centers[:-1]
    ok = (distances >= 0) & (distances < bin_width)
    idx = jnp.argmax(ok)  # first True
    return centers[idx]


def _yen_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    """Yen's maximum correlation criterion."""
    pmf = counts / jnp.maximum(jnp.sum(counts), 1.0)
    p1 = jnp.cumsum(pmf)
    p1_sq = jnp.cumsum(pmf * pmf)
    p2_sq = jnp.cumsum((pmf * pmf)[::-1])[::-1]
    a = p1_sq[:-1]
    b = p2_sq[1:]
    c = p1[:-1] * (1.0 - p1[:-1])
    valid = (a > 0) & (b > 0)
    ratio = jnp.maximum(c * c, 1e-38) / jnp.maximum(a * b, 1e-38)
    crit = jnp.where(valid, jnp.log(ratio), _NEG_INF)
    idx = jnp.argmax(crit)
    return centers[idx]


def _triangle_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    """Triangle algorithm (Zack et al.): maximum distance from the line
    between the histogram peak and the far end of the occupied range."""
    nbins = counts.shape[0]
    idxs = jnp.arange(nbins, dtype=jnp.float32)
    after_first, before_last = _occupied_range_masks(counts)
    arg_low = jnp.argmax(after_first)  # first nonzero
    arg_high = nbins - 1 - jnp.argmax(before_last[::-1])  # last nonzero
    arg_peak = jnp.argmax(counts)
    peak_height = counts[arg_peak]

    # Flip so the long tail is always on the left of the peak.
    flip = (arg_peak - arg_low) < (arg_high - arg_peak)
    f_counts = jnp.where(flip, counts[::-1], counts)
    f_low = jnp.where(flip, nbins - 1 - arg_high, arg_low)
    f_peak = jnp.where(flip, nbins - 1 - arg_peak, arg_peak)

    width = jnp.maximum((f_peak - f_low).astype(jnp.float32), 1.0)
    norm = jnp.sqrt(peak_height**2 + width**2)
    ph = peak_height / norm
    wd = width / norm
    # distance along the triangle for bins in [f_low, f_peak)
    x1 = idxs - f_low.astype(jnp.float32)
    mask = (idxs >= f_low) & (idxs < f_peak)
    length = jnp.where(mask, ph * x1 - wd * f_counts, _NEG_INF)
    arg_level = jnp.argmax(length)
    arg_level = jnp.where(flip, nbins - 1 - arg_level, arg_level)
    return centers[arg_level]


def _minimum_from_hist(counts: jax.Array, centers: jax.Array) -> jax.Array:
    """Minimum method: smooth the histogram with a length-3 running mean until
    it has exactly two 'walk' maxima, then take the minimum bin between them.

    Mirrors skimage's sequential up/down walk for maxima detection, computed
    here with an associative carry of the last nonzero slope sign.
    """
    nbins = counts.shape[0]
    smooth_kernel = jnp.full((3,), 1.0 / 3.0, dtype=jnp.float32)

    def count_maxima(hist):
        d = jnp.diff(hist)
        s = jnp.sign(d).astype(jnp.float32)
        # carry last nonzero sign forward; initial direction is +1
        def combine(a, b):
            return jnp.where(b != 0, b, a)

        carried = lax.associative_scan(combine, s)
        prev_dir = jnp.concatenate([jnp.ones((1,), jnp.float32), carried[:-1]])
        prev_dir = jnp.where(prev_dir == 0, 1.0, prev_dir)
        maxima = (s < 0) & (prev_dir > 0)
        return maxima

    def cond(state):
        hist, it = state
        n_max = jnp.sum(count_maxima(hist))
        return (n_max > 2) & (it < 10000)

    def body(state):
        hist, it = state
        padded = jnp.pad(hist, (1, 1), mode="edge")
        smoothed = jnp.convolve(padded, smooth_kernel, mode="valid")
        return smoothed, it + 1

    hist0 = counts.astype(jnp.float32)
    hist, _ = lax.while_loop(cond, body, (hist0, jnp.int32(0)))

    maxima = count_maxima(hist)
    idxs = jnp.arange(nbins - 1)
    first_max = jnp.argmax(maxima)
    # second maximum: first True strictly after first_max
    maxima2 = maxima & (idxs > first_max)
    second_max = jnp.argmax(maxima2)
    # minimum bin strictly between the two maxima (inclusive span as skimage)
    between = (idxs >= first_max) & (idxs <= second_max)
    masked = jnp.where(between, hist[:-1], jnp.inf)
    t_idx = jnp.argmin(masked)
    return centers[t_idx]


def threshold_otsu(x: jax.Array) -> jax.Array:
    counts, centers = _histogram_for(jnp.asarray(x))
    return _otsu_from_hist(counts, centers)


def threshold_isodata(x: jax.Array) -> jax.Array:
    counts, centers = _histogram_for(jnp.asarray(x))
    return _isodata_from_hist(counts, centers)


def threshold_yen(x: jax.Array) -> jax.Array:
    counts, centers = _histogram_for(jnp.asarray(x))
    return _yen_from_hist(counts, centers)


def threshold_triangle(x: jax.Array) -> jax.Array:
    counts, centers = _histogram_for(jnp.asarray(x))
    return _triangle_from_hist(counts, centers)


def threshold_minimum(x: jax.Array) -> jax.Array:
    counts, centers = _histogram_for(jnp.asarray(x))
    return _minimum_from_hist(counts, centers)


def threshold_mean(x: jax.Array) -> jax.Array:
    """Mean of all pixel values (skimage.filters.threshold_mean)."""
    return jnp.mean(jnp.asarray(x, dtype=jnp.float32))


@partial(jax.jit, static_argnames=("tolerance_hint",))
def threshold_li(x: jax.Array, tolerance_hint: float | None = None) -> jax.Array:
    """Li's minimum cross-entropy threshold (iterative).

    Follows skimage's fixed-point iteration: starting from the image mean,
    alternate between splitting at t and recomputing
    t = (m_b - m_f) / (ln m_b - ln m_f) until the update is below tolerance
    (half the smallest distinct-value gap, 0.5 for integer images).
    """
    img = jnp.asarray(x, dtype=jnp.float32).ravel()
    offset = jnp.min(img)
    vals = img - offset  # make values non-negative, as skimage does

    if tolerance_hint is not None:
        tol = jnp.float32(tolerance_hint)
    else:
        s = jnp.sort(vals)
        d = jnp.diff(s)
        pos = jnp.where(d > 0, d, jnp.inf)
        min_gap = jnp.min(pos)
        tol = jnp.where(jnp.isfinite(min_gap), min_gap / 2.0, jnp.float32(0.5))

    t0 = jnp.mean(vals)

    def body(state):
        t_curr, _ = state
        fg = vals > t_curr
        n_fg = jnp.sum(fg)
        n_bg = vals.size - n_fg
        sum_fg = jnp.sum(jnp.where(fg, vals, 0.0))
        sum_bg = jnp.sum(jnp.where(fg, 0.0, vals))
        mean_fg = sum_fg / jnp.maximum(n_fg, 1)
        mean_bg = sum_bg / jnp.maximum(n_bg, 1)
        log_fg = jnp.log(jnp.maximum(mean_fg, 1e-30))
        # skimage treats mean_back == 0 by using eps
        log_bg = jnp.log(jnp.maximum(mean_bg, 1e-30))
        denom = log_bg - log_fg
        t_next = jnp.where(
            jnp.abs(denom) > 1e-30, (mean_bg - mean_fg) / denom, t_curr
        )
        return t_next, t_curr

    def cond(state):
        t_next, t_curr = state
        return jnp.abs(t_next - t_curr) > tol

    t_final, _ = lax.while_loop(cond, body, body((t0, t0 + 2 * tol + 1)))
    return t_final + offset


# -- Local thresholds ------------------------------------------------------------


def threshold_local(
    x: jax.Array,
    block_size: int = 3,
    method: str = "gaussian",
    offset: float = 0.0,
    param=None,
) -> jax.Array:
    """Adaptive local threshold image (skimage.filters.threshold_local).

    method 'gaussian' (default, sigma = (block_size-1)/6 unless `param`),
    'mean', or 'median' over a block_size window; the returned threshold
    image is the filtered image minus `offset`.
    """
    if block_size % 2 != 1:
        raise ValueError(f"block_size must be odd, got {block_size}")
    img = jnp.asarray(x, dtype=jnp.float32)
    if method == "gaussian":
        sigma = param if param is not None else (block_size - 1) / 6.0
        filtered = gaussian_filter(img, float(sigma), mode="reflect")
    elif method == "mean":
        filtered = box_filter(img, block_size, mode="reflect")
    elif method == "median":
        filtered = median_filter(img, block_size, mode="reflect")
    else:
        raise ValueError(f"Unsupported local threshold method: {method!r}")
    return filtered - offset


def threshold_niblack(x: jax.Array, window_size: int = 15, k: float = 0.2) -> jax.Array:
    """Niblack local threshold image: T = mean - k * std."""
    mean, std = window_mean_std(jnp.asarray(x, dtype=jnp.float32), window_size)
    return mean - k * std


def _sauvola_r(dtype) -> float:
    dt = np.dtype(dtype)
    if dt.kind in "ui":
        info = np.iinfo(dt)
        return 0.5 * (info.max - info.min)
    # float images: skimage dtype_limits -> (-1, 1)
    return 1.0


def threshold_sauvola(
    x: jax.Array, window_size: int = 15, k: float = 0.2, r: float | None = None
) -> jax.Array:
    """Sauvola local threshold image: T = mean * (1 + k*((std/r) - 1))."""
    if r is None:
        r = _sauvola_r(jnp.asarray(x).dtype)
    mean, std = window_mean_std(jnp.asarray(x, dtype=jnp.float32), window_size)
    return mean * (1.0 + k * ((std / r) - 1.0))


_GLOBAL_METHODS = {
    "otsu": threshold_otsu,
    "li": threshold_li,
    "yen": threshold_yen,
    "isodata": threshold_isodata,
    "mean": threshold_mean,
    "minimum": threshold_minimum,
    "triangle": threshold_triangle,
}

_LOCAL_METHODS = {
    "local": threshold_local,
    "niblack": threshold_niblack,
    "sauvola": threshold_sauvola,
}


def apply_threshold(x: jax.Array, method: str = "otsu", **kwargs) -> jax.Array:
    """Binarize an image with the named thresholding method.

    Drop-in equivalent of the reference `apply_threshold`
    (operations.py:135-216): global methods compute a scalar threshold,
    local methods a threshold image; the result is `x > threshold`.
    Empty and constant images return an all-False mask.

    Fully traceable: safe to call inside jit/vmap/shard_map.
    """
    x = jnp.asarray(x)
    if x.size == 0:
        return jnp.zeros(x.shape, dtype=bool)

    method_lower = method.lower()
    if method_lower in _GLOBAL_METHODS:
        thresh = _GLOBAL_METHODS[method_lower](x, **kwargs)
    elif method_lower in _LOCAL_METHODS:
        thresh = _LOCAL_METHODS[method_lower](x, **kwargs)
    else:
        supported = ", ".join(list(_GLOBAL_METHODS) + list(_LOCAL_METHODS))
        raise ValueError(
            f"Unsupported thresholding method: '{method}'. Supported methods: {supported}"
        )

    mask = jnp.asarray(x, dtype=jnp.float32) > jnp.asarray(thresh, dtype=jnp.float32)
    # Constant images -> all False (reference behavior for degenerate inputs)
    is_constant = jnp.min(x) == jnp.max(x)
    return jnp.where(is_constant, jnp.zeros_like(mask), mask)
