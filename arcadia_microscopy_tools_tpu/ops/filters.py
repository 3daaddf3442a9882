"""Separable image filters as jittable TPU kernels.

Replaces the scikit-image/scipy filter stack used by the reference
(`src/arcadia_microscopy_tools/operations.py:91` difference_of_gaussians, plus
the denoise/background extras from the north-star config list): Gaussian and
difference-of-Gaussians, box/uniform filters built on cumulative sums, median
and rank filters, and grey-morphology background estimation (flat and
paraboloid "rolling ball").

Design notes (TPU):
- Everything operates on float32 arrays shaped (..., H, W); leading axes are
  batch and are folded into the convolution batch dimension, so a whole
  (B, C, H, W) well batch runs as one fused XLA program.
- Gaussian convolution is separable 1-D convs through
  `lax.conv_general_dilated`, which XLA lowers onto the MXU/VPU with proper
  tiling; edge handling matches scipy's "nearest"/"reflect" modes via explicit
  pads (static shapes - no dynamic control flow under jit).
- Box sums use exclusive cumsums so windowed mean/variance (Niblack, Sauvola,
  local-threshold) are O(1) per pixel regardless of window size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "gaussian_filter",
    "difference_of_gaussians",
    "box_filter",
    "window_mean_std",
    "median_filter",
    "rank_filter",
    "grey_erosion",
    "grey_dilation",
    "grey_opening",
    "subtract_background_rolling_ball",
    "to_float",
]


def to_float(x: jax.Array | np.ndarray) -> jax.Array:
    """Convert an image to float32 following skimage's `img_as_float` contract.

    Unsigned integer images are scaled to [0, 1] by the dtype max (uint16 ->
    /65535), signed integers by the dtype range, and floating images pass
    through (cast to float32).
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(jnp.float32)
    if x.dtype == jnp.bool_:
        return x.astype(jnp.float32)
    info = jnp.iinfo(x.dtype)
    if info.min == 0:
        return x.astype(jnp.float32) / float(info.max)
    # Signed integers: scale symmetric range like skimage img_as_float
    return x.astype(jnp.float32) / float(info.max + 1)


def _gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Sampled, normalized 1-D Gaussian (matches scipy.ndimage.gaussian_filter1d)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (x / float(sigma)) ** 2)
    kernel /= kernel.sum()
    return kernel.astype(np.float32)


_PAD_MODES = {
    # scipy mode -> jnp.pad mode
    "nearest": "edge",
    "reflect": "symmetric",  # scipy 'reflect' duplicates the edge sample
    "mirror": "reflect",  # scipy 'mirror' does not duplicate the edge sample
    "constant": "constant",
    "wrap": "wrap",
}


def _pad_last2(x: jax.Array, pad_h: int, pad_w: int, mode: str, cval: float = 0.0) -> jax.Array:
    pad_mode = _PAD_MODES[mode]
    pads = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    if pad_mode == "constant":
        return jnp.pad(x, pads, mode="constant", constant_values=cval)
    return jnp.pad(x, pads, mode=pad_mode)


def _conv_separable_last2(
    x: jax.Array, kernel_y: np.ndarray | None, kernel_x: np.ndarray | None
) -> jax.Array:
    """Valid-mode separable convolution along the last two axes.

    The input is reshaped to NCHW with all leading axes folded into N so one
    `conv_general_dilated` call covers an entire batch.
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    y = x.reshape((-1, 1, h, w)).astype(jnp.float32)

    dn = lax.conv_dimension_numbers(y.shape, (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))
    if kernel_y is not None:
        ky = jnp.asarray(kernel_y, dtype=jnp.float32).reshape((1, 1, -1, 1))
        y = lax.conv_general_dilated(y, ky, (1, 1), "VALID", dimension_numbers=dn)
    if kernel_x is not None:
        kx = jnp.asarray(kernel_x, dtype=jnp.float32).reshape((1, 1, 1, -1))
        y = lax.conv_general_dilated(y, kx, (1, 1), "VALID", dimension_numbers=dn)
    return y.reshape(lead + y.shape[-2:])


def _banded_gaussian_matrix(n_out: int, sigma: float, radius: int, norm: float) -> jax.Array:
    """Dense (n_out, n_out + 2*radius) banded Gaussian filter matrix:
    row i holds the normalized kernel at offset i. The taps are evaluated
    analytically from iota (a table gather over a 4M-element band costs
    ~45 ms on this toolchain; the closed form is one fused VPU pass)."""
    k = 2 * radius + 1
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out + k - 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out + k - 1), 0)
    offset = (col - row - radius).astype(jnp.float32)  # tap position in [-r, r]
    tap = jnp.exp(-0.5 * (offset / jnp.float32(sigma)) ** 2) * jnp.float32(norm)
    in_band = (col - row >= 0) & (col - row < k)
    return jnp.where(in_band, tap, 0.0)


@partial(jax.jit, static_argnames=("sigma", "mode", "truncate", "cval"))
def gaussian_filter(
    x: jax.Array,
    sigma: float,
    mode: str = "nearest",
    truncate: float = 4.0,
    cval: float = 0.0,
) -> jax.Array:
    """2-D Gaussian blur over the last two axes (separable, batched).

    Matches `scipy.ndimage.gaussian_filter` (and therefore skimage.filters
    .gaussian) for the supported boundary modes, in float32.

    TPU note: a 1-channel conv leaves the MXU ~1% utilized, so the separable
    passes are expressed as dense banded-Toeplitz matmuls instead -
    T_h @ X @ T_w^T with the Gaussian taps on the bands. At 2048^2 that is
    two ~17 GFLOP matmuls (~50x faster than conv_general_dilated here).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    if sigma <= 0:
        return x
    kernel = _gaussian_kernel_1d(sigma, truncate)
    radius = (len(kernel) - 1) // 2
    # host-side normalizer so the analytic band matches the sampled kernel
    norm = float(1.0 / np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2).sum())
    padded = _pad_last2(x, radius, radius, mode, cval)

    h, w = x.shape[-2], x.shape[-1]
    th = _banded_gaussian_matrix(h, sigma, radius, norm)  # (H, H + 2r)
    tw = _banded_gaussian_matrix(w, sigma, radius, norm)  # (W, W + 2r)

    lead = padded.shape[:-2]
    y = padded.reshape((-1,) + padded.shape[-2:])  # (B, H+2r, W+2r)
    # rows: (H, H+2r) @ (B, H+2r, W+2r) -> (B, H, W+2r)
    y = jnp.einsum("hp,bpw->bhw", th, y, preferred_element_type=jnp.float32)
    # cols: (B, H, W+2r) @ (W+2r, W)^T -> (B, H, W)
    y = jnp.einsum("bhp,wp->bhw", y, tw, preferred_element_type=jnp.float32)
    return y.reshape(lead + (h, w))


@partial(jax.jit, static_argnames=("low_sigma", "high_sigma", "mode", "truncate"))
def difference_of_gaussians(
    x: jax.Array,
    low_sigma: float,
    high_sigma: float,
    mode: str = "nearest",
    truncate: float = 4.0,
) -> jax.Array:
    """Band-pass difference-of-Gaussians filter.

    Semantics match `skimage.filters.difference_of_gaussians`
    (reference hot path, operations.py:91): the image is first converted to
    float in [0, 1] (uint16 / 65535), then blurred at both sigmas with
    "nearest" edges and truncate=4, and the wide blur is subtracted from the
    narrow one.
    """
    img = to_float(x)
    # Center before filtering when the pad mode preserves constants
    # (everything except zero-fill "constant"): both kernels are normalized,
    # so DoG(img) == DoG(img - c) exactly in real arithmetic. Removing the
    # DC component first makes the band matmuls numerically benign on TPU
    # (MXU accumulation error is relative to operand magnitude, and the DC
    # term dominates it). The center is the MIDRANGE, not the mean: min/max
    # reductions are exact and reduction-order-free, so the centered image
    # is bit-identical under any spatial sharding (a mean's partial-sum
    # order varies with the partitioning), a constant image centers to
    # exactly zero, and the midrange minimizes the worst-case centered
    # magnitude. With "constant" padding the identity does not hold (the
    # zero fill is not shifted), so the input passes through uncentered.
    if mode != "constant":
        img = img - (jnp.min(img) + jnp.max(img)) * 0.5
    low = gaussian_filter(img, low_sigma, mode=mode, truncate=truncate)
    high = gaussian_filter(img, high_sigma, mode=mode, truncate=truncate)
    return low - high


# -- Box / windowed statistics ------------------------------------------------


def _box_sum_last2(x: jax.Array, window: int, mode: str = "reflect") -> jax.Array:
    """Windowed sum over a (window x window) neighborhood via per-axis
    sliding cumsum differences.

    O(1) per pixel for any window size - the backbone of the local
    thresholding family. `window` must be odd.

    Conditioning note (the reason this is NOT one 2-D integral image): a
    full summed-area table of x^2 at 2048^2 reaches ~1e12 where f32's ulp
    is ~65536, and the 4-corner subtraction then leaves window sums with
    up to ~19% relative error in the variance (measured on v5e). Taking the
    window difference after EACH axis keeps every intermediate at row
    magnitude (~1e9), bounding the window-sum error at ~3e-5 relative for
    the same two cumsums.
    """
    if window % 2 != 1:
        raise ValueError(f"window must be odd, got {window}")
    r = window // 2
    padded = _pad_last2(x.astype(jnp.float32), r + 1, r + 1, mode)
    h, w = x.shape[-2], x.shape[-1]
    c1 = jnp.cumsum(padded, axis=-1)
    rows = c1[..., window : window + w] - c1[..., :w]  # (.., h+2r+2, w)
    c2 = jnp.cumsum(rows, axis=-2)
    return c2[..., window : window + h, :] - c2[..., :h, :]


@partial(jax.jit, static_argnames=("window", "mode"))
def box_filter(x: jax.Array, window: int, mode: str = "reflect") -> jax.Array:
    """Windowed mean over a (window x window) neighborhood."""
    return _box_sum_last2(x, window, mode) / float(window * window)


@partial(jax.jit, static_argnames=("window", "mode"))
def window_mean_std(
    x: jax.Array, window: int, mode: str = "mirror"
) -> tuple[jax.Array, jax.Array]:
    """Windowed mean and standard deviation (population), float32.

    Used by Niblack/Sauvola thresholds; mirrors skimage's `_mean_std`, whose
    np.pad(mode='reflect') equals scipy's 'mirror' (no edge duplication).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    n = float(window * window)
    s1 = _box_sum_last2(x, window, mode)
    s2 = _box_sum_last2(x * x, window, mode)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


# -- Rank filters --------------------------------------------------------------


def _window_stack(x: jax.Array, window: int, mode: str = "reflect") -> jax.Array:
    """Stack all window*window shifted views along a new leading axis.

    Memory is O(window^2 * image); used for window <= 9. Larger windows route
    through the Pallas bit-plane selection kernel (ops/rank_pallas.py) on
    accelerators, or the strip-chunked sort below elsewhere.
    """
    r = window // 2
    padded = _pad_last2(x, r, r, mode)
    h, w = x.shape[-2], x.shape[-1]
    views = [
        padded[..., dy : dy + h, dx : dx + w]
        for dy in range(window)
        for dx in range(window)
    ]
    return jnp.stack(views, axis=0)


# Largest window served by the materialize-all-views sort; beyond it the
# O(window^2 * image) intermediates dominate memory (window 33 at 2048^2
# would hold 1089 full-image copies).
_SMALL_WINDOW_LIMIT = 9
_RANK_STRIP_ROWS = 64


def _use_rank_pallas() -> bool:
    import os

    return (
        os.environ.get("AMT_PALLAS_RANK", "1") != "0"
        and jax.devices()[0].platform != "cpu"
    )


def _rank_select_strips(
    x2d: jax.Array, ranks: tuple[int, ...], window: int, mode: str
) -> jax.Array:
    """Exact order statistics for one 2D image via a strip-chunked sort.

    Bounds memory at O(window^2 * strip * W): strips of rows are processed
    sequentially under lax.map, each sorting its stacked window views. Same
    results as the full-view sort, any backend.
    """
    h, w = x2d.shape
    r = window // 2
    padded = _pad_last2(x2d.astype(jnp.float32), r, r, mode)
    strip = min(_RANK_STRIP_ROWS, h)
    n_strips = -(-h // strip)
    # pad rows so every strip slice is full-size (cropped after)
    total = n_strips * strip + 2 * r
    padded = jnp.pad(padded, ((0, total - padded.shape[0]), (0, 0)), mode="edge")

    def one_strip(i):
        seg = lax.dynamic_slice(padded, (i * strip, 0), (strip + 2 * r, w + 2 * r))
        views = jnp.stack(
            [
                seg[dy : dy + strip, dx : dx + w]
                for dy in range(window)
                for dx in range(window)
            ],
            axis=0,
        )
        srt = jnp.sort(views, axis=0)
        return jnp.stack([srt[k] for k in ranks])

    out = lax.map(one_strip, jnp.arange(n_strips))  # (n_strips, nr, strip, w)
    out = jnp.moveaxis(out, 1, 0).reshape(len(ranks), n_strips * strip, w)
    return out[:, :h, :]


def _rank_select_large(
    x: jax.Array, ranks: tuple[int, ...], window: int, mode: str
) -> jax.Array:
    """Order statistics for large windows: Pallas bit-plane selection on
    accelerators, strip-chunked sort elsewhere. Handles leading batch axes
    by folding them into a lax.map. Returns (len(ranks), ..., H, W)."""
    from .rank_pallas import rank_pallas_viable, rank_select_pallas

    x = jnp.asarray(x, dtype=jnp.float32)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    use_pallas = _use_rank_pallas() and rank_pallas_viable(window)

    def one(img2d):
        if use_pallas:
            return rank_select_pallas(img2d, window, ranks, pad_mode=mode)
        return _rank_select_strips(img2d, ranks, window, mode)

    if not lead:
        return one(x)
    flat = x.reshape((-1, h, w))
    out = lax.map(one, flat)  # (N, nr, H, W)
    return jnp.moveaxis(out, 1, 0).reshape((len(ranks),) + lead + (h, w))


@partial(jax.jit, static_argnames=("window", "mode"))
def median_filter(x: jax.Array, window: int = 3, mode: str = "reflect") -> jax.Array:
    """Median filter over a (window x window) neighborhood.

    window <= 9: full sort over the stacked window views (XLA lowers the
    sort to a bitonic network on the VPU, vectorized across all pixels).
    Larger windows: exact per-pixel bit-plane selection in VMEM tiles
    (ops/rank_pallas.py) on accelerators - O(tile) memory instead of
    O(window^2 * image) - with a strip-chunked sort fallback on CPU.
    skimage's rank filters have no window limit; now neither does this.
    """
    k = window * window
    if window <= _SMALL_WINDOW_LIMIT:
        stack = _window_stack(jnp.asarray(x, dtype=jnp.float32), window, mode)
        sorted_stack = jnp.sort(stack, axis=0)
        if k % 2 == 1:
            return sorted_stack[k // 2]
        return 0.5 * (sorted_stack[k // 2 - 1] + sorted_stack[k // 2])
    ranks = (k // 2,) if k % 2 == 1 else (k // 2 - 1, k // 2)
    sel = _rank_select_large(x, ranks, window, mode)
    if k % 2 == 1:
        return sel[0]
    return 0.5 * (sel[0] + sel[1])


@partial(jax.jit, static_argnames=("rank", "window", "mode"))
def rank_filter(x: jax.Array, rank: int, window: int = 3, mode: str = "reflect") -> jax.Array:
    """Generic rank filter (rank 0 = min, window^2-1 = max); any window size
    (large windows use the same selection paths as median_filter)."""
    if window <= _SMALL_WINDOW_LIMIT:
        stack = _window_stack(jnp.asarray(x, dtype=jnp.float32), window, mode)
        return jnp.sort(stack, axis=0)[rank]
    return _rank_select_large(x, (rank,), window, mode)[0]


# -- Grey morphology / background estimation -----------------------------------


def _reduce_window_last2(x: jax.Array, window: int, mode: str, init, op) -> jax.Array:
    # `mode` names the reduction for readability at call sites; both min and
    # max pad with edge replication (scipy grey_erosion/dilation 'nearest')
    del mode
    r = window // 2
    padded = _pad_last2(x, r, r, "nearest")
    return lax.reduce_window(
        padded,
        init,
        op,
        window_dimensions=(1,) * (x.ndim - 2) + (window, window),
        window_strides=(1,) * x.ndim,
        padding="VALID",
    )


@partial(jax.jit, static_argnames=("window",))
def grey_erosion(x: jax.Array, window: int) -> jax.Array:
    """Flat grey erosion (windowed min) with edge replication."""
    x = jnp.asarray(x, dtype=jnp.float32)
    return _reduce_window_last2(x, window, "min", jnp.inf, lax.min)


@partial(jax.jit, static_argnames=("window",))
def grey_dilation(x: jax.Array, window: int) -> jax.Array:
    """Flat grey dilation (windowed max) with edge replication."""
    x = jnp.asarray(x, dtype=jnp.float32)
    return _reduce_window_last2(x, window, "max", -jnp.inf, lax.max)


@partial(jax.jit, static_argnames=("window",))
def grey_opening(x: jax.Array, window: int) -> jax.Array:
    """Flat grey opening: erosion then dilation. Estimates a local background
    floor that ignores bright features smaller than the window."""
    return grey_dilation(grey_erosion(x, window), window)


def _parabola_erode_1d(x: jax.Array, radius: int, curvature: float, axis: int) -> jax.Array:
    """1-D grey erosion with a parabolic structuring element via shifts.

    min_k ( x[i+k] - curvature * k^2 ) over k in [-radius, radius].
    """
    out = x
    h = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (radius, radius)
    padded = jnp.pad(x, pads, mode="edge")
    idx_base = [slice(None)] * x.ndim
    for k in range(-radius, radius + 1):
        if k == 0:
            continue
        idx = list(idx_base)
        idx[axis] = slice(radius + k, radius + k + h)
        shifted = padded[tuple(idx)] + jnp.float32(curvature * (k * k))
        out = jnp.minimum(out, shifted)
    return out


def _parabola_dilate_1d(x: jax.Array, radius: int, curvature: float, axis: int) -> jax.Array:
    return -_parabola_erode_1d(-x, radius, curvature, axis)


def _sphere_offsets(radius: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (offsets, heights) of the spherical structuring element.

    Offsets are (n, 2) top-left-relative slice starts into a radius-padded
    image; heights are the ball profile sqrt(r^2 - d^2) at each in-support
    tap. Only taps with d <= r participate (the sphere has compact support,
    unlike the paraboloid which extends to the window corners).
    """
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    d2 = yy * yy + xx * xx
    inside = (d2 <= radius * radius).ravel()
    heights = np.sqrt(np.clip(radius * radius - d2, 0, None)).astype(np.float32)
    offsets = np.stack(
        [(yy.ravel() + radius)[inside], (xx.ravel() + radius)[inside]], axis=1
    ).astype(np.int32)
    return offsets, heights.ravel()[inside]


def _sphere_opening_2d(img: jax.Array, radius: int) -> jax.Array:
    """Grayscale opening with the exact (non-flat) spherical structuring
    element: e(q) = min_s (img(q+s) - K(s)), b(p) = max_s (e(p+s) + K(s))
    with K(s) = sqrt(r^2 - |s|^2). A `lax.scan` over the ~pi*r^2 in-support
    taps keeps the trace size O(1); each step is one dynamic-slice window
    off the radius-padded array, so peak memory is one padded copy plus the
    carry regardless of radius. Edges replicate, matching the flat
    morphology in this module.
    """
    offsets_np, heights_np = _sphere_offsets(radius)
    offsets = jnp.asarray(offsets_np)
    heights = jnp.asarray(heights_np)
    h, w = img.shape

    def pass_(src, combine, init, sign):
        padded = jnp.pad(src, ((radius, radius), (radius, radius)), mode="edge")

        def body(carry, tap):
            off, kv = tap
            win = lax.dynamic_slice(padded, (off[0], off[1]), (h, w))
            return combine(carry, win + sign * kv), None

        out, _ = lax.scan(body, jnp.full((h, w), init, jnp.float32), (offsets, heights))
        return out

    eroded = pass_(img, jnp.minimum, jnp.inf, -1.0)
    return pass_(eroded, jnp.maximum, -jnp.inf, 1.0)


@partial(jax.jit, static_argnames=("radius", "kernel"))
def rolling_ball_background(
    x: jax.Array, radius: int = 50, kernel: str = "paraboloid"
) -> jax.Array:
    """Estimate a smooth background with a rolling-ball opening.

    TPU-native take on `skimage.restoration.rolling_ball`
    (reference usage: preprocessing ahead of amt/operations.py pipelines).
    Two structuring elements:

    - ``"paraboloid"`` (default): the ball is replaced by a paraboloid of
      revolution, which - unlike a sphere - is exactly separable into two
      1-D parabolic morphology passes (z = c*(dx^2 + dy^2)). Curvature is
      matched to the ball apex (c = 1/(2*radius)), the standard
      ImageJ-style approximation; cost is O(radius) shifts.
    - ``"sphere"``: the exact spherical profile sqrt(r^2 - d^2), the same
      element `skimage.restoration.ball_kernel` builds. O(radius^2) taps
      via a scan (memory stays O(image)); use when the paraboloid's wider
      skirt over- or under-carves and exactness matters more than speed.

    Returns the background (everywhere <= the image, as any opening);
    subtract it from the image to flatten illumination.
    """
    if kernel not in ("paraboloid", "sphere"):
        raise ValueError(
            f"Unknown rolling-ball kernel: {kernel!r}. "
            "Supported kernels: 'paraboloid', 'sphere'."
        )
    img = jnp.asarray(x, dtype=jnp.float32)
    if kernel == "sphere":
        if img.ndim == 2:
            return _sphere_opening_2d(img, radius)
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        out = jax.vmap(lambda f: _sphere_opening_2d(f, radius))(flat)
        return out.reshape(lead + img.shape[-2:])
    curvature = 1.0 / (2.0 * float(radius))
    # opening = erosion then dilation with the paraboloid
    er = _parabola_erode_1d(img, radius, curvature, axis=-2)
    er = _parabola_erode_1d(er, radius, curvature, axis=-1)
    di = _parabola_dilate_1d(er, radius, curvature, axis=-2)
    di = _parabola_dilate_1d(di, radius, curvature, axis=-1)
    return di


@partial(jax.jit, static_argnames=("radius", "kernel"))
def subtract_background_rolling_ball(
    x: jax.Array, radius: int = 50, kernel: str = "paraboloid"
) -> jax.Array:
    """Subtract a rolling-ball background (clipped at zero)."""
    img = jnp.asarray(x, dtype=jnp.float32)
    return jnp.clip(img - rolling_ball_background(img, radius, kernel), 0.0, None)
