"""Independent NumPy/SciPy reference implementations for parity testing.

These follow the published algorithms that scikit-image implements (Otsu 1979,
Ridler-Calvard isodata, Yen 1995, Zack triangle, Li cross-entropy, Niblack/
Sauvola, the weighted border-count perimeter of Benkrid et al. used by
regionprops, and image-moment ellipse fitting). The device kernels in
`arcadia_microscopy_tools_tpu.ops` must match these within tolerance - and
bit-exactly for integer-histogram thresholds - which is the BASELINE.json
accuracy criterion ("masks and per-cell measurements match the CPU reference").

scikit-image itself is deliberately NOT a dependency; these are clean-room
ports of the published algorithms kept small enough to audit by eye.

Round-3 adversarial audit (function-by-function re-derivation against the
published algorithms and the skimage conventions, cross-checked numerically
against brute-force formulations in tests/test_threshold_parity.py):
- threshold_otsu: FIXED a real off-by-one - m2 was computed as
  (total - csum)/w2, whose numerator excludes bin i while the denominator
  includes it; brute-force between-class variance disagreed on 77% of
  bimodal images. Now uses the reversed cumulative sum, as skimage does.
  The device kernel (ops/threshold.py _otsu_from_hist) had the same bug
  and the same fix; test_otsu_matches_brute_force pins both.
- threshold_yen: pmf now float32 (skimage computes it in float32; dtype
  affects near-tie argmax picks).
- threshold_isodata / triangle / minimum / mean / niblack / sauvola /
  perimeter weights / DoG / region moments: re-derived, index conventions
  and constants verified (isodata's higher[] uses consistent j>i sets;
  triangle's constant-image early-out is implied by skimage's
  low==high check; scipy 'mirror' == np.pad 'reflect' for the Niblack/
  Sauvola window as in skimage's integral-image padding; perimeter kernel
  [[10,2,10],[2,1,2],[10,2,10]] with weights 1 at {5,7,15,17,25,27},
  sqrt(2) at {21,33}, (1+sqrt(2))/2 at {13,23} matches
  skimage.measure.perimeter with its default 4-neighborhood).
- threshold_li: guards differ cosmetically from skimage (explicit 1e-30
  clamps vs skimage's unguarded logs); fixed-point iterates and tolerance
  (half the minimal distinct-value gap) are identical, convergence agrees
  within tolerance by construction.
- threshold_minimum: skimage additionally errors when max_num_iter is
  reached with >2 maxima; this port breaks out of smoothing but then
  raises in the len != 2 check - same observable outcome.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import ndimage as ndi


# -- Histograms (skimage.exposure.histogram conventions) -----------------------


def histogram(image: np.ndarray, nbins: int = 256):
    """Integer images: one bin per integer between min and max.
    Float images: nbins uniform bins over [min, max]."""
    flat = image.ravel()
    if np.issubdtype(flat.dtype, np.integer):
        lo, hi = int(flat.min()), int(flat.max())
        counts = np.bincount(flat.astype(np.int64) - lo, minlength=hi - lo + 1)
        centers = np.arange(lo, hi + 1)
        return counts.astype(float), centers.astype(float)
    counts, edges = np.histogram(flat, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    return counts.astype(float), centers


def threshold_otsu(image: np.ndarray) -> float:
    counts, centers = histogram(image)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        m1 = np.cumsum(counts * centers) / w1
        # reversed cumsum: m2[i] averages bins j >= i (using
        # (total - csum)[i] here drops bin i from the numerator only - the
        # off-by-one caught by the round-3 audit against brute-force Otsu)
        m2 = (np.cumsum((counts * centers)[::-1]) / w2[::-1])[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[np.nanargmax(var12)]


def threshold_isodata(image: np.ndarray) -> float:
    counts, centers = histogram(image)
    csuml = np.cumsum(counts)
    csumh = csuml[-1] - csuml
    csum_i = np.cumsum(counts * centers)
    with np.errstate(divide="ignore", invalid="ignore"):
        lower = csum_i[:-1] / csuml[:-1]
        higher = (csum_i[-1] - csum_i[:-1]) / csumh[:-1]
    all_mean = (lower + higher) / 2.0
    bin_width = centers[1] - centers[0]
    distances = all_mean - centers[:-1]
    ok = (distances >= 0) & (distances < bin_width)
    return centers[:-1][ok][0]


def threshold_yen(image: np.ndarray) -> float:
    counts, centers = histogram(image)
    # skimage computes the pmf in float32 (thresholding.py threshold_yen);
    # mirroring the dtype keeps near-tie argmax decisions identical
    pmf = counts.astype(np.float32) / counts.sum()
    p1 = np.cumsum(pmf)
    p1_sq = np.cumsum(pmf**2)
    p2_sq = np.cumsum(pmf[::-1] ** 2)[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        crit = np.log(
            (p1[:-1] * (1.0 - p1[:-1])) ** 2 / (p1_sq[:-1] * p2_sq[1:])
        )
    return centers[np.nanargmax(crit)]


def threshold_triangle(image: np.ndarray) -> float:
    counts, centers = histogram(image)
    nbins = len(counts)
    arg_peak = int(np.argmax(counts))
    nz = np.flatnonzero(counts)
    arg_low, arg_high = nz[0], nz[-1]
    if arg_low == arg_high == arg_peak:
        return centers[arg_peak]
    peak_height = counts[arg_peak]
    flip = arg_peak - arg_low < arg_high - arg_peak
    if flip:
        counts = counts[::-1]
        arg_low = nbins - arg_high - 1
        arg_peak = nbins - arg_peak - 1
    width = arg_peak - arg_low
    x1 = np.arange(width)
    y1 = counts[x1 + arg_low]
    norm = math.sqrt(peak_height**2 + width**2)
    length = (peak_height / norm) * x1 - (width / norm) * y1
    arg_level = int(np.argmax(length)) + arg_low
    if flip:
        arg_level = nbins - arg_level - 1
    return centers[arg_level]


def threshold_mean(image: np.ndarray) -> float:
    return float(image.mean())


def threshold_li(image: np.ndarray) -> float:
    vals = image.astype(np.float64).ravel()
    offset = vals.min()
    vals = vals - offset
    uniq = np.unique(vals)
    tol = np.min(np.diff(uniq)) / 2.0 if len(uniq) > 1 else 0.5
    t_curr = float(vals.mean())
    t_prev = t_curr + 2 * tol + 1
    while abs(t_curr - t_prev) > tol:
        t_prev = t_curr
        fg = vals > t_curr
        mean_fg = vals[fg].mean() if fg.any() else 0.0
        mean_bg = vals[~fg].mean() if (~fg).any() else 0.0
        lf = math.log(max(mean_fg, 1e-30))
        lb = math.log(max(mean_bg, 1e-30))
        if abs(lb - lf) < 1e-30:
            break
        t_curr = (mean_bg - mean_fg) / (lb - lf)
    return t_curr + offset


def threshold_minimum(image: np.ndarray, max_num_iter: int = 10000) -> float:
    counts, centers = histogram(image)

    def find_local_maxima_idx(hist):
        maximum_idxs = []
        direction = 1
        for i in range(hist.shape[0] - 1):
            if direction > 0:
                if hist[i + 1] < hist[i]:
                    direction = -1
                    maximum_idxs.append(i)
            else:
                if hist[i + 1] > hist[i]:
                    direction = 1
        return maximum_idxs

    smooth_hist = counts.astype(np.float64)
    for _ in range(max_num_iter):
        smooth_hist = ndi.uniform_filter1d(smooth_hist, 3)
        maximum_idxs = find_local_maxima_idx(smooth_hist)
        if len(maximum_idxs) < 3:
            break
    if len(maximum_idxs) != 2:
        raise RuntimeError("Unable to find two maxima in histogram")
    threshold_idx = (
        int(np.argmin(smooth_hist[maximum_idxs[0] : maximum_idxs[1] + 1])) + maximum_idxs[0]
    )
    return centers[threshold_idx]


def window_mean_std(image: np.ndarray, w: int):
    img = image.astype(np.float64)
    mean = ndi.uniform_filter(img, w, mode="mirror")
    sq = ndi.uniform_filter(img * img, w, mode="mirror")
    var = np.clip(sq - mean * mean, 0, None)
    return mean, np.sqrt(var)


def threshold_niblack(image, window_size=15, k=0.2):
    mean, std = window_mean_std(image, window_size)
    return mean - k * std


def threshold_sauvola(image, window_size=15, k=0.2, r=None):
    if r is None:
        if np.issubdtype(image.dtype, np.integer):
            info = np.iinfo(image.dtype)
            r = 0.5 * (info.max - info.min)
        else:
            r = 1.0
    mean, std = window_mean_std(image, window_size)
    return mean * (1 + k * ((std / r) - 1))


def rescale_intensity(image, in_range, out_range):
    p1, p2 = in_range
    o1, o2 = out_range
    x = np.clip(image.astype(np.float64), p1, p2)
    if p2 == p1:
        return np.full_like(x, o1)
    return (x - p1) / (p2 - p1) * (o2 - o1) + o1


def difference_of_gaussians(image, low_sigma, high_sigma):
    img = image.astype(np.float64)
    if np.issubdtype(image.dtype, np.unsignedinteger):
        img = img / np.iinfo(image.dtype).max
    lo = ndi.gaussian_filter(img, low_sigma, mode="nearest", truncate=4.0)
    hi = ndi.gaussian_filter(img, high_sigma, mode="nearest", truncate=4.0)
    return lo - hi


# -- Connected components / morphology ------------------------------------------

_STRUCT8 = np.ones((3, 3), dtype=bool)


def label(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    structure = _STRUCT8 if connectivity == 2 else ndi.generate_binary_structure(2, 1)
    lbl, _ = ndi.label(mask, structure=structure)
    return lbl.astype(np.int64)


def perimeter(binary: np.ndarray) -> float:
    """skimage.measure.perimeter with 4-neighborhood (regionprops default)."""
    image = binary.astype(np.uint8)
    strel = ndi.generate_binary_structure(2, 1)
    eroded = ndi.binary_erosion(image, strel, border_value=0)
    border = image - eroded.astype(np.uint8)
    kernel = np.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]])
    perim = ndi.convolve(border, kernel, mode="constant", cval=0)
    hist = np.bincount(perim.ravel(), minlength=50)
    weights = np.zeros(50)
    weights[[5, 7, 15, 17, 25, 27]] = 1.0
    weights[[21, 33]] = math.sqrt(2)
    weights[[13, 23]] = (1 + math.sqrt(2)) / 2
    return float(hist @ weights)


def region_moments(binary: np.ndarray):
    """Centroid, ellipse axes, eccentricity, orientation from image moments
    (skimage regionprops conventions)."""
    ys, xs = np.nonzero(binary)
    n = len(ys)
    cy, cx = ys.mean(), xs.mean()
    mu20 = ((ys - cy) ** 2).mean()
    mu02 = ((xs - cx) ** 2).mean()
    mu11 = ((ys - cy) * (xs - cx)).mean()
    common = math.sqrt(4 * mu11**2 + (mu20 - mu02) ** 2)
    lam1 = (mu20 + mu02 + common) / 2
    lam2 = max((mu20 + mu02 - common) / 2, 0.0)
    major = 4 * math.sqrt(lam1)
    minor = 4 * math.sqrt(lam2)
    ecc = math.sqrt(1 - lam2 / lam1) if lam1 > 0 else 0.0
    a, b, c = mu02, -mu11, mu20
    if a - c == 0:
        orientation = -math.pi / 4 if b < 0 else math.pi / 4
    else:
        orientation = 0.5 * math.atan2(-2 * b, c - a)
    return {
        "area": float(n),
        "centroid_y": cy,
        "centroid_x": cx,
        "axis_major_length": major,
        "axis_minor_length": minor,
        "eccentricity": ecc,
        "orientation": orientation,
    }


def convex_area(binary: np.ndarray) -> float:
    """Pixels inside the convex hull of the region (skimage area_convex)."""
    import cv2

    ys, xs = np.nonzero(binary)
    pts = np.stack([xs, ys], axis=1).astype(np.int32)
    hull = cv2.convexHull(pts)
    canvas = np.zeros(binary.shape, dtype=np.uint8)
    cv2.fillPoly(canvas, [hull], 1)
    return float(canvas.sum())


def disk_mask(shape, cy, cx, r):
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
