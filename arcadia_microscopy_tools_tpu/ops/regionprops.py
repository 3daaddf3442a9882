"""Per-cell measurements as vectorized segment reductions.

Replaces `skimage.measure.regionprops_table` (reference
`src/arcadia_microscopy_tools/masks.py:286-327`) with one pass of
`segment_sum`-style reductions over the label image - no per-region Python
loop, no ragged shapes: results are padded to a static `max_cells` so the
whole measurement stage can live inside a jitted, vmapped, sharded plate
program.

Numerical conventions follow skimage exactly:
- centroids are coordinate means (row=y, col=x);
- axis lengths / eccentricity / orientation come from the second central
  moments (inertia-tensor eigenvalues, major = 4*sqrt(lambda_max));
- perimeter uses skimage's weighted border-pixel category counting
  (the [[10,2,10],[2,1,2],[10,2,10]] convolution with weights 1, sqrt(2),
  (1+sqrt(2))/2), evaluated per label over same-label neighborhoods, which is
  bit-identical to running skimage's global perimeter on each region's
  padded bbox crop;
- intensity stats are masked mean/max/min/population-std per channel.

Convex hull quantities (`area_convex`, `solidity`) are inherently irregular;
they are computed by the host-side hull engine in `masks.py` from the
device-extracted boundary pixels (same split as the reference, where outline
extraction is also a lazy host path, masks.py:230-245).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["measure_labels", "measure_intensity", "PROPERTY_DTYPES"]


def _segment_sum(values: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def _segment_min(values, segment_ids, num_segments, big):
    return (
        jnp.full((num_segments,), big, dtype=values.dtype)
        .at[segment_ids]
        .min(values)
    )


def _segment_max(values, segment_ids, num_segments, small):
    return (
        jnp.full((num_segments,), small, dtype=values.dtype)
        .at[segment_ids]
        .max(values)
    )


def _same_label_neighbor(lbl: jax.Array, dy: int, dx: int) -> jax.Array:
    """Boolean map: neighbor (dy, dx) exists and carries the same label."""
    h, w = lbl.shape
    padded = jnp.pad(lbl, 1, mode="constant", constant_values=-1)
    shifted = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
    return shifted == lbl


def _border_map(lbl: jax.Array) -> jax.Array:
    """Pixels of any label missing at least one same-label 4-neighbor.

    Matches the `image - binary_erosion(image, cross)` border extraction that
    skimage's perimeter uses on per-region crops: image borders count as
    background.
    """
    fg = lbl > 0
    interior = fg
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        interior = interior & _same_label_neighbor(lbl, dy, dx)
    return fg & ~interior


def _perimeter_contribution(lbl: jax.Array) -> jax.Array:
    """skimage perimeter weights per border pixel.

    Category c = 1 + 2*(# same-label border 4-neighbors)
                   + 10*(# same-label border diagonal neighbors);
    weight(5,7,15,17,25,27)=1, weight(21,33)=sqrt(2), weight(13,23)=(1+sqrt2)/2.
    All weighted categories are odd (center border pixel contributes the 1),
    so non-border pixels contribute exactly zero.
    """
    border = _border_map(lbl)
    h, w = lbl.shape
    lbl_pad = jnp.pad(lbl, 1, mode="constant", constant_values=-1)
    border_pad = jnp.pad(border, 1, mode="constant", constant_values=False)

    def neighbor_border_same(dy, dx):
        nb_lbl = jax.lax.dynamic_slice(lbl_pad, (1 + dy, 1 + dx), (h, w))
        nb_border = jax.lax.dynamic_slice(border_pad, (1 + dy, 1 + dx), (h, w))
        return (nb_lbl == lbl) & nb_border

    n4 = jnp.zeros(lbl.shape, jnp.int32)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        n4 = n4 + neighbor_border_same(dy, dx).astype(jnp.int32)
    nd = jnp.zeros(lbl.shape, jnp.int32)
    for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        nd = nd + neighbor_border_same(dy, dx).astype(jnp.int32)

    category = jnp.where(border, 1 + 2 * n4 + 10 * nd, 0)

    sqrt2 = math.sqrt(2.0)
    weights = jnp.zeros((50,), dtype=jnp.float32)
    weights = weights.at[jnp.array([5, 7, 15, 17, 25, 27])].set(1.0)
    weights = weights.at[jnp.array([21, 33])].set(sqrt2)
    weights = weights.at[jnp.array([13, 23])].set((1.0 + sqrt2) / 2.0)
    return weights[jnp.clip(category, 0, 49)]


PROPERTY_DTYPES = {
    "label": jnp.int32,
    "area": jnp.float32,
    "centroid_y": jnp.float32,
    "centroid_x": jnp.float32,
    "perimeter": jnp.float32,
    "eccentricity": jnp.float32,
    "axis_major_length": jnp.float32,
    "axis_minor_length": jnp.float32,
    "orientation": jnp.float32,
    "bbox_min_row": jnp.int32,
    "bbox_min_col": jnp.int32,
    "bbox_max_row": jnp.int32,
    "bbox_max_col": jnp.int32,
    "extent": jnp.float32,
}


@partial(jax.jit, static_argnames=("max_cells",))
def measure_labels(label_image: jax.Array, max_cells: int) -> dict[str, jax.Array]:
    """Morphological properties for labels 1..max_cells (padded, device-side).

    Args:
        label_image: 2D int label image with consecutive labels (background 0).
        max_cells: Static upper bound on the number of cells; measurements for
            label k land at index k-1. Labels above max_cells are clipped into
            the last slot (choose max_cells generously; `valid` masks overflow).

    Returns:
        Dict of (max_cells,) arrays: area, centroid_y/x, perimeter,
        eccentricity, axis_major_length, axis_minor_length, orientation,
        bbox_*, extent, plus a boolean `valid` mask of which slots hold cells.
    """
    lbl = jnp.asarray(label_image).astype(jnp.int32)
    h, w = lbl.shape
    nseg = max_cells + 1  # slot 0 = background
    seg = jnp.clip(lbl.ravel(), 0, max_cells)

    ones = jnp.ones_like(seg, dtype=jnp.float32)
    yy, xx = jnp.mgrid[0:h, 0:w]
    yf = yy.ravel().astype(jnp.float32)
    xf = xx.ravel().astype(jnp.float32)

    area = _segment_sum(ones, seg, nseg)
    sum_y = _segment_sum(yf, seg, nseg)
    sum_x = _segment_sum(xf, seg, nseg)
    sum_yy = _segment_sum(yf * yf, seg, nseg)
    sum_xx = _segment_sum(xf * xf, seg, nseg)
    sum_xy = _segment_sum(yf * xf, seg, nseg)

    n = jnp.maximum(area, 1.0)
    cy = sum_y / n
    cx = sum_x / n

    # central second moments (mu[p,q], p = row exponent) normalized by area
    mu20 = sum_yy / n - cy * cy  # spread along rows
    mu02 = sum_xx / n - cx * cx  # spread along cols
    mu11 = sum_xy / n - cy * cx

    common = jnp.sqrt(jnp.maximum(4.0 * mu11 * mu11 + (mu20 - mu02) ** 2, 0.0))
    lam1 = (mu20 + mu02 + common) / 2.0  # largest eigenvalue
    lam2 = (mu20 + mu02 - common) / 2.0
    lam2 = jnp.maximum(lam2, 0.0)
    axis_major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    axis_minor = 4.0 * jnp.sqrt(lam2)
    eccentricity = jnp.where(
        lam1 > 0, jnp.sqrt(jnp.maximum(1.0 - lam2 / jnp.maximum(lam1, 1e-30), 0.0)), 0.0
    )

    # orientation per skimage: inertia_tensor = [[mu02, -mu11], [-mu11, mu20]]
    a, b, c = mu02, -mu11, mu20
    orientation = jnp.where(
        a - c == 0,
        jnp.where(b < 0, -jnp.pi / 4.0, jnp.pi / 4.0),
        0.5 * jnp.arctan2(-2.0 * b, c - a),
    )

    # perimeter: segment-sum of per-border-pixel weights
    perim_w = _perimeter_contribution(lbl).ravel()
    perimeter = _segment_sum(perim_w, seg, nseg)

    # bbox via segment min/max
    yi = yy.ravel().astype(jnp.int32)
    xi = xx.ravel().astype(jnp.int32)
    big = jnp.int32(1 << 30)
    minr = _segment_min(jnp.where(seg > 0, yi, big), seg, nseg, big)
    minc = _segment_min(jnp.where(seg > 0, xi, big), seg, nseg, big)
    maxr = _segment_max(jnp.where(seg > 0, yi, -1), seg, nseg, jnp.int32(-1)) + 1
    maxc = _segment_max(jnp.where(seg > 0, xi, -1), seg, nseg, jnp.int32(-1)) + 1

    bbox_area = jnp.maximum((maxr - minr) * (maxc - minc), 1).astype(jnp.float32)
    extent = area / bbox_area

    valid = area > 0

    def cell(xs):
        return xs[1:]  # drop background slot

    return {
        "label": jnp.arange(1, max_cells + 1, dtype=jnp.int32),
        "valid": cell(valid),
        "area": cell(area),
        "centroid_y": cell(cy),
        "centroid_x": cell(cx),
        "perimeter": cell(perimeter),
        "eccentricity": cell(eccentricity),
        "axis_major_length": cell(axis_major),
        "axis_minor_length": cell(axis_minor),
        "orientation": cell(orientation),
        "bbox_min_row": cell(minr),
        "bbox_min_col": cell(minc),
        "bbox_max_row": cell(maxr),
        "bbox_max_col": cell(maxc),
        "extent": cell(extent),
    }


@partial(jax.jit, static_argnames=("max_cells",))
def measure_intensity(
    label_image: jax.Array, intensity_image: jax.Array, max_cells: int
) -> dict[str, jax.Array]:
    """Per-label intensity statistics (mean/max/min/std) for one channel.

    Matches skimage's intensity_mean/max/min and the reference's
    intensity_std (population standard deviation over the region's pixels).
    """
    lbl = jnp.asarray(label_image).astype(jnp.int32)
    img = jnp.asarray(intensity_image).astype(jnp.float32)
    nseg = max_cells + 1
    seg = jnp.clip(lbl.ravel(), 0, max_cells)
    vals = img.ravel()

    ones = jnp.ones_like(vals)
    count = _segment_sum(ones, seg, nseg)
    s1 = _segment_sum(vals, seg, nseg)
    s2 = _segment_sum(vals * vals, seg, nseg)
    n = jnp.maximum(count, 1.0)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)

    big = jnp.float32(jnp.inf)
    vmin = _segment_min(jnp.where(seg > 0, vals, big), seg, nseg, big)
    vmax = _segment_max(jnp.where(seg > 0, vals, -big), seg, nseg, -big)

    def cell(xs):
        return xs[1:]

    return {
        "intensity_mean": cell(mean),
        "intensity_max": cell(vmax),
        "intensity_min": cell(vmin),
        "intensity_std": cell(jnp.sqrt(var)),
    }
