"""Binary morphology kernels.

Footprint-based erosion/dilation/opening/closing for mask cleanup (the
"morphological cleanup" stage of the north-star classical-segmentation
pipeline; the reference delegates the equivalent work to
skimage.morphology). Footprints are static NumPy arrays, so each offset
becomes one shifted compare that XLA fuses into a single VPU pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


__all__ = [
    "disk",
    "square",
    "binary_erosion",
    "binary_dilation",
    "binary_opening",
    "binary_closing",
    "remove_small_objects",
    "remove_small_holes",
]


def disk(radius: int) -> np.ndarray:
    """Disk-shaped footprint (skimage.morphology.disk convention)."""
    y, x = np.ogrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y <= radius * radius).astype(bool)


def square(width: int) -> np.ndarray:
    """Square footprint of the given side length."""
    return np.ones((width, width), dtype=bool)


def _footprint_offsets(footprint: np.ndarray) -> list[tuple[int, int]]:
    fp = np.asarray(footprint).astype(bool)
    cy, cx = fp.shape[0] // 2, fp.shape[1] // 2
    ys, xs = np.nonzero(fp)
    return [(int(y - cy), int(x - cx)) for y, x in zip(ys, xs)]


def _shift_fold(x: jax.Array, offsets, pad_value: bool, op) -> jax.Array:
    h, w = x.shape[-2], x.shape[-1]
    max_dy = max(abs(dy) for dy, _ in offsets) if offsets else 0
    max_dx = max(abs(dx) for _, dx in offsets) if offsets else 0
    pads = [(0, 0)] * (x.ndim - 2) + [(max_dy, max_dy), (max_dx, max_dx)]
    padded = jnp.pad(x, pads, mode="constant", constant_values=pad_value)
    out = None
    base = [slice(None)] * (x.ndim - 2)
    for dy, dx in offsets:
        idx = tuple(
            base + [slice(max_dy + dy, max_dy + dy + h), slice(max_dx + dx, max_dx + dx + w)]
        )
        shifted = padded[idx]
        out = shifted if out is None else op(out, shifted)
    return out


def binary_erosion(mask: jax.Array, footprint: np.ndarray | None = None) -> jax.Array:
    """Binary erosion: a pixel survives only if the whole footprint fits.

    Out-of-image neighbors count as foreground (skimage border convention).
    """
    fp = footprint if footprint is not None else disk(1)
    m = jnp.asarray(mask).astype(bool)
    return _shift_fold(m, _footprint_offsets(fp), True, jnp.logical_and)


def binary_dilation(mask: jax.Array, footprint: np.ndarray | None = None) -> jax.Array:
    """Binary dilation: a pixel turns on if any footprint neighbor is on.

    The footprint is mirrored (morphological convention); symmetric footprints
    like disk/square are unaffected.
    """
    fp = footprint if footprint is not None else disk(1)
    offsets = [(-dy, -dx) for dy, dx in _footprint_offsets(fp)]
    m = jnp.asarray(mask).astype(bool)
    return _shift_fold(m, offsets, False, jnp.logical_or)


def binary_opening(mask: jax.Array, footprint: np.ndarray | None = None) -> jax.Array:
    """Erosion followed by dilation: removes specks smaller than the footprint."""
    fp = footprint if footprint is not None else disk(1)
    return binary_dilation(binary_erosion(mask, fp), fp)


def binary_closing(mask: jax.Array, footprint: np.ndarray | None = None) -> jax.Array:
    """Dilation followed by erosion: fills gaps smaller than the footprint."""
    fp = footprint if footprint is not None else disk(1)
    return binary_erosion(binary_dilation(mask, fp), fp)


@partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects(mask: jax.Array, min_size: int = 64, connectivity: int = 2) -> jax.Array:
    """Remove connected components smaller than `min_size` pixels."""
    from .labeling import label

    lbl = label(jnp.asarray(mask).astype(bool), connectivity)
    n = lbl.size
    counts = jnp.zeros(n + 1, dtype=jnp.int32).at[lbl.ravel()].add(1)
    keep = counts[lbl] >= min_size
    return jnp.where(lbl > 0, keep, False)


@partial(jax.jit, static_argnames=("area_threshold", "connectivity"))
def remove_small_holes(
    mask: jax.Array, area_threshold: int = 64, connectivity: int = 1
) -> jax.Array:
    """Fill background holes smaller than `area_threshold` pixels.

    Holes are background components not connected to the border background.
    """
    from .labeling import label

    m = jnp.asarray(mask).astype(bool)
    bg_lbl = label(~m, connectivity)
    n = bg_lbl.size
    counts = jnp.zeros(n + 1, dtype=jnp.int32).at[bg_lbl.ravel()].add(1)
    # background components touching the border are "outside", never filled
    border_vals = jnp.concatenate([bg_lbl[0, :], bg_lbl[-1, :], bg_lbl[:, 0], bg_lbl[:, -1]])
    outside = jnp.zeros(n + 1, dtype=bool).at[border_vals].set(True)
    is_hole = (~m) & (~outside[bg_lbl]) & (counts[bg_lbl] < area_threshold)
    return m | is_hole
