"""Foreground compaction: sort the sparse foreground once, measure on the
compact set.

Microscopy masks are sparse (cells cover ~5-25% of a well image), but the
round-1 measurement kernels paid full-image cost: every segment reduction
scanned all H*W pixels. One 2-operand sort of (root, linear-index) pairs
buys, simultaneously:

- **compaction**: foreground pixels land in a static-size prefix, so every
  downstream reduction shrinks by the background fraction;
- **grouping**: pixels arrive segment-contiguous, so compact segment ids are
  a cumulative sum over first-occurrence flags - no rank gather, no
  relabel pass (each 4M-pixel gather costs ~40 ms on this toolchain);
- **scan-order numbering**: roots are component-minimum linear indices, so
  ascending roots = ascending first-pixel position = skimage's label order;
- **the component count**: the number of distinct roots, needed to guard the
  static `max_cells` capacity (a silent-overflow fix, ADVICE round 1).

Replaces the reference's relabel/regionprops bookkeeping
(`src/arcadia_microscopy_tools/masks.py:38-65`) in the plate hot path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["CompactSegments", "compact_by_root"]


class CompactSegments(NamedTuple):
    """Foreground pixels grouped by component, padded to a static capacity.

    Attributes:
        seg: (cap,) int32 compact segment id per pixel, 1..num_components in
            component scan order; 0 on padding slots.
        idx: (cap,) int32 linear pixel index into the source image.
        valid: (cap,) bool - True where the slot holds a real pixel.
        num_components: () int32 total distinct components in the image
            (may exceed what fits in downstream max_cells slots).
        fg_count: () int32 total foreground pixels in the image.
        overflow: () bool - True when fg_count > cap, i.e. pixels were
            dropped and measurements are untrustworthy.
    """

    seg: jax.Array
    idx: jax.Array
    valid: jax.Array
    num_components: jax.Array
    fg_count: jax.Array
    overflow: jax.Array


@partial(jax.jit, static_argnames=("cap",))
def compact_by_root(roots: jax.Array, cap: int) -> CompactSegments:
    """Group foreground pixels by component root into a static-size prefix.

    Args:
        roots: (H, W) int32 component-root image from
            `labeling.component_roots` (sentinel = H*W on background).
        cap: Static capacity for foreground pixels. Background sorts to the
            end, so any cap >= the true foreground count is lossless;
            `overflow` reports violations.

    Returns:
        CompactSegments (see class docstring).
    """
    n = roots.size
    flat = roots.ravel()
    iota = jnp.arange(n, dtype=jnp.int32)
    s, p = lax.sort((flat, iota), num_keys=1)

    is_new = s != jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    fg_sorted = s < n
    num_components = jnp.sum((is_new & fg_sorted).astype(jnp.int32))
    fg_count = jnp.sum(fg_sorted.astype(jnp.int32))

    s_c = s[:cap]
    valid = s_c < n
    seg = jnp.cumsum((is_new[:cap] & valid).astype(jnp.int32))
    seg = jnp.where(valid, seg, 0)

    return CompactSegments(
        seg=seg,
        idx=p[:cap],
        valid=valid,
        num_components=num_components,
        fg_count=fg_count,
        overflow=fg_count > cap,
    )
