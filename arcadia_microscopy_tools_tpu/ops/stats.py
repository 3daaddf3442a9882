"""Device-side order statistics and histograms.

Sort-based primitives: a single XLA sort of the flattened image feeds
percentiles (np.percentile "linear" parity, reference operations.py:47,94)
and arbitrary histograms (via vectorized binary search instead of
scatter-add, which maps far better onto the TPU's VPU). For sharded images,
`parallel.collectives` builds two-pass global histograms on top of these.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["percentile", "histogram_int", "histogram_float", "counts_from_sorted"]


def percentile(x: jax.Array, q, axis=None) -> jax.Array:
    """Percentile with linear interpolation, matching np.percentile.

    Computed in float32 on device (values up to 2^24 are exact, which covers
    the uint16 intensity domain).
    """
    return jnp.percentile(jnp.asarray(x, dtype=jnp.float32), jnp.asarray(q), axis=axis)


def counts_from_sorted(flat_sorted: jax.Array, edges: jax.Array) -> jax.Array:
    """Histogram counts from a pre-sorted flat array and bin edges.

    Bin i counts values in [edges[i], edges[i+1]), with the final bin closed
    on the right (np.histogram convention).
    """
    idx = jnp.searchsorted(flat_sorted, edges, side="left")
    counts = jnp.diff(idx)
    # Close the final bin: values exactly equal to edges[-1] belong to it.
    n_at_top = flat_sorted.size - jnp.searchsorted(flat_sorted, edges[-1], side="left")
    return counts.at[-1].add(n_at_top)


@partial(jax.jit, static_argnames=("n_values",))
def histogram_int(x: jax.Array, n_values: int) -> tuple[jax.Array, jax.Array]:
    """Exact per-integer-value histogram over [0, n_values).

    Matches skimage.exposure.histogram's integer path (one bin per integer),
    except bins span the full dtype range with zero counts outside the data
    range; threshold algorithms mask to the occupied range, which makes them
    bit-identical to the min..max-trimmed histogram skimage uses.

    MXU formulation: with hi = v >> 8 and lo = v & 255, the 65536-bin count
    matrix is C[hi, lo] = sum_p onehot_hi[p, hi] * onehot_lo[p, lo] - a
    blockwise (256, B) @ (B, 256) bf16 matmul with exact f32 accumulation
    (counts < 2^24), replacing a full-image sort + 65k binary searches.

    Returns:
        (counts[n_values], centers[n_values]) - centers are the integer values.
    """
    from jax import lax

    flat = jnp.ravel(x).astype(jnp.int32)
    centers = jnp.arange(n_values, dtype=jnp.float32)

    if n_values <= 256:
        # single-level one-hot matmul
        block = 16384
        pad = (-flat.size) % block
        v = jnp.pad(flat, (0, pad), constant_values=n_values)  # pad bin dropped
        k = v.size // block
        vb = v.reshape(k, block)
        iota = lax.broadcasted_iota(jnp.int32, (block, n_values), 1)
        ones = jnp.ones((1, block), jnp.bfloat16)

        def body(carry, labels):
            onehot = (labels[:, None] == iota).astype(jnp.bfloat16)
            return carry + lax.dot_general(
                ones, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0], None

        counts, _ = lax.scan(body, jnp.zeros((n_values,), jnp.float32), vb)
        return counts, centers

    if n_values != 65536:
        raise ValueError(f"histogram_int supports <=256 or 65536 bins, got {n_values}")

    block = 8192
    pad = (-flat.size) % block
    # padded slots: send them to a dropped sentinel column (hi=256)
    v = jnp.pad(flat, (0, pad), constant_values=-1)
    k = v.size // block
    vb = v.reshape(k, block)
    iota256 = lax.broadcasted_iota(jnp.int32, (block, 256), 1)

    def body(carry, labels):
        hi = jnp.where(labels >= 0, labels >> 8, 256)
        lo = jnp.where(labels >= 0, labels & 255, 256)
        onehot_hi = (hi[:, None] == iota256).astype(jnp.bfloat16)  # (B, 256)
        onehot_lo = (lo[:, None] == iota256).astype(jnp.bfloat16)
        partial_counts = lax.dot_general(
            onehot_hi, onehot_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 256)
        return carry + partial_counts, None

    counts2d, _ = lax.scan(body, jnp.zeros((256, 256), jnp.float32), vb)
    return counts2d.reshape(65536), centers


@partial(jax.jit, static_argnames=("nbins",))
def histogram_float(x: jax.Array, nbins: int = 256) -> tuple[jax.Array, jax.Array]:
    """nbins-bin histogram over [min, max] (np.histogram bin semantics).

    Matches skimage.exposure.histogram's float path: bin centers are midpoints
    of uniform bins spanning the data range.
    """
    flat = jnp.sort(jnp.ravel(x).astype(jnp.float32))
    lo, hi = flat[0], flat[-1]
    span = jnp.where(hi > lo, hi - lo, jnp.float32(1.0))
    edges = lo + span * jnp.arange(nbins + 1, dtype=jnp.float32) / nbins
    counts = counts_from_sorted(flat, edges)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return counts.astype(jnp.float32), centers


def integer_bin_count(dtype) -> int | None:
    """Number of per-integer histogram bins for a dtype (None for floats)."""
    import numpy as np

    dt = np.dtype(dtype)
    if dt.kind == "b":
        return 2
    if dt.kind == "u":
        return int(np.iinfo(dt).max) + 1 if np.iinfo(dt).bits <= 16 else None
    if dt.kind == "i":
        # Signed integer images: microscopy intensities are non-negative in
        # practice; fall back to the float path for wide signed types.
        return int(np.iinfo(dt).max) + 1 if np.iinfo(dt).bits <= 16 else None
    return None
