"""Cross-chip collectives for sharded image compute.

The spatial analogue of sequence parallelism (SURVEY.md section 2.4): when a
single large image is sharded across chips along Y, stencil ops (Gaussian,
median, morphology) need their neighbors' border rows - a ring-style halo
exchange over ICI via `lax.ppermute` - and global statistics (percentiles,
histogram thresholds) need a two-pass reduction: local histograms, `psum`
across the mesh, then a threshold decision identical on every chip.

All functions here are written for use inside `shard_map` over a mesh axis.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec

__all__ = [
    "halo_exchange",
    "sharded_histogram_uint16",
    "sharded_otsu_threshold",
    "sharded_gaussian_filter",
]


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a Y-sharded block with `halo` rows from ring neighbors.

    Input (..., H_local, W) -> output (..., H_local + 2*halo, W). Outermost
    shards get edge-replicated rows (matching the single-chip "nearest"
    boundary), so a sharded stencil equals the unsharded one exactly.
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    top_rows = x[..., :halo, :]
    bottom_rows = x[..., -halo:, :]

    # send my bottom rows down (to idx+1), my top rows up (to idx-1)
    from_above = lax.ppermute(bottom_rows, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = lax.ppermute(top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    # first shard: replicate its own top edge; last shard: its own bottom edge
    edge_top = jnp.repeat(x[..., :1, :], halo, axis=-2)
    edge_bottom = jnp.repeat(x[..., -1:, :], halo, axis=-2)
    above = jnp.where(idx == 0, edge_top, from_above)
    below = jnp.where(idx == n - 1, edge_bottom, from_below)

    return jnp.concatenate([above, x, below], axis=-2)


def sharded_histogram_uint16(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Global 65536-bin histogram of a sharded uint16 image: local bincount
    then psum over the mesh axis."""
    flat = jnp.sort(jnp.ravel(x_local).astype(jnp.int32))
    edges = jnp.arange(65537, dtype=jnp.int32)
    local = jnp.searchsorted(flat, edges[1:], side="left") - jnp.searchsorted(
        flat, edges[:-1], side="left"
    )
    return lax.psum(local.astype(jnp.float32), axis_name)


def sharded_otsu_threshold(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Otsu threshold of a sharded uint16 image - bit-identical to the
    single-chip threshold because the global histogram is exact."""
    from ..ops.threshold import _otsu_from_hist

    counts = sharded_histogram_uint16(x_local, axis_name)
    centers = jnp.arange(65536, dtype=jnp.float32)
    return _otsu_from_hist(counts, centers)


def sharded_gaussian_filter(
    x_local: jax.Array, sigma: float, axis_name: str, truncate: float = 4.0
) -> jax.Array:
    """Gaussian blur of a Y-sharded image: halo exchange + local conv.

    Matches the unsharded `ops.filters.gaussian_filter` (mode="nearest")
    exactly, because interior halos carry true neighbor rows and exterior
    halos replicate the global edge.
    """
    from ..ops.filters import _conv_separable_last2, _gaussian_kernel_1d, _pad_last2

    kernel = _gaussian_kernel_1d(sigma, truncate)
    radius = (len(kernel) - 1) // 2
    padded = halo_exchange(x_local.astype(jnp.float32), radius, axis_name)
    # X axis is unsharded: ordinary edge padding
    padded = _pad_last2(padded, 0, radius, "nearest")
    return _conv_separable_last2(padded, kernel, kernel)


def make_sharded_otsu(mesh: Mesh, axis_name: str = "space"):
    """jit-compiled global-Otsu over a mesh axis (convenience wrapper)."""
    from jax.experimental.shard_map import shard_map

    spec = PartitionSpec(axis_name)

    @jax.jit
    def run(x):
        fn = shard_map(
            lambda xl: sharded_otsu_threshold(xl, axis_name),
            mesh=mesh,
            in_specs=(spec,),
            out_specs=PartitionSpec(),
        )
        return fn(x)

    return run
