"""Pallas kernel: fused per-lane (sum, sum-of-squares) GroupNorm moments.

GroupNorm (reference model's per-block normalization; see
`unet._group_norm`) is memory-bound: at the U-Net's high-resolution levels
a (2, 1024, 1024, 128) bf16 activation is 0.5 GB, and the XLA lowering of
the one-pass moments + normalize measured 3.6 ms/block on v5e - ~27% of the
819 GB/s HBM roofline - with the moment reductions (sum and sum-of-squares
issued as separate sweeps) eating most of it. This kernel fuses BOTH
moment accumulations into ONE pass over the activation: each grid step
loads a (T, C) tile, reduces it to an (8, C) f32 partial in registers, and
accumulates into a revisited (16, C) output block (rows 0-7 sum, 8-15
sum-of-squares). The group fold, rsqrt, and the normalize itself stay in
XLA - the fold is O(C) and the normalize is a single fused elementwise
affine that XLA already runs at roofline.

The kernel is numerically identical in accumulation dtype to the XLA path
(bf16/f32 values, f32 accumulation); only the reduction ORDER differs
(blockwise partials vs XLA's row sweep), which moves moments by ~1 ulp.

Like every Mosaic kernel in this package the call is gated OUTSIDE jit
(backend == TPU, shapes tile) and carries a `sequential_vmap` rule: the
plate runtime vmaps well programs, and a batched BlockSpec does not lower
(see models/flows_pallas.py - a Pallas grid is sequential on a TensorCore,
so batch-in-lax.map schedules identically to batch-in-grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_pallas", "gn_pallas_viable", "lane_moments"]

# (T, C) tile rows per grid step. 8192 x 128 bf16 = 2 MB - double-buffered
# in-spec stays well under the 16 MB scoped-VMEM budget at C=256.
_T_MAX = 8192


def _pick_tile(hw: int) -> int:
    t = _T_MAX
    while t >= 8:
        if hw % t == 0:
            return t
        t //= 2
    return 0


def gn_pallas_viable(shape: tuple[int, ...]) -> bool:
    """Static viability: 4-D NHWC, lane-aligned channels, tileable area,
    TPU default backend. Resolved outside jit into a static cache key."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if c % 128 != 0 or c > 512:
        return False
    if _pick_tile(h * w) < 8:
        return False
    return jax.devices()[0].platform not in ("cpu",)


def _moments_kernel(x_ref, out_ref):
    f = x_ref[0].astype(jnp.float32)  # (T, C)
    t, c = f.shape
    s1 = jnp.sum(f.reshape(t // 8, 8, c), axis=0)  # (8, C)
    s2 = jnp.sum(jnp.square(f).reshape(t // 8, 8, c), axis=0)
    part = jnp.concatenate([s1, s2], axis=0)  # (16, C)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = part

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        out_ref[0] += part


@functools.lru_cache(maxsize=None)
def _moments_call(t: int, interpret: bool):
    @jax.custom_batching.sequential_vmap
    def call(x2: jax.Array) -> jax.Array:
        b, hw, c = x2.shape
        return pl.pallas_call(
            _moments_kernel,
            grid=(b, hw // t),
            in_specs=[
                pl.BlockSpec((1, t, c), lambda bi, ni: (bi, ni, 0)),
            ],
            out_specs=pl.BlockSpec((1, 16, c), lambda bi, ni: (bi, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, 16, c), jnp.float32),
            interpret=interpret,
        )(x2)

    return call


def lane_moments(
    x: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """One-pass per-lane (sum, sum-of-squares) over the spatial axes of an
    NHWC tensor: (B, H, W, C) -> two (B, C) float32 rows. Caller must have
    checked `gn_pallas_viable(x.shape)`."""
    b, h, w, c = x.shape
    t = _pick_tile(h * w)
    x2 = x.reshape(b, h * w, c)
    m = _moments_call(t, interpret)(x2)  # (B, 16, C)
    return jnp.sum(m[:, :8], axis=1), jnp.sum(m[:, 8:], axis=1)


def group_norm_pallas(x, scale, bias, groups, interpret: bool = False):
    """`unet._group_norm` with the moment sweep in the fused Pallas kernel.

    Same statistics (f32 accumulation over the (H, W, C//g) set, contiguous
    channel groups) and the same normalize expression; XLA fuses the
    normalize into one roofline elementwise pass.
    """
    b, h, w, c = x.shape
    g = min(groups, c)
    cg = c // g
    n = h * w * cg
    s1, s2 = lane_moments(x, interpret)
    mean = s1.reshape(b, g, cg).sum(axis=2) / n  # (b, g)
    var = s2.reshape(b, g, cg).sum(axis=2) / n - mean * mean
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
    inv_c = jnp.repeat(lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5), cg, axis=1)[
        :, None, None, :
    ]
    out = (x.astype(jnp.float32) - mean_c) * (inv_c * scale) + bias
    return out.astype(x.dtype)
