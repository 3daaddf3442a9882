"""Pallas kernel: large-window rank selection (median / percentile filters).

The XLA rank filters in ops/filters.py materialize all window^2 shifted views
(O(window^2 * image) memory), which caps them at window <= 9; skimage's rank
filters have no such limit. This kernel computes exact per-pixel order
statistics with O(tile) memory: each grid step holds one 128x128 output tile
(plus its halo) in VMEM and runs a 32-step bit-plane bisection per pixel -
no sort, no materialized views, and the whole window scan stays VMEM-resident
(the equivalent XLA formulation would stream 32*window^2 full-image compares
through HBM).

Algorithm (per pixel): map float32 values to order-isomorphic int32 keys
(IEEE sign-magnitude -> two's complement: `key = bits < 0 ? bits ^ 0x7FFFFFFF
: bits`, an involution), then binary-search the k-th smallest key MSB-first:
the candidate-prefix invariant `count(key < prefix) <= k` is maintained by
counting window keys below each trial prefix (window^2 vectorized compares
over the tile). 32 rounds pin all 32 bits, so the result is an EXACT element
value - no quantization - and bitcasts straight back to float32.

Halo handling without overlapping BlockSpecs: the padded image is embedded in
a canvas with one extra 128-block ring, and the kernel receives the SAME
canvas through nine BlockSpecs indexed at the 3x3 block neighborhood - the
assembled (3*128)^2 view covers any radius <= 128. HBM read amplification is
9x the image (~0.15 ms at 2048^2) - noise next to the compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_select_pallas", "rank_pallas_viable", "RANK_BLOCK_COLS"]

RANK_BLOCK_COLS = 128  # lane-aligned minor block dimension
# Conservative scoped-VMEM budget for the window^2 per-offset compare
# temporaries Mosaic keeps live inside the unrolled count (the 16 MB scoped
# limit has to also cover the assembled 3x3 neighborhood and loop states,
# and Mosaic's stack accounting runs ~2-3x the naive estimate - measured:
# a 10 MB naive estimate hit the 16 MB scoped limit at 25.5 MB).
_VMEM_BUDGET = 4 * 2**20


def _pick_block_rows(window: int) -> int | None:
    """Largest sublane-aligned tile height whose unrolled count fits VMEM
    (and whose single-block halo covers the window radius)."""
    r = window // 2
    for rows in (128, 64, 32, 16, 8):
        if rows >= r and window * window * rows * RANK_BLOCK_COLS * 4 <= _VMEM_BUDGET:
            return rows
    return None


def rank_pallas_viable(window: int) -> bool:
    return _pick_block_rows(window) is not None


def _float_to_key(bits: jax.Array) -> jax.Array:
    """Order-isomorphic int32 key of a float32's raw bits (involution)."""
    return jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)


def _rank_kernel(*refs, window: int, ranks: tuple[int, ...]):
    (a00, a01, a02, a10, a11, a12, a20, a21, a22), outs = refs[:9], refs[9:]
    br, bc = a11.shape
    r = window // 2

    full = jnp.concatenate(
        [
            jnp.concatenate([a00[:], a01[:], a02[:]], axis=1),
            jnp.concatenate([a10[:], a11[:], a12[:]], axis=1),
            jnp.concatenate([a20[:], a21[:], a22[:]], axis=1),
        ],
        axis=0,
    )
    win = full[br - r : 2 * br + r, bc - r : 2 * bc + r]
    skey = _float_to_key(lax.bitcast_convert_type(win, jnp.int32))

    def count_lt(cand):
        """Per-center count of window keys strictly below cand (vectorized
        over the tile; offsets are static so every slice is static)."""
        c = jnp.zeros((br, bc), jnp.int32)
        for dy in range(window):
            for dx in range(window):
                c = c + (
                    skey[dy : dy + br, dx : dx + bc] < cand
                ).astype(jnp.int32)
        return c

    for out_ref, k in zip(outs, ranks):
        kk = jnp.int32(k)

        # MSB-first bisection over the signed key space. One loop covers all
        # 32 bits: at t=0 the candidate is prefix + (1<<31), which wraps
        # -2^31 + -2^31 -> 0 in two's complement - exactly the sign-bit
        # split - so the sign round needs no separate (VMEM-hungry)
        # count_lt instantiation outside the loop.
        def body(t, prefix):
            cand = prefix + (jnp.int32(1) << (jnp.int32(31) - t))
            return jnp.where(count_lt(cand) <= kk, cand, prefix)

        prefix = lax.fori_loop(0, 32, body, jnp.full((br, bc), -(2**31), jnp.int32))
        vbits = jnp.where(prefix < 0, prefix ^ jnp.int32(0x7FFFFFFF), prefix)
        out_ref[:] = lax.bitcast_convert_type(vbits, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("window", "ranks", "pad_mode", "interpret")
)
def rank_select_pallas(
    x: jax.Array,
    window: int,
    ranks: tuple[int, ...],
    pad_mode: str = "reflect",
    interpret: bool = False,
) -> jax.Array:
    """Exact k-th order statistics over a (window x window) neighborhood.

    Args:
        x: 2D float32 image (any shape; padded internally).
        window: neighborhood side (any size with window//2 <= 128).
        ranks: 0-indexed order statistics to extract (e.g. (k//2,) for an
            odd-window median, (k//2-1, k//2) for even).
        pad_mode: scipy-style boundary mode (reflect/nearest/mirror/...).

    Returns:
        (len(ranks), H, W) float32 array of selected values.
    """
    from .filters import _pad_last2

    h, w = x.shape
    r = window // 2
    br = _pick_block_rows(window)
    bc = RANK_BLOCK_COLS
    if br is None or r > bc:
        raise ValueError(
            f"window {window} exceeds the Pallas rank kernel's VMEM budget; "
            "use the strip-chunked path"
        )
    gh = -(-h // br)
    gw = -(-w // bc)

    padded = _pad_last2(x.astype(jnp.float32), r, r, pad_mode)
    canvas = jnp.zeros(((gh + 2) * br, (gw + 2) * bc), jnp.float32)
    # image pixel (y, x) sits at canvas (br + y, bc + x); its halo stays
    # inside the canvas for any radius <= min(br, bc)
    canvas = lax.dynamic_update_slice(canvas, padded, (br - r, bc - r))

    def _shifted(di: int, dj: int):
        return lambda i, j: (i + di, j + dj)

    specs = [
        pl.BlockSpec((br, bc), _shifted(di, dj), memory_space=pltpu.VMEM)
        for di in range(3)
        for dj in range(3)
    ]
    out_spec = pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_rank_kernel, window=window, ranks=tuple(ranks)),
        out_shape=[
            jax.ShapeDtypeStruct((gh * br, gw * bc), jnp.float32) for _ in ranks
        ],
        grid=(gh, gw),
        in_specs=specs,
        out_specs=[out_spec] * len(ranks),
        interpret=interpret,
    )(*([canvas] * 9))
    return jnp.stack([o[:h, :w] for o in outs])
