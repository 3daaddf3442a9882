"""Pallas kernel: block-local connected-components sweep.

Phase 1 of the two-phase CC labeler (see ops/labeling.py) as a TPU kernel:
each grid step loads one 128x128 mask block into VMEM, runs the complete
in-block min-label fixpoint there (a while_loop over 8-neighbor minimum
sweeps on VMEM-resident values - zero HBM traffic per sweep), and writes the
converged block-local root indices. The XLA fallback pays one full-image HBM
read+write per sweep; the kernel pays one per *block*, total.

Enabled via `labeling.use_pallas_local(True)` or AMT_PALLAS_CC=1; the
pure-XLA path remains the default until the remote TPU toolchain's compile
times for Pallas kernels are characterized. Correctness is locked by
tests that run the kernel in interpreter mode against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["local_cc_pallas", "local_resweep_pallas", "PALLAS_CC_BLOCK"]

PALLAS_CC_BLOCK = 128  # square VMEM block; also the merge-phase block size
_MAX_SWEEPS = 256  # cap on in-block sweeps (early exit on convergence)


def _kernel(fg_ref, out_ref, *, width: int, connectivity: int):
    block = fg_ref.shape[0]
    bi = pl.program_id(0)
    bj = pl.program_id(1)

    fg = fg_ref[:]
    iy = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    gidx = (bi * block + iy) * width + (bj * block + ix)
    sentinel = jnp.int32(2**30)
    lbl0 = jnp.where(fg, gidx, sentinel)

    if connectivity == 2:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    def sweep(lbl):
        padded = jnp.pad(lbl, 1, mode="constant", constant_values=sentinel)
        out = lbl
        for dy, dx in offsets:
            # static slices only: Pallas TPU lowering lacks dynamic_slice
            shifted = padded[1 + dy : 1 + dy + block, 1 + dx : 1 + dx + block]
            out = jnp.minimum(out, shifted)
        return jnp.where(fg, out, sentinel)

    def body(state):
        lbl, it, _ = state
        new = sweep(sweep(lbl))
        return new, it + 2, jnp.any(new != lbl)

    lbl, _, _ = lax.while_loop(
        lambda s: s[2] & (s[1] < _MAX_SWEEPS), body, (lbl0, jnp.int32(0), jnp.bool_(True))
    )
    out_ref[:] = lbl


def _resweep_kernel(fg_ref, init_ref, out_ref, *, connectivity: int):
    """Seeded variant: min-propagate an existing label block to its in-block
    fixpoint. Used to spread boundary-merged global roots into block
    interiors without any full-image gather (see labeling.component_roots)."""
    block = fg_ref.shape[0]
    fg = fg_ref[:]
    sentinel = jnp.int32(2**30)
    lbl0 = jnp.where(fg, init_ref[:], sentinel)

    if connectivity == 2:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    def sweep(lbl):
        padded = jnp.pad(lbl, 1, mode="constant", constant_values=sentinel)
        out = lbl
        for dy, dx in offsets:
            shifted = padded[1 + dy : 1 + dy + block, 1 + dx : 1 + dx + block]
            out = jnp.minimum(out, shifted)
        return jnp.where(fg, out, sentinel)

    def body(state):
        lbl, it, _ = state
        new = sweep(sweep(lbl))
        return new, it + 2, jnp.any(new != lbl)

    lbl, _, _ = lax.while_loop(
        lambda s: s[2] & (s[1] < _MAX_SWEEPS), body, (lbl0, jnp.int32(0), jnp.bool_(True))
    )
    out_ref[:] = lbl


@functools.partial(jax.jit, static_argnames=("connectivity", "interpret"))
def local_cc_pallas(
    fg: jax.Array, connectivity: int = 2, interpret: bool = False
) -> jax.Array:
    """In-block root indices for a boolean mask (sentinel = 2^30 on
    background and any padding). H and W must be multiples of 128."""
    h, w = fg.shape
    block = PALLAS_CC_BLOCK
    if h % block or w % block:
        raise ValueError(f"mask shape {fg.shape} must be a multiple of {block}")

    grid = (h // block, w // block)
    out = pl.pallas_call(
        functools.partial(_kernel, width=w, connectivity=connectivity),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fg)
    return out


@functools.partial(jax.jit, static_argnames=("connectivity", "interpret"))
def local_resweep_pallas(
    fg: jax.Array, init: jax.Array, connectivity: int = 2, interpret: bool = False
) -> jax.Array:
    """Min-propagate existing labels to the in-block fixpoint (seeded sweep).

    `init` carries per-pixel labels where block-boundary pixels have been
    overwritten with their merged global roots; this kernel spreads those
    seeds through each block's connected sets entirely in VMEM.
    """
    h, w = fg.shape
    block = PALLAS_CC_BLOCK
    if h % block or w % block:
        raise ValueError(f"mask shape {fg.shape} must be a multiple of {block}")

    grid = (h // block, w // block)
    spec = pl.BlockSpec((block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_resweep_kernel, connectivity=connectivity),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(fg, init)
    return out
