"""Pallas kernel: multi-iteration masked heat diffusion for masks_to_flows.

The QC flow recomputation (`flows.masks_to_flows`, the Cellpose criterion at
reference model.py:49-64 / dynamics) runs n_iter=128 Jacobi iterations of

    T <- where(fg, (T + sum_{4-nbr, same label} T) / 5 + source, 0)

over the full label image. This kernel applies the classic overlapped-tiling
("temporal blocking") stencil transform: each grid cell DMAs one
(ts + 2*halo)^2 tile into VMEM and runs up to `halo` iterations there before
writing the exact ts^2 interior back - HBM traffic drops by a factor of
`halo`, and the stencil itself runs at VPU speed on VMEM-resident values.

STATUS (measured on a real v5e chip, round 3): the kernel is OPT-IN and the
dense XLA loop is the production default. XLA fuses each dense iteration
into a single HBM pass, landing the 128-iteration 2048^2 diffusion at
~8.2 ms/img - the HBM roofline - while this kernel measured ~12 ms/img at
ts=256 (pltpu.roll shifts plus the 2.25x halo-overlap recompute outweigh
the traffic saved) and ts=512/halo=64 exceeds the 16 MB scoped-vmem limit
on 2048^2 inputs (16.15 MB scoped allocation, Mosaic stack OOM). Kept,
parity-tested, for hardware/shape regimes where the tradeoff flips.

After k iterations, values within distance (halo - k) of the tile edge are
still exact, so the interior is bit-identical to the dense loop (pinned by
tests/test_models.py in interpreter mode and tests_tpu/ through real Mosaic
lowering). Inputs are pre-padded by `halo` so every DMA is in bounds; label
padding 0 = background reproduces the dense loop's zero-flux boundary.

Mosaic constraints shape two choices here (both caught by the on-chip lane,
not interpret mode):
- HBM->VMEM DMA slices must be lane-aligned: the tile edge ts + 2*halo has
  to be a multiple of 128, hence the default halo of 64 (512 + 2*64 = 640).
  A larger halo also means fewer passes (128 iterations = 2 passes).
- A vmapped pallas_call over ANY-memory-space operands produces a batched
  BlockSpec Mosaic cannot lower, so the per-pass call carries a
  `sequential_vmap` rule: under vmap (the plate path maps well programs
  with jax.vmap) the batch lowers to lax.map over the 2D kernel. That costs
  nothing - a Pallas grid executes sequentially on a TensorCore anyway, so
  batch-in-grid and batch-in-lax.map schedule identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["diffuse_pallas", "diffuse_xla"]

_OFFS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def diffuse_xla(lbl: jax.Array, source: jax.Array, n_iter: int) -> jax.Array:
    """Reference/fallback dense loop (the original masks_to_flows body)."""
    h, w = lbl.shape
    fg = lbl > 0
    lbl_pad = jnp.pad(lbl, 1, constant_values=-1)
    same_nbr = {
        (dy, dx): lax.dynamic_slice(lbl_pad, (1 + dy, 1 + dx), (h, w)) == lbl
        for dy, dx in _OFFS
    }

    def diffuse(_, T):
        Tp = jnp.pad(T, 1)
        acc = T
        for dy, dx in _OFFS:
            shifted = lax.dynamic_slice(Tp, (1 + dy, 1 + dx), (h, w))
            acc = acc + jnp.where(same_nbr[(dy, dx)], shifted, 0.0)
        return jnp.where(fg, acc / 5.0 + source, 0.0)

    return lax.fori_loop(0, n_iter, diffuse, source)


def _diffuse_kernel(lbl_hbm, t_hbm, src_hbm, out_ref, lbl_v, t_v, src_v, sems,
                    *, ts: int, halo: int, iters: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    size = ts + 2 * halo

    cp_l = pltpu.make_async_copy(
        lbl_hbm.at[pl.ds(i * ts, size), pl.ds(j * ts, size)], lbl_v, sems.at[0]
    )
    cp_t = pltpu.make_async_copy(
        t_hbm.at[pl.ds(i * ts, size), pl.ds(j * ts, size)], t_v, sems.at[1]
    )
    cp_s = pltpu.make_async_copy(
        src_hbm.at[pl.ds(i * ts, size), pl.ds(j * ts, size)], src_v, sems.at[2]
    )
    cp_l.start()
    cp_t.start()
    cp_s.start()
    cp_l.wait()
    cp_t.wait()
    cp_s.wait()

    lbl = lbl_v[:]
    src = src_v[:]
    fg = lbl > 0

    # Neighbor shifts as circular rolls (Mosaic-native; avoids in-kernel
    # pad/concat). Wrap-around only corrupts the tile's outermost ring,
    # and ring corruption propagates inward one pixel per iteration - with
    # iters <= halo it never reaches the ts^2 interior that is written back,
    # so the result stays bit-identical to the dense loop.
    def shift(a, dy, dx):
        # want shifted[i, j] = a[i+dy, j+dx]; pltpu.roll requires a
        # non-negative shift s where rolled[i] = a[(i - s) % n]
        out = a
        if dy:
            out = pltpu.roll(out, (-dy) % out.shape[0], 0)
        if dx:
            out = pltpu.roll(out, (-dx) % out.shape[1], 1)
        return out

    # same-label neighbor masks are loop-invariant: hoist them
    same = [shift(lbl, dy, dx) == lbl for dy, dx in _OFFS]

    def body(_, T):
        acc = T
        for (dy, dx), sm in zip(_OFFS, same):
            acc = acc + jnp.where(sm, shift(T, dy, dx), 0.0)
        return jnp.where(fg, acc / 5.0 + src, 0.0)

    T = lax.fori_loop(0, iters, body, t_v[:])
    out_ref[:] = T[halo : halo + ts, halo : halo + ts]


@functools.lru_cache(maxsize=None)
def _make_pass(ts: int, halo: int, iters: int, interpret: bool):
    """One temporally-blocked pass (`iters` <= `halo` Jacobi iterations) as
    a sequentially-vmappable function of the halo-padded operands."""
    size = ts + 2 * halo

    @jax.custom_batching.sequential_vmap
    def one_pass(lbl_p: jax.Array, t_p: jax.Array, src_p: jax.Array):
        hp, wp = lbl_p.shape
        h, w = hp - 2 * halo, wp - 2 * halo
        return pl.pallas_call(
            functools.partial(_diffuse_kernel, ts=ts, halo=halo, iters=iters),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            grid=(h // ts, w // ts),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ts, ts), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((size, size), jnp.int32),
                pltpu.VMEM((size, size), jnp.float32),
                pltpu.VMEM((size, size), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(lbl_p, t_p, src_p)

    return one_pass


@functools.partial(
    jax.jit, static_argnames=("n_iter", "ts", "halo", "interpret")
)
def diffuse_pallas(
    lbl: jax.Array,
    source: jax.Array,
    n_iter: int,
    ts: int = 256,
    halo: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Temporally-blocked diffusion; H and W must be multiples of `ts`.

    Runs ceil(n_iter / halo) Pallas passes of `halo` iterations each (the
    last pass runs the remainder). Exactly equal to `diffuse_xla`. For
    compiled (non-interpret) runs, `ts + 2*halo` must be a multiple of 128
    (Mosaic DMA lane alignment) and of 8 (sublane alignment). ts defaults
    to 256: ts=512 with halo 64 exceeds the 16 MB scoped-vmem limit when
    compiled against 2048^2 inputs (measured on v5e, round 3).
    """
    h, w = lbl.shape
    assert h % ts == 0 and w % ts == 0, (h, w, ts)
    size = ts + 2 * halo
    if not interpret:
        assert size % 128 == 0, (
            f"compiled diffuse_pallas needs (ts + 2*halo) % 128 == 0 for "
            f"DMA lane alignment; got ts={ts}, halo={halo} -> {size}"
        )

    T = source
    remaining = n_iter
    while remaining > 0:
        iters = min(halo, remaining)
        remaining -= iters
        lbl_p = jnp.pad(lbl, halo)  # 0 = background beyond the image
        t_p = jnp.pad(T, halo)
        src_p = jnp.pad(source, halo)
        T = _make_pass(ts, halo, iters, interpret)(lbl_p, t_p, src_p)
    return T
