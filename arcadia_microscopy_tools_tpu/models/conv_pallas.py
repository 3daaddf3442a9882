"""Pallas kernel: fused 3x3 conv with GN-affine prologue and moment outputs.

Why this exists (round-4 on-chip measurements): XLA runs the U-Net's 3x3
convs themselves at ~95% of v5e bf16 peak, but every conv -> GroupNorm ->
conv boundary costs ~6 ms/img at the (1024^2, 128ch) S2D level shapes - the
conv picks a blocked internal layout, the GN reduce wants a linear one, and
XLA materializes relayout copies + halo pads on both sides (xprof: 19.4 ms
of `copy` + 8.1 ms of `pad` per image inside the 77 ms forward). A
conv+GN+relu chain microbenchmark measures 7.8 ms/img/conv against a 1.57 ms
MXU floor (tools/prof_conv_exp.py), NCHW identical, 9-tap XLA dots 2.4x
worse.

This kernel removes the boundary entirely:

- the 3x3 conv runs as 9 shifted MXU matmuls over a row-slab DMA'd into
  VMEM (halo rows fetched explicitly; SAME zero-padding reconstructed
  in-register, so the input is NEVER materialized in padded form in HBM);
- the PREVIOUS GroupNorm's normalize+affine+relu is applied to the slab as
  a per-channel affine prologue (GN statistics fold into per-(batch,
  channel) scale/bias on the host side of the kernel - O(B*C) math in XLA);
- the NEXT GroupNorm's moment sums (sum, sum-of-squares per channel) are
  accumulated by the same kernel into a revisited (16, Co) output block
  (rows 0-7 sum, 8-15 sum-of-squares, both over the bf16-cast output,
  matching `unet._group_norm`'s f32-accumulated statistics of a bf16
  activation);
- an optional `accum` input is added to the conv result before the cast,
  which fuses the decoder's split-kernel sum conv(g, Wup) + conv(skip, Wsk)
  (models/unet_s2d.py) into two kernel calls with no extra HBM round trip
  for the sum.

HBM traffic per conv call: one read of the input (+2 halo rows/block), one
write of the output - the roofline minimum.

Like every Mosaic kernel in this package the call is gated OUTSIDE jit
(backend == TPU, shapes tile; `conv_pallas_viable`) and carries a
`sequential_vmap` rule so the plate runtime's well-vmap lowers (a Pallas
grid is sequential on a TensorCore; batch-in-lax.map schedules identically
to batch-in-grid). PRODUCTION for the standalone forward since round 5:
`apply_unet_s2d` routes every viable stride-1 3x3 conv through this kernel
by default on TPU (fused-block variants in models/unet_s2d.py; forward
74.3 -> 61.3 ms/img at 2048^2 on v5e, vs the reference's intra-image patch
batching at src/arcadia_microscopy_tools/model.py:43-45). The PLATE
program opts OUT (parallel/plate._plate_pallas_conv): composed into the
full well program the 12 Mosaic scheduling barriers cost more than the
kernels save (6.31 -> 5.83 img/s/chip measured round 5) - the same
composed-regression pattern as the GroupNorm kernel (round 4). Opt out
everywhere with AMT_PALLAS_CONV=0; opt the plate back in with
AMT_PALLAS_CONV_PLATE=1; spatially-sharded callers pass pallas_conv=False
(a Mosaic call cannot be partitioned along a sharded image axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3x3_fused",
    "conv_pallas_viable",
    "gn_affine_params",
]


def _pick_th(h: int, w: int, c: int, co: int) -> int:
    """Rows per grid step: largest TH <= 16 dividing H whose working set
    (bf16 slab + padded slab + f32 accumulator + bf16 out block) fits a
    ~12 MB VMEM budget."""
    for th in (16, 8, 4):
        if h % th:
            continue
        slab = (th + 2) * w * c * 2
        ap = (th + 2) * (w + 2) * c * 2
        acc = th * w * co * 4
        out = th * w * co * 2
        if slab + ap + acc + out + 9 * c * co * 2 <= 12 * 1024 * 1024:
            return th
    return 0


def conv_pallas_viable(shape: tuple[int, ...], co: int) -> bool:
    """Static viability gate, resolved outside jit: NHWC with lane-aligned
    channels, tileable rows, TPU default backend."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    # c must be lane-aligned to 128: the kernel's manual row-slab DMA
    # (x_ref.at[b, ds(...)]) slices an HBM memref whose minor dim must align
    # to the (8, 128) tiling - Mosaic rejects c=64 at compile time ("Slice
    # shape along dimension 3 must be aligned to tiling (128)"), measured
    # on v5e round 5. Interpreter-mode tests still exercise c=64 math.
    if c % 128 or co % 128 or w % 128 or h < 8:
        return False
    if _pick_th(h, w, c, co) == 0:
        return False
    import os

    if os.environ.get("AMT_PALLAS_CONV_INTERPRET", "0") == "1":
        return True  # interpreter-mode CPU testing (see conv3x3_fused)
    return jax.devices()[0].platform not in ("cpu",)


def gn_affine_params(s1, s2, scale, bias, groups: int, n: int):
    """Fold GroupNorm statistics + learned affine into per-(batch, channel)
    scale/bias rows for the kernel prologue.

    (s1, s2): (B, C) f32 channel sums / sums-of-squares over H*W pixels
    (the kernel's moment outputs). `n = H * W * (C // groups)` elements per
    group. Returns (B, C) f32 (eff_scale, eff_bias) with
    eff(x) = (x - mean_g) * rsqrt(var_g + eps) * scale_c + bias_c.
    Identical statistics math to `unet._group_norm` (f32, same eps)."""
    b, c = s1.shape
    g = min(groups, c)
    cg = c // g
    mean = s1.reshape(b, g, cg).sum(axis=2) / n
    var = s2.reshape(b, g, cg).sum(axis=2) / n - mean * mean
    inv = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    mean_c = jnp.repeat(mean, cg, axis=1)
    inv_c = jnp.repeat(inv, cg, axis=1)
    eff_scale = inv_c * scale[None, :]
    eff_bias = bias[None, :] - mean_c * eff_scale
    return eff_scale.astype(jnp.float32), eff_bias.astype(jnp.float32)


def _kernel(
    # refs: x (HBM), w, [sc, bi], [accum], y, [m], slab scratch, sem
    *refs,
    th: int,
    h: int,
    w_: int,
    has_prologue: bool,
    relu: bool,
    has_accum: bool,
    emit_moments: bool,
):
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    sc_ref = next(it) if has_prologue else None
    bi_ref = next(it) if has_prologue else None
    acc_ref = next(it) if has_accum else None
    y_ref = next(it)
    m_ref = next(it) if emit_moments else None
    slab = next(it)
    sem = next(it)

    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    # row-slab fetch: interior rows always, halo rows only off the image
    # edge (edge halos are zeroed - SAME padding)
    main = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * th, th)], slab.at[pl.ds(1, th)], sem
    )
    main.start()

    @pl.when(i > 0)
    def _top():
        cp = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * th - 1, 1)], slab.at[pl.ds(0, 1)], sem
        )
        cp.start()
        cp.wait()

    @pl.when(i == 0)
    def _top_zero():
        slab[0:1] = jnp.zeros_like(slab[0:1])

    @pl.when(i < nb - 1)
    def _bot():
        cp = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * th + th, 1)], slab.at[pl.ds(th + 1, 1)], sem
        )
        cp.start()
        cp.wait()

    @pl.when(i == nb - 1)
    def _bot_zero():
        slab[th + 1 : th + 2] = jnp.zeros_like(slab[th + 1 : th + 2])

    main.wait()

    a = slab[:]  # (TH+2, W, C) bf16
    if has_prologue:
        # previous-GN normalize+affine (+relu) on the fly; edge halo rows
        # were zeroed above and affine(0) != 0, so re-zero them after
        f = a.astype(jnp.float32) * sc_ref[b][None] + bi_ref[b][None]
        if relu:
            f = jnp.maximum(f, 0.0)
        a = f.astype(a.dtype)
        rows = lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        gr = rows + (i * th - 1)
        a = jnp.where((gr >= 0) & (gr < h), a, jnp.zeros_like(a))

    ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))  # (TH+2, W+2, C)

    c = ap.shape[-1]
    co = y_ref.shape[-1]
    acc = jnp.zeros((th * w_, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            # static tap offsets: Mosaic lowers static slices only
            xs = ap[dy : dy + th, dx : dx + w_, :]
            acc = acc + lax.dot_general(
                xs.reshape(th * w_, c),
                w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if has_accum:
        acc = acc + acc_ref[0].reshape(th * w_, co).astype(jnp.float32)
    y = acc.astype(y_ref.dtype)
    y_ref[0] = y.reshape(th, w_, co)

    if emit_moments:
        f = y.astype(jnp.float32)  # moments of the bf16 output, like XLA GN
        s1 = jnp.sum(f.reshape(th * w_ // 8, 8, co), axis=0)
        s2 = jnp.sum(jnp.square(f).reshape(th * w_ // 8, 8, co), axis=0)
        part = jnp.concatenate([s1, s2], axis=0)  # (16, Co)

        @pl.when(i == 0)
        def _init():
            m_ref[0] = part

        @pl.when(i != 0)
        def _acc():
            m_ref[0] += part


@functools.lru_cache(maxsize=None)
def _conv_call(
    b: int,
    h: int,
    w_: int,
    c: int,
    co: int,
    th: int,
    has_prologue: bool,
    relu: bool,
    has_accum: bool,
    emit_moments: bool,
    interpret: bool,
):
    kern = functools.partial(
        _kernel,
        th=th,
        h=h,
        w_=w_,
        has_prologue=has_prologue,
        relu=relu,
        has_accum=has_accum,
        emit_moments=emit_moments,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x: manual row-slab DMA
        pl.BlockSpec((3, 3, c, co), lambda bi_, ni: (0, 0, 0, 0)),
    ]
    if has_prologue:
        # full (B, C) blocks: a (1, C) block would violate Mosaic's
        # 8-sublane block minimum; the kernel indexes row b itself
        in_specs += [
            pl.BlockSpec((b, c), lambda bi_, ni: (0, 0)),
            pl.BlockSpec((b, c), lambda bi_, ni: (0, 0)),
        ]
    if has_accum:
        in_specs += [pl.BlockSpec((1, th, w_, co), lambda bi_, ni: (bi_, ni, 0, 0))]

    out_shape = [jax.ShapeDtypeStruct((b, h, w_, co), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, th, w_, co), lambda bi_, ni: (bi_, ni, 0, 0))]
    if emit_moments:
        out_shape += [jax.ShapeDtypeStruct((b, 16, co), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 16, co), lambda bi_, ni: (bi_, 0, 0))]

    call = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the ~12 MB working set (slab + padded slab + f32 accumulator +
        # out block) plus Mosaic's pipeline double-buffering exceeds the
        # default scoped-VMEM limit at th=8; v5e has 128 MB VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def run(*args):
        return tuple(call(*args))

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, *args):
        # vmap folds INTO the kernel's leading grid dimension: the grid is
        # (b, h // th), so mapping V wells over a b-batch call is exactly one
        # (V*b)-batch call - one Mosaic launch with grid parallelism instead
        # of a lax.map of V launches (the sequential form tripped XLA's 16 MB
        # scoped-vmem accounting inside the while body at 1024^2 x 128 and
        # serialized the batch; measured round 5). Weights must be shared
        # across the mapped axis - true for every production caller (the
        # plate runner vmaps wells over one parameter tree).
        x_b, w_b = in_batched[0], in_batched[1]
        assert x_b and not w_b, (
            "conv3x3_fused vmap expects the input batched and the kernel "
            "weights shared across the mapped axis"
        )

        def merge(a, batched):
            if not batched:
                a = jnp.broadcast_to(a[None], (axis_size, *a.shape))
            return a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])

        margs = [merge(a, bt) if i != 1 else a
                 for i, (a, bt) in enumerate(zip(args, in_batched))]
        inner = _conv_call(
            axis_size * b, h, w_, c, co, th,
            has_prologue, relu, has_accum, emit_moments, interpret,
        )
        outs = inner(*margs)
        outs = tuple(o.reshape(axis_size, b, *o.shape[1:]) for o in outs)
        return outs, tuple(True for _ in outs)

    return run


def conv3x3_fused(
    x: jax.Array,  # (B, H, W, C) bf16
    w: jax.Array,  # (3, 3, C, Co)
    prologue: tuple[jax.Array, jax.Array] | None = None,  # (B, C) f32 x2
    relu: bool = False,
    accum: jax.Array | None = None,  # (B, H, W, Co) bf16, added pre-cast
    emit_moments: bool = False,
    interpret: bool | None = None,
):
    """SAME 3x3 conv with fused affine prologue / accumulate / GN moments.

    Computes conv3x3(relu(x * scale + bias)) + accum in one HBM pass.
    Returns y (B, H, W, Co) bf16, or (y, (s1, s2)) with (B, Co) f32 channel
    moment sums of the bf16 output when `emit_moments`. Caller must have
    checked `conv_pallas_viable(x.shape, co)`.
    """
    if interpret is None:
        # interpreter-mode escape hatch so the CPU test lane can exercise
        # the fused forward end-to-end (tests/test_models.py)
        import os

        interpret = os.environ.get("AMT_PALLAS_CONV_INTERPRET", "0") == "1"
    b, h, w_, c = x.shape
    co = w.shape[-1]
    th = _pick_th(h, w_, c, co)
    has_prologue = prologue is not None
    run = _conv_call(
        b, h, w_, c, co, th,
        has_prologue, relu, accum is not None, emit_moments, interpret,
    )
    args = [x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)]
    if has_prologue:
        args += [prologue[0].astype(jnp.float32), prologue[1].astype(jnp.float32)]
    if accum is not None:
        args += [accum.astype(jnp.bfloat16)]
    out = run(*args)
    if emit_moments:
        y, m = out
        return y, (jnp.sum(m[:, :8], axis=1), jnp.sum(m[:, 8:], axis=1))
    return out[0]
