"""Cellpose-style U-Net, from scratch in pure JAX.

Replaces the reference's dependence on the Cellpose/PyTorch model
(`src/arcadia_microscopy_tools/model.py:9,166,211`): a residual double-conv
U-Net with a global "style" vector injected into the decoder, emitting the
same three output maps as Cellpose - Y-flow, X-flow, and cell probability -
which the flow tracker (`models/flows.py`) turns into instance masks.

TPU-native design choices:
- NHWC layout end-to-end (XLA's preferred conv layout on TPU; channels ride
  the 128-wide lane dimension of the MXU).
- bfloat16 activations / float32 parameters and outputs - convs hit the MXU
  at full rate while flow integration stays in f32.
- GroupNorm instead of BatchNorm: no running statistics, so inference is a
  pure function of (params, input) and the whole network can be vmapped,
  pjit-sharded, and embedded in larger fused programs with zero state.
- Parameters are a plain pytree dict -> trivially checkpointable with orbax
  and shardable with jax.sharding.

Default width multipliers (32, 64, 128, 256) follow the Cellpose backbone.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["UNetConfig", "init_unet", "apply_unet", "count_params"]

Params = dict[str, Any]


class UNetConfig:
    """Static architecture configuration.

    Attributes:
        in_channels: Input image channels (3, matching Cellpose-SAM's
            "first 3 channels" contract, reference model.py:50).
        base_channels: Channel widths per resolution level.
        out_channels: Output maps - (dY, dX, cellprob).
        groups: GroupNorm group count.
        compute_dtype: Activation dtype (bfloat16 on TPU).
    """

    def __init__(
        self,
        in_channels: int = 3,
        base_channels: tuple[int, ...] = (32, 64, 128, 256),
        out_channels: int = 3,
        groups: int = 8,
        compute_dtype=jnp.bfloat16,
    ):
        self.in_channels = in_channels
        self.base_channels = tuple(base_channels)
        self.out_channels = out_channels
        self.groups = groups
        self.compute_dtype = compute_dtype

    def __repr__(self) -> str:
        return (
            f"UNetConfig(in={self.in_channels}, base={self.base_channels}, "
            f"out={self.out_channels})"
        )


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    scale = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32) * scale


def _dense_init(key, cin, cout):
    scale = math.sqrt(2.0 / cin)
    return jax.random.normal(key, (cin, cout), dtype=jnp.float32) * scale


def _conv_block_init(key, cin, cout) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Params = {
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "conv2": _conv_init(k2, 3, 3, cout, cout),
        "gn1_scale": jnp.ones((cout,), jnp.float32),
        "gn1_bias": jnp.zeros((cout,), jnp.float32),
        "gn2_scale": jnp.ones((cout,), jnp.float32),
        "gn2_bias": jnp.zeros((cout,), jnp.float32),
    }
    if cin != cout:
        params["proj"] = _conv_init(k3, 1, 1, cin, cout)
    return params


def init_unet(key: jax.Array, config: UNetConfig | None = None) -> Params:
    """Initialize all network parameters as a pytree dict."""
    config = config or UNetConfig()
    nb = config.base_channels
    keys = iter(jax.random.split(key, 4 * len(nb) + 8))

    params: Params = {"config": None}  # placeholder removed below
    down = []
    cin = config.in_channels
    for cout in nb:
        down.append(_conv_block_init(next(keys), cin, cout))
        cin = cout
    params["down"] = down

    params["style_dense"] = _dense_init(next(keys), nb[-1], nb[-1])

    up = []
    style_proj = []
    for level in reversed(range(len(nb) - 1)):
        cout = nb[level]
        cin_up = nb[level + 1] + nb[level]  # upsampled deep + skip
        up.append(_conv_block_init(next(keys), cin_up, cout))
        style_proj.append(_dense_init(next(keys), nb[-1], cout))
    params["up"] = up
    params["style_proj"] = style_proj

    params["head"] = _conv_init(next(keys), 1, 1, nb[0], config.out_channels)
    params["head_bias"] = jnp.zeros((config.out_channels,), jnp.float32)
    del params["config"]
    return params


def _group_norm(x, scale, bias, groups):
    # Two TPU-measured choices (v5e, 1024^2 x 128):
    # - Spatial-first reduction order: sum over the contiguous (H, W) axes
    #   to a (B, C) row, then fold channels into groups on that tiny row.
    #   Reducing the strided 5-D (b, h, w, g, c//g) view over (1, 2, 4)
    #   directly lowers to a layout XLA handles ~200x slower.
    # - One-pass moments (sum + sum-of-squares in the same sweep) with the
    #   output in x's dtype: the two-pass form materialized the centered
    #   f32 tensor between reduction sweeps - 3.6 ms/block slower inside
    #   the U-Net at 2048^2. Statistics accumulate in f32 either way; the
    #   normalize itself runs in f32 registers and stores at x.dtype.
    b, h, w, c = x.shape
    g = min(groups, c)
    cg = c // g
    n = h * w * cg
    s1 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
    mean = s1.reshape(b, g, cg).sum(axis=2) / n  # (b, g)
    if x.dtype == jnp.float32:
        # f32 path (training / accuracy-sensitive): two-pass centered
        # variance avoids the E[x^2]-mean^2 cancellation when mean >> std.
        # The extra sweep only costs on the bf16 inference path, which keeps
        # the one-pass form below.
        mean_full = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
        var = (
            jnp.sum(jnp.square(x - mean_full), axis=(1, 2))
            .reshape(b, g, cg)
            .sum(axis=2)
            / n
        )
    else:
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
        var = s2.reshape(b, g, cg).sum(axis=2) / n - mean * mean
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
    inv_c = jnp.repeat(lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5), cg, axis=1)[
        :, None, None, :
    ]
    out = (x.astype(jnp.float32) - mean_c) * (inv_c * scale) + bias
    return out.astype(x.dtype)


def _conv2d(x, w, dtype):
    # Inputs and output share the compute dtype (bf16 on TPU); the MXU still
    # accumulates in f32 internally. Keeping one dtype end-to-end makes the
    # conv transpose rules (training) dtype-consistent.
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=dn,
    )


def _conv_block(params: Params, x, groups, dtype, gn=_group_norm):
    """Residual double conv: GN -> ReLU -> conv, twice, with projection skip.

    Each conv output passes through `optimization_barrier` before GroupNorm:
    letting XLA fuse the GN reduction into the conv epilogue pessimizes the
    conv's tiling ~2x on TPU (measured 20 ms vs 8.5 ms for conv+GN at
    1024^2 x 128 on v5e); the barrier keeps them separately scheduled. The
    barrier is differentiable, so the training path is unaffected.

    `gn` lets inference paths swap in the Pallas fused-moments GroupNorm
    (models/gn_pallas.py); the default XLA form stays on the training path
    (the kernel has no VJP)."""
    h = lax.optimization_barrier(_conv2d(x, params["conv1"], dtype))
    h = gn(h, params["gn1_scale"], params["gn1_bias"], groups)
    h = jax.nn.relu(h)
    h = lax.optimization_barrier(_conv2d(h.astype(dtype), params["conv2"], dtype))
    h = gn(h, params["gn2_scale"], params["gn2_bias"], groups)
    skip = x
    if "proj" in params:
        skip = _conv2d(x, params["proj"], dtype)
    return jax.nn.relu(h + skip.astype(h.dtype))


def _max_pool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _upsample2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


@partial(jax.jit, static_argnames=("groups", "dtype_name"))
def _apply(params: Params, x: jax.Array, groups: int, dtype_name: str) -> jax.Array:
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    # encoder
    skips = []
    h = x
    for block in params["down"]:
        h = _conv_block(block, h, groups, dtype)
        skips.append(h)
        h = _max_pool(h)
    # `h` after the last pool is unused; the deepest features are skips[-1]
    deep = skips[-1]

    # style vector: global average of the deepest features, unit-normalized
    # (the Cellpose "style" that modulates the decoder)
    style = jnp.mean(deep.astype(jnp.float32), axis=(1, 2))
    style = style / (jnp.linalg.norm(style, axis=-1, keepdims=True) + 1e-6)
    style = jax.nn.relu(style @ params["style_dense"])

    # decoder
    h = deep
    n_levels = len(params["down"])
    for i, block in enumerate(params["up"]):
        level = n_levels - 2 - i
        h = _upsample2(h)
        h = jnp.concatenate([h, skips[level].astype(h.dtype)], axis=-1)
        h = _conv_block(block, h, groups, dtype)
        style_bias = (style @ params["style_proj"][i]).astype(h.dtype)
        h = h + style_bias[:, None, None, :]

    out = _conv2d(h, params["head"], dtype) + params["head_bias"]
    return out.astype(jnp.float32)


def apply_unet(
    params: Params, x: jax.Array, config: UNetConfig | None = None
) -> jax.Array:
    """Run the network.

    Args:
        params: Parameter pytree from `init_unet`.
        x: (B, H, W, C_in) float input, H and W multiples of
            2**(levels-1) (the segmentation wrapper pads/tiles).

    Returns:
        (B, H, W, 3) float32: [dY flow, dX flow, cellprob logits].
    """
    config = config or UNetConfig()
    dtype_name = "bfloat16" if config.compute_dtype == jnp.bfloat16 else "float32"
    return _apply(params, x, config.groups, dtype_name)


def count_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
