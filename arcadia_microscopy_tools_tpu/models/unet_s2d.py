"""Space-to-depth reparametrization of the U-Net forward pass.

The plain forward (`models/unet.py`) is MXU-hostile at its two full- and
half-resolution levels: a 3x3 conv with 32 channels uses 32 of the MXU's 128
lanes and measured ~5 TFLOP/s on v5e, while the same conv with 128 channels
runs at ~150 TFLOP/s. This module runs those levels through an EXACT
space-to-depth (S2D) rewrite: a stride-1 3x3 conv at (2H, 2W, C) is
identically a stride-1 3x3 conv at (H, W, 4C) whose kernel re-indexes the
taps per 2x2 sub-position,

    S2D(conv3x3(x, w)) == conv3x3(S2D(x), W')
    W'[u+1, v+1, (ay,ax,ci), (by,bx,co)] = w[2u+ay-by+1, 2v+ax-bx+1, ci, co]
    (taps outside 0..2 are zero),

so the 2048^2 32-channel levels execute as 1024^2 128-channel convs - full
MXU lane occupancy - without retraining: `s2d_params` rewrites a trained
checkpoint host-side once, and `apply_unet_s2d` reproduces `apply_unet`
to float tolerance (pinned by tests/test_models.py). GroupNorm is exact
because S2D only moves pixels between the spatial and channel axes within
one group's reduction set; 2x2 max-pool after an S2D level is a free max
over the 4 sub-position channels.

The deep levels (512^2 and below, >=128 channels) already saturate the MXU
and keep their dense kernels. The plain forward measured 214 ms/img at
2048^2 with the narrow levels dominating (per-level conv microbenchmarks:
32-ch conv ~5 TFLOP/s vs 128-ch ~150 TFLOP/s on v5e), so the rewrite's
expected forward is a few tens of ms; run profile_deep.py on a chip for
the measured split (PROF_PLAIN_FWD=1 times both forwards side by side).

Replaces the serial Cellpose dispatch of the reference
(`src/arcadia_microscopy_tools/model.py:276-288`) on the fast path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .unet import UNetConfig, _conv2d, _max_pool, _upsample2

__all__ = ["s2d_params", "apply_unet_s2d", "s2d_supported"]

Params = dict[str, Any]


def s2d_supported(params: Params, config: UNetConfig | None = None) -> bool:
    """True when `params` has the level layout `apply_unet_s2d` hardcodes:
    4 encoder levels / 3 decoder blocks with the config's base_channels
    widths. Checkpoints with any other architecture must use the
    shape-generic `unet.apply_unet`."""
    config = config or UNetConfig()
    nb = config.base_channels
    try:
        down, up = params["down"], params["up"]
        if len(down) != 4 or len(up) != 3 or len(nb) < 3:
            return False
        return all(
            down[i]["gn1_scale"].shape[0] == nb[i] for i in range(3)
        ) and up[1]["gn1_scale"].shape[0] == nb[1]
    except (KeyError, TypeError, IndexError, AttributeError):
        return False


def _s2d_conv_kernel(w: np.ndarray) -> np.ndarray:
    """Rewrite a (kh, kw, cin, cout) stride-1 SAME kernel into its factor-2
    space-to-depth equivalent (3, 3, 4*cin, 4*cout) (1x1 kernels produce the
    block-diagonal (1, 1, 4*cin, 4*cout)). Channel order is (ay, ax, c),
    matching `_s2d` / `_d2s` below."""
    kh, kw, cin, cout = w.shape
    if (kh, kw) == (1, 1):
        out = np.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
        for a in range(4):
            out[0, 0, a * cin : (a + 1) * cin, a * cout : (a + 1) * cout] = w[0, 0]
        return out
    assert (kh, kw) == (3, 3), f"unsupported kernel {w.shape}"
    out = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for by in range(2):
        for bx in range(2):
            for ay in range(2):
                for ax in range(2):
                    for u in (-1, 0, 1):
                        for v in (-1, 0, 1):
                            ky = 2 * u + ay - by + 1
                            kx = 2 * v + ax - bx + 1
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                ai = (ay * 2 + ax) * cin
                                bi = (by * 2 + bx) * cout
                                out[u + 1, v + 1, ai : ai + cin, bi : bi + cout] = (
                                    w[ky, kx]
                                )
    return out


def _s2d_block(block: Params) -> Params:
    """S2D-rewrite one residual conv block's parameters. GN scale/bias tile
    4x (the same affine applies at each sub-position); `orig_c` records the
    pre-S2D channel count so GroupNorm keeps the original group structure."""
    out: Params = {
        "conv1": jnp.asarray(_s2d_conv_kernel(np.asarray(block["conv1"]))),
        "conv2": jnp.asarray(_s2d_conv_kernel(np.asarray(block["conv2"]))),
    }
    for name in ("gn1_scale", "gn1_bias", "gn2_scale", "gn2_bias"):
        out[name] = jnp.tile(jnp.asarray(block[name]), 4)
    if "proj" in block:
        out["proj"] = jnp.asarray(_s2d_conv_kernel(np.asarray(block["proj"])))
    return out


def s2d_params(params: Params) -> Params:
    """Host-side, one-time rewrite of a trained parameter tree for
    `apply_unet_s2d`. Levels 0 and 1 of the encoder and the last two decoder
    blocks (the narrow-channel, high-resolution ones) get S2D kernels; deep
    levels keep their dense kernels; the 1x1 head becomes block-diagonal."""
    out: Params = {
        "down0": _s2d_block(params["down"][0]),
        "down1": _s2d_block(params["down"][1]),
        "down_rest": [params["down"][i] for i in range(2, len(params["down"]))],
        "up0": params["up"][0],
        "up1": _s2d_block(params["up"][1]),
        "up2": _s2d_block(params["up"][2]),
        "style_dense": params["style_dense"],
        "style_proj": params["style_proj"],
        "head": jnp.asarray(_s2d_conv_kernel(np.asarray(params["head"]))),
        "head_bias": jnp.tile(jnp.asarray(params["head_bias"]), 4),
    }
    return out


def _s2d(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), channel order (ay, ax, c)."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def _d2s(x: jax.Array, c: int) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of `_s2d`."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _group_norm_s2d(x, scale, bias, groups, orig_c):
    """GroupNorm whose reduction set matches the pre-S2D layout: statistics
    pool over (H, W, the 4 sub-positions, the group's original channels).

    Reduction order mirrors `unet._group_norm`: spatial sums over the
    contiguous (H, W) axes first, then the (sub-position, in-group channel)
    fold on the tiny (B, C4) row - the direct strided 6-D reduction lowers
    ~200x slower on TPU. Flat S2D channel a*orig_c+c belongs to group
    c // (orig_c // g)."""
    b, h, w, c4 = x.shape
    g = min(groups, orig_c)
    cg = orig_c // g
    n = h * w * 4 * cg
    ch_group = (jnp.arange(c4) % orig_c) // cg  # (c4,) group id per channel
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))  # (b, c4)
    mean = (
        jnp.zeros((b, g), jnp.float32).at[:, ch_group].add(s1) / n
    )  # segment-sum the 4*cg channels of each group
    mean_c = mean[:, ch_group][:, None, None, :]
    d = xf - mean_c
    s2 = jnp.sum(d * d, axis=(1, 2))
    var = jnp.zeros((b, g), jnp.float32).at[:, ch_group].add(s2) / n
    inv_c = lax.rsqrt(var + 1e-5)[:, ch_group][:, None, None, :]
    return (d * inv_c) * scale + bias


def _conv_block_s2d(block: Params, x, groups, dtype):
    """Residual double conv on an S2D tensor; mirrors `unet._conv_block`.
    The pre-S2D channel count is recovered from the (4x-tiled) GN scale
    shape, keeping the parameter tree jit-traceable (ints in the tree would
    become tracers)."""
    orig_c = block["gn1_scale"].shape[0] // 4
    # optimization_barrier between conv and GN: see unet._conv_block (fusing
    # the GN reduction into the conv epilogue pessimizes the conv ~2x).
    h = lax.optimization_barrier(_conv2d(x, block["conv1"], dtype))
    h = _group_norm_s2d(h, block["gn1_scale"], block["gn1_bias"], groups, orig_c)
    h = jax.nn.relu(h)
    h = lax.optimization_barrier(_conv2d(h.astype(dtype), block["conv2"], dtype))
    h = _group_norm_s2d(h, block["gn2_scale"], block["gn2_bias"], groups, orig_c)
    skip = x
    if "proj" in block:
        skip = _conv2d(x, block["proj"], dtype)
    return jax.nn.relu(h + skip.astype(h.dtype))


def _pool_s2d(x: jax.Array, c: int) -> jax.Array:
    """2x2 stride-2 max-pool of the underlying full-res tensor: a free max
    over the 4 sub-position channel groups of the S2D layout."""
    b, h, w, _ = x.shape
    return jnp.max(x.reshape(b, h, w, 4, c), axis=3)


def _tile_s2d(x: jax.Array) -> jax.Array:
    """S2D form of `_upsample2(x)`: every sub-position repeats the pixel."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, h, w, 4, c)).reshape(
        b, h, w, 4 * c
    )


def _concat_s2d(xa: jax.Array, xb: jax.Array, ca: int, cb: int) -> jax.Array:
    """Channel-concat of two S2D tensors in the (a, c) order the S2D kernels
    expect: the pre-S2D concat happens per sub-position, so the flat channel
    index must be a*(ca+cb)+ci, not a plain concatenation of the two flats."""
    b, h, w, _ = xa.shape
    return jnp.concatenate(
        [xa.reshape(b, h, w, 4, ca), xb.astype(xa.dtype).reshape(b, h, w, 4, cb)],
        axis=-1,
    ).reshape(b, h, w, 4 * (ca + cb))


def apply_unet_s2d(
    sparams: Params, x: jax.Array, config: UNetConfig | None = None
) -> jax.Array:
    """`unet.apply_unet` on S2D-rewritten parameters; same (B, H, W, Cin) ->
    (B, H, W, 3) contract, H and W multiples of 8. Equal to the plain
    forward up to float reassociation (pinned by tests)."""
    config = config or UNetConfig()
    dtype = config.compute_dtype
    groups = config.groups
    nb = config.base_channels

    # encoder levels 0/1 in S2D form
    x0 = _s2d(x.astype(dtype))  # (B, H/2, W/2, 4*Cin)
    h0 = _conv_block_s2d(sparams["down0"], x0, groups, dtype)  # 4*nb[0] ch
    p0 = _pool_s2d(h0, nb[0])
    x1 = _s2d(p0)
    h1 = _conv_block_s2d(sparams["down1"], x1, groups, dtype)  # 4*nb[1] ch
    p1 = _pool_s2d(h1, nb[1])

    # deep levels densely (channels already MXU-wide)
    from .unet import _conv_block

    h2 = _conv_block(sparams["down_rest"][0], p1, groups, dtype)
    p2 = _max_pool(h2)
    deep = _conv_block(sparams["down_rest"][1], p2, groups, dtype)

    style = jnp.mean(deep.astype(jnp.float32), axis=(1, 2))
    style = style / (jnp.linalg.norm(style, axis=-1, keepdims=True) + 1e-6)
    style = jax.nn.relu(style @ sparams["style_dense"])

    # decoder: up0 dense at true 512^2, up1/up2 in S2D form
    h = _upsample2(deep)
    h = jnp.concatenate([h, h2.astype(h.dtype)], axis=-1)
    h = _conv_block(sparams["up0"], h, groups, dtype)
    h = h + (style @ sparams["style_proj"][0]).astype(h.dtype)[:, None, None, :]

    # up1: true resolution H/2 -> S2D grid H/4; skip is h1 (already S2D)
    h = _concat_s2d(_tile_s2d(h), h1, nb[2], nb[1])
    h = _conv_block_s2d(sparams["up1"], h, groups, dtype)
    sb1 = (style @ sparams["style_proj"][1]).astype(h.dtype)
    h = h + jnp.tile(sb1, (1, 4))[:, None, None, :]

    # up2: true resolution H -> S2D grid H/2; bring h back to the H/2 grid
    # and pair it with skip h0 (already S2D on that grid)
    h = _d2s(h, nb[1])  # (B, H/2, W/2, nb[1])
    h = _concat_s2d(_tile_s2d(h), h0, nb[1], nb[0])
    h = _conv_block_s2d(sparams["up2"], h, groups, dtype)
    sb2 = (style @ sparams["style_proj"][2]).astype(h.dtype)
    h = h + jnp.tile(sb2, (1, 4))[:, None, None, :]

    out = _conv2d(h, sparams["head"], dtype) + sparams["head_bias"]
    return _d2s(out, sparams["head_bias"].shape[0] // 4).astype(jnp.float32)
