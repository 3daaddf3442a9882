"""Space-to-depth reparametrization of the U-Net forward pass.

The plain forward (`models/unet.py`) is MXU-hostile at its two full- and
half-resolution levels: a 3x3 conv with 32 channels uses 32 of the MXU's 128
lanes and measured ~5 TFLOP/s on v5e, while the same conv with 128 channels
runs at ~150 TFLOP/s. This module runs those levels through an EXACT
space-to-depth (S2D) rewrite: a stride-1 3x3 conv at (2H, 2W, C) is
identically a stride-1 3x3 conv at (H, W, 4C) whose kernel re-indexes the
taps per 2x2 sub-position, so the 2048^2 32-channel levels execute as
1024^2 128-channel convs - full MXU lane occupancy - without retraining:
`s2d_params` rewrites a trained checkpoint host-side once, and
`apply_unet_s2d` reproduces `apply_unet` to float tolerance (pinned by
tests/test_models.py).

Round-4 layout rework (v2), from on-chip profiling: with the v1 design the
convs were NOT the bottleneck (amortized 3x3/128ch convs run at ~95% of
v5e bf16 peak) - the time went to layout-hostile data movement: the input
S2D transpose (12.5 ms/img at 2048^2: a (1024,2,1024,2,3)->... shuffle
whose 3-wide lane dim wastes 125/128 lanes), the head's depth-to-space
(12.3 ms), and the per-sub-position interleaving concats of the up path.
v2 removes every explicit transpose:

- **Channel order (c, a)**, not (a, c): flat channel = c*4 + (ay*2+ax).
  Skip concats become plain `jnp.concatenate` (no interleave), the 2x2
  pool is a max over the minor 4-lane groups, decoder tiling is a lane
  repeat, and GroupNorm's groups stay channel-contiguous (so the plain
  `unet._group_norm` reduction applies unchanged).
- **Input S2D is folded into the first conv**: a stride-1 3x3 conv at full
  resolution followed by S2D equals ONE stride-2 4x4 conv
  (out[(i,j), co*4+b] = sum_t x[2i+ty, 2j+tx] w[ty-by+1, tx-bx+1]), so the
  12-lane transpose disappears into an MXU op (the ResNet-stem trick).
  Residual 1x1 projections become stride-2 2x2 convs the same way.
- **Depth-to-space is an identity fractionally-strided conv**
  (lhs_dilation=2, 2x2 kernel): the permutation rides the MXU instead of
  a minor-dim shuffle; the head's 1x1 conv folds into the same
  transposed conv, emitting full-resolution (B, H, W, 3) directly.

The deep levels (512^2 and below, >=128 channels) already saturate the MXU
and keep their dense kernels. Replaces the serial Cellpose dispatch of the
reference (`src/arcadia_microscopy_tools/model.py:276-288`) on the fast
path.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .unet import UNetConfig, _conv2d, _group_norm, _max_pool

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


def _sub(ay: int, ax: int) -> int:
    return ay * 2 + ax


def _s2d(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C) in (c, a) order: flat channel =
    c*4 + (ay*2 + ax). Reference/testing helper - the forward itself never
    materializes this transpose (it is folded into the stem convs)."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def _d2s(x: jax.Array, c: int) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of `_s2d` (reference/testing
    helper; the forward uses the `_d2s_kernel` conv instead)."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_conv_kernel(w: np.ndarray) -> np.ndarray:
    """Rewrite a (kh, kw, cin, cout) stride-1 SAME kernel into its factor-2
    space-to-depth equivalent (3, 3, 4*cin, 4*cout) (1x1 kernels produce the
    block-diagonal (1, 1, 4*cin, 4*cout)). Channel order is (c, a):
    flat = c*4 + (ay*2 + ax)."""
    kh, kw, cin, cout = w.shape
    if (kh, kw) == (1, 1):
        out = np.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
        for a in range(4):
            out[0, 0, a::4, a::4] = w[0, 0]
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
                                out[
                                    u + 1, v + 1,
                                    _sub(ay, ax) :: 4,
                                    _sub(by, bx) :: 4,
                                ] = w[ky, kx]
    return out


def _stem_conv_kernel(w: np.ndarray) -> np.ndarray:
    """(3, 3, cin, cout) stride-1 SAME kernel -> the (4, 4, cin, 4*cout)
    stride-2 kernel computing conv-then-S2D in one op:
    out[(i,j), co*4+b] = sum_{ty,tx in -1..2} x[2i+ty, 2j+tx]
    * w[ty-by+1, tx-bx+1] (padding (1,1) per side). The input stays at full
    resolution in its natural layout - no S2D transpose is materialized."""
    _, _, cin, cout = w.shape
    out = np.zeros((4, 4, cin, 4 * cout), w.dtype)
    for by in range(2):
        for bx in range(2):
            for ty in range(-1, 3):
                for tx in range(-1, 3):
                    ky, kx = ty - by + 1, tx - bx + 1
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        out[ty + 1, tx + 1, :, _sub(by, bx) :: 4] = w[ky, kx]
    return out


def _stem_proj_kernel(w: np.ndarray) -> np.ndarray:
    """(1, 1, cin, cout) -> (2, 2, cin, 4*cout) stride-2: the residual
    projection of an S2D level, reading full-resolution input."""
    _, _, cin, cout = w.shape
    out = np.zeros((2, 2, cin, 4 * cout), w.dtype)
    for by in range(2):
        for bx in range(2):
            out[by, bx, :, _sub(by, bx) :: 4] = w[0, 0]
    return out


def _head_kernel(w: np.ndarray) -> np.ndarray:
    """(1, 1, cin, cout) head kernel -> (2, 2, 4*cin, cout) for the
    fractionally-strided (lhs_dilation=2) conv that applies the head AND
    depth-to-space in one MXU op: with padding (1,1) and dilated input,
    output (2i+ay, 2j+ax) reads kernel tap (1-ay, 1-ax) against input
    (i, j), so tap (t, s) selects sub-position (1-t, 1-s)'s channel block."""
    _, _, cin, cout = w.shape
    out = np.zeros((2, 2, 4 * cin, cout), w.dtype)
    for t in range(2):
        for s in range(2):
            out[t, s, _sub(1 - t, 1 - s) :: 4, :] = w[0, 0]
    return out


def _compose_d2s_conv3_kernel(w3: np.ndarray) -> np.ndarray:
    """Fold depth-to-space INTO a following stride-1 3x3 SAME conv:

        conv3x3(d2s(x), w3) == lhs_dilated conv4x4(x, K), padding (2, 2)

    where x is (H, W, 4C) in (c, a) order and the output lives on the
    (2H, 2W) grid. Derivation: output row p reads d2s rows p+u, u in
    [-1, 1]; d2s row r is x row r>>1's sub-position block ry = r&1, and in
    dilated coordinates x row i sits at 2i, so tap t = 2 + u - ((p+u)&1).
    Per output parity two taps are active (the dilated zeros kill the
    rest); taps t=1,2 each accumulate TWO (u, ry) pairs that share the
    same source row but read different sub-position channel blocks:

        t=0: (u=-1, ry=1)              t=1: (u=-1, ry=0), (u=0, ry=1)
        t=2: (u=0,  ry=0), (u=1, ry=1) t=3: (u=1,  ry=0)

    (same map per axis). Removes the explicit `_d2s_kernel` conv AND the
    planar intermediate tensor - the round-5 xprof showed the 64-channel
    intermediate's layout forcing ~4 ms/img of relayout copies at 2048^2.
    Exactness is pinned by the S2D-vs-plain parity tests."""
    _A = {0: [(-1, 1)], 1: [(-1, 0), (0, 1)], 2: [(0, 0), (1, 1)], 3: [(1, 0)]}
    kh, kw, c, co = w3.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((4, 4, 4 * c, co), w3.dtype)
    for t, vs in _A.items():
        for s, hs in _A.items():
            for u, ry in vs:
                for v, rx in hs:
                    out[t, s, (ry * 2 + rx) :: 4, :] += w3[u + 1, v + 1]
    return out


def _d2s_kernel(c: int, dtype) -> np.ndarray:
    """(2, 2, 4*c, c) identity kernel: depth-to-space as a fractionally-
    strided conv (same tap/sub-position relation as `_head_kernel`)."""
    out = np.zeros((2, 2, 4 * c, c), dtype)
    eye = np.eye(c, dtype=dtype)
    for t in range(2):
        for s in range(2):
            out[t, s, _sub(1 - t, 1 - s) :: 4, :] = eye
    return out


def _split_up_kernel(w: np.ndarray, c_up: int) -> tuple[np.ndarray, np.ndarray]:
    """Split an up-block conv kernel so the decoder never materializes the
    tile4+concat input (measured 11.4 ms/img at 1024^2 - slower than the
    conv itself):

        conv(concat([tile4(g), skip]), W') == conv(g, Wup) + conv(skip, Wsk)

    where Wup sums W''s four sub-position lanes per up channel (tile4
    repeats each channel over them, so the products factor), and Wsk is the
    skip slice unchanged. Also HALVES the up-part FLOPs: the sub-position
    copies are summed once in the kernel instead of recomputed per pixel."""
    full = _s2d_conv_kernel(w)
    kh, kw, _, co4 = full.shape
    up = full[:, :, : 4 * c_up, :].reshape(kh, kw, c_up, 4, co4).sum(axis=3)
    return up, full[:, :, 4 * c_up :, :]


# Tap-collapse matrix for conv3x3(nearest_up2(x)) == lhs_dilated conv4x4(x):
# even outputs read taps (w0 | w1+w2) of the original 3-tap kernel, odd
# outputs (w0+w1 | w2); per axis K4[t] = sum_k A[t, k] w[k].
_UP_TAPS = np.array(
    [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], dtype=np.float64
)


def _up0_block(block: Params, c_up: int) -> Params:
    """Dense decoder block (up0) with the nearest-upsample folded into
    fractionally-strided kernels: conv3x3(concat([upsample2(g), skip]))
    == dconv4x4(g, A w A^T) + conv3x3(skip, w_skip), so neither the
    upsampled tensor nor the concat materializes."""
    w1 = np.asarray(block["conv1"], np.float64)
    up, sk = w1[:, :, :c_up, :], w1[:, :, c_up:, :]
    conv1_up = np.einsum("ta,sb,abio->tsio", _UP_TAPS, _UP_TAPS, up)
    wp = np.asarray(block["proj"], np.float64)
    # 1x1 proj on the upsampled tensor: every (t, s) tap reads the source
    # pixel (nearest upsample), so the 2x2 transposed kernel replicates it
    proj_up = np.broadcast_to(
        wp[0, 0, :c_up], (2, 2, c_up, wp.shape[3])
    ).copy()
    out: Params = {
        "conv1_up": jnp.asarray(conv1_up.astype(w1.dtype)),
        "conv1_skip": jnp.asarray(sk.astype(w1.dtype)),
        "proj_up": jnp.asarray(proj_up.astype(w1.dtype)),
        "proj_skip": jnp.asarray(wp[:, :, c_up:, :].astype(w1.dtype)),
        "conv2": jnp.asarray(block["conv2"]),
    }
    for name in ("gn1_scale", "gn1_bias", "gn2_scale", "gn2_bias"):
        out[name] = jnp.asarray(block[name])
    return out


def _s2d_up_block(block: Params, c_up: int) -> Params:
    """S2D-rewrite one decoder block with split (up, skip) kernels; see
    `_split_up_kernel`. `c_up` is the pre-S2D channel count of the
    upsampled input (the concat's first part)."""
    up1, sk1 = _split_up_kernel(np.asarray(block["conv1"]), c_up)
    upp, skp = _split_up_kernel(np.asarray(block["proj"]), c_up)
    out: Params = {
        "conv1_up": jnp.asarray(up1),
        "conv1_skip": jnp.asarray(sk1),
        "proj_up": jnp.asarray(upp),
        "proj_skip": jnp.asarray(skp),
        "conv2": jnp.asarray(_s2d_conv_kernel(np.asarray(block["conv2"]))),
    }
    for name in ("gn1_scale", "gn1_bias", "gn2_scale", "gn2_bias"):
        out[name] = jnp.repeat(jnp.asarray(block[name]), 4)
    return out


def _s2d_block(block: Params, stem: bool) -> Params:
    """S2D-rewrite one residual conv block's parameters. GN scale/bias
    repeat 4x per channel ((c, a) order: the same affine applies at each
    sub-position). `stem=True` additionally folds the input S2D into conv1
    (stride-2 4x4) and the projection (stride-2 2x2) - used when the block's
    input is a full-resolution planar tensor."""
    w1 = np.asarray(block["conv1"])
    out: Params = {
        "conv1": jnp.asarray(_stem_conv_kernel(w1) if stem else _s2d_conv_kernel(w1)),
        "conv2": jnp.asarray(_s2d_conv_kernel(np.asarray(block["conv2"]))),
    }
    for name in ("gn1_scale", "gn1_bias", "gn2_scale", "gn2_bias"):
        out[name] = jnp.repeat(jnp.asarray(block[name]), 4)
    if "proj" in block:
        wp = np.asarray(block["proj"])
        out["proj"] = jnp.asarray(
            _stem_proj_kernel(wp) if stem else _s2d_conv_kernel(wp)
        )
    return out


def s2d_params(params: Params, gray_input: bool = False) -> Params:
    """Host-side, one-time rewrite of a trained parameter tree for
    `apply_unet_s2d`. Levels 0 and 1 of the encoder (stem form: input S2D
    folded into stride-2 convs) and the last two decoder blocks get S2D
    kernels; deep levels keep their dense kernels; the 1x1 head becomes the
    transposed-conv depth-to-space kernel.

    `gray_input=True` additionally folds a REPLICATED-grayscale input into
    the down0 stem: conv(stack([x]*cin), W) == conv(x[..., None], sum_ci W),
    so the caller feeds (B, H, W, 1) and the image-layout-bound cin=3 stem
    conv (measured input-bound at 2048^2, ROADMAP) reads a third of the
    bytes. Exact for the plate path, whose network input is
    stack([xn, xn, xn]) (parallel/plate.py)."""
    nb1 = params["down"][1]["gn1_scale"].shape[0]
    nb2 = params["down"][2]["gn1_scale"].shape[0]
    nb3 = params["down"][3]["gn1_scale"].shape[0]
    head = np.asarray(params["head"])
    down0 = _s2d_block(params["down"][0], stem=True)
    if gray_input:
        down0["conv1"] = jnp.sum(down0["conv1"], axis=2, keepdims=True)
        down0["proj"] = jnp.sum(down0["proj"], axis=2, keepdims=True)
    # up2 with the depth-to-space FOLDED INTO its up-part kernels
    # (_compose_d2s_conv3_kernel): the block takes up0-form fractionally-
    # strided kernels reading up1's S2D output directly - the planar
    # (2H2, 2W2, nb1) intermediate never exists. Composition happens on
    # the host-side numpy kernels BEFORE any jnp conversion: under a jit
    # trace jnp constants are tracers and cannot round-trip through numpy.
    up2 = _s2d_up_block(params["up"][2], c_up=nb1)
    up1_np, _ = _split_up_kernel(np.asarray(params["up"][2]["conv1"]), nb1)
    up2["conv1_up"] = jnp.asarray(_compose_d2s_conv3_kernel(up1_np))
    upp_np, _ = _split_up_kernel(np.asarray(params["up"][2]["proj"]), nb1)
    up2["proj_up"] = jnp.asarray(_head_kernel(upp_np))
    out: Params = {
        "down0": down0,
        "down1": _s2d_block(params["down"][1], stem=True),
        "down_rest": [params["down"][i] for i in range(2, len(params["down"]))],
        "up0": _up0_block(params["up"][0], c_up=nb3),
        "up1": _s2d_up_block(params["up"][1], c_up=nb2),
        "up2": up2,
        "style_dense": params["style_dense"],
        "style_proj": params["style_proj"],
        "head": jnp.asarray(_head_kernel(head)),
        "head_bias": jnp.asarray(params["head_bias"]),
        # S2D-form head (block-diagonal 1x1): same dot products as the
        # transposed-conv head, emitted on the half-resolution grid for
        # consumers that read the output elementwise (out_s2d=True)
        "head_s2d": jnp.asarray(_s2d_conv_kernel(head)),
        "head_bias_s2d": jnp.repeat(jnp.asarray(params["head_bias"]), 4),
    }
    return out


def _conv_stride2(x, w, dtype, kernel: int):
    """Stride-2 conv for the stem forms: 4x4 kernel pads (1,1), 2x2 pads
    (0,0); both emit the half-resolution S2D grid."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = ((1, 1), (1, 1)) if kernel == 4 else ((0, 0), (0, 0))
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(2, 2), padding=pad,
        dimension_numbers=dn,
    )


def _conv_d2s(x, w, dtype):
    """Fractionally-strided (lhs_dilation=2) conv: depth-to-space (and
    optionally a fused 1x1 head) as one MXU op, (B, H, W, 4C) -> (B, 2H,
    2W, C')."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=dn,
    )


def _conv_up(x, w, dtype):
    """conv(nearest_up2(x), w0) as ONE fractionally-strided conv on the
    half-resolution tensor (kernel pre-collapsed by `_UP_TAPS`): 4x4 kernel
    pads (2,2), the 2x2 replicated-proj kernel pads (1,1)."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    p = 2 if w.shape[0] == 4 else 1
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(1, 1),
        padding=((p, p), (p, p)), lhs_dilation=(2, 2),
        dimension_numbers=dn,
    )


def _conv_block_up0(block: Params, g, skip_t, groups, dtype, gn=_group_norm):
    """up0: dense decoder block with the nearest-upsample and concat folded
    into fractionally-strided kernels (see `_up0_block`)."""
    h = _conv_up(g, block["conv1_up"], dtype) + _conv2d(
        skip_t, block["conv1_skip"], dtype
    )
    h = lax.optimization_barrier(h)
    h = gn(h, block["gn1_scale"], block["gn1_bias"], groups)
    h = jax.nn.relu(h)
    h = lax.optimization_barrier(_conv2d(h.astype(dtype), block["conv2"], dtype))
    h = gn(h, block["gn2_scale"], block["gn2_bias"], groups)
    skip = _conv_up(g, block["proj_up"], dtype) + _conv2d(
        skip_t, block["proj_skip"], dtype
    )
    return jax.nn.relu(h + skip.astype(h.dtype))


def _conv_block_s2d(block: Params, x, groups, dtype, stem: bool = False, gn=_group_norm):
    """Residual double conv on (c, a)-order S2D tensors; mirrors
    `unet._conv_block`. In (c, a) order GroupNorm's groups are channel-
    contiguous, so the plain `_group_norm` applies (its (H, W)-first
    reduction order included); the reduction set matches the pre-S2D
    layout exactly. optimization_barrier between conv and GN: see
    unet._conv_block (fusing the GN reduction into the conv epilogue
    pessimizes the conv ~2x)."""
    if stem:
        h = _conv_stride2(x, block["conv1"], dtype, kernel=4)
    else:
        h = _conv2d(x, block["conv1"], dtype)
    h = lax.optimization_barrier(h)
    h = gn(h, block["gn1_scale"], block["gn1_bias"], groups)
    h = jax.nn.relu(h)
    h = lax.optimization_barrier(_conv2d(h.astype(dtype), block["conv2"], dtype))
    h = gn(h, block["gn2_scale"], block["gn2_bias"], groups)
    if "proj" in block:
        skip = (
            _conv_stride2(x, block["proj"], dtype, kernel=2)
            if stem
            else _conv2d(x, block["proj"], dtype)
        )
    else:
        skip = x
    return jax.nn.relu(h + skip.astype(h.dtype))


def _conv_block_s2d_up(block: Params, g, skip_t, groups, dtype, gn=_group_norm):
    """Decoder residual block with split (up, skip) kernels: the nearest-
    upsample (tile4) and channel concat never materialize - both conv1 and
    the residual projection read `g` (the planar upsampled features) and
    `skip_t` (the S2D skip tensor) directly and sum their halves."""
    h = _conv2d(g, block["conv1_up"], dtype) + _conv2d(
        skip_t, block["conv1_skip"], dtype
    )
    h = lax.optimization_barrier(h)
    h = gn(h, block["gn1_scale"], block["gn1_bias"], groups)
    h = jax.nn.relu(h)
    h = lax.optimization_barrier(_conv2d(h.astype(dtype), block["conv2"], dtype))
    h = gn(h, block["gn2_scale"], block["gn2_bias"], groups)
    skip = _conv2d(g, block["proj_up"], dtype) + _conv2d(
        skip_t, block["proj_skip"], dtype
    )
    return jax.nn.relu(h + skip.astype(h.dtype))


def _pool_s2d(x: jax.Array, c: int) -> jax.Array:
    """2x2 stride-2 max-pool of the underlying full-res tensor: in (c, a)
    order, a max over each channel's minor 4-lane sub-position group -
    emits the PLANAR half-resolution tensor."""
    b, h, w, _ = x.shape
    return jnp.max(x.reshape(b, h, w, c, 4), axis=4)


# ---------------------------------------------------------------------------
# Fused-conv (Pallas) block variants.
#
# Round-5 xprof of the composed forward: the 3x3 convs themselves run near
# bf16 peak, but XLA's conv partitioning materializes relayout copies +
# halo pads around every conv <-> GroupNorm boundary - 36.4 ms/img of the
# 76 ms forward at 2048^2 is `layout:copy`/`layout:pad`/reshape/
# slice-bitcast data movement (tools/prof_xprof.py). The fused kernel
# (models/conv_pallas.py) removes the boundary: each 3x3 conv call applies
# the PREVIOUS GroupNorm as a per-(batch, channel) affine prologue,
# accumulates the NEXT GroupNorm's moment sums, and optionally adds the
# decoder's split-kernel partner conv - one HBM read + one write per conv.
# Chain microbenchmark (tools/prof_conv_exp.py, v5e, 1024^2 x 128):
# 7.86 -> 3.66 ms/img/conv. The blocks below reproduce the XLA blocks'
# arithmetic with identical rounding points (conv accumulates f32, rounds
# to bf16; GN statistics are f32 sums of the bf16 activation; the
# normalize+affine is applied in f32 and rounded to bf16 before the
# residual add) - differing only in f32 summation grouping, the same
# tolerance class as the S2D rewrite itself.
# ---------------------------------------------------------------------------


def _gn_sums_xla(y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, C) f32 channel sums / sums-of-squares of a bf16 activation -
    the XLA-side moment computation for convs that stay on XLA (stems)."""
    s1 = jnp.sum(y, axis=(1, 2), dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
    return s1, s2


def _gn_count(y: jax.Array, groups: int) -> int:
    b, h, w, c = y.shape
    return h * w * (c // min(groups, c))


def _gn_affine(block: Params, which: str, moments, y, groups: int):
    from .conv_pallas import gn_affine_params

    s1, s2 = moments
    return gn_affine_params(
        s1, s2, block[f"{which}_scale"], block[f"{which}_bias"], groups,
        _gn_count(y, groups),
    )


def _fused_tail(block: Params, y2, moments2, skip, groups: int):
    """GN2 affine + residual + relu: one fused XLA elementwise pass over
    the kernel's output (same rounding points as _group_norm + add)."""
    sc2, bi2 = _gn_affine(block, "gn2", moments2, y2, groups)
    h = (
        y2.astype(jnp.float32) * sc2[:, None, None, :] + bi2[:, None, None, :]
    ).astype(y2.dtype)
    return jax.nn.relu(h + skip.astype(h.dtype))


def _block_convs_viable(shapes_and_cos) -> bool:
    from .conv_pallas import conv_pallas_viable

    return all(conv_pallas_viable(s, co) for s, co in shapes_and_cos)


def _conv_block_stem_fused(block: Params, x, groups, dtype, kernel: int = 4):
    """Stem block (conv1 = XLA stride-2, conv2 = fused kernel): GN1 is never
    materialized - its statistics reduce on XLA and ride conv2's prologue."""
    from .conv_pallas import conv3x3_fused

    y1 = _conv_stride2(x, block["conv1"], dtype, kernel=kernel)
    sc1, bi1 = _gn_affine(block, "gn1", _gn_sums_xla(y1), y1, groups)
    y2, m2 = conv3x3_fused(
        y1, block["conv2"], prologue=(sc1, bi1), relu=True, emit_moments=True
    )
    skip = _conv_stride2(x, block["proj"], dtype, kernel=2)
    return _fused_tail(block, y2, m2, skip, groups)


def _conv_block_dense_fused(block: Params, x, groups, dtype):
    """Dense residual block (deep levels) with the convs on the kernel.
    conv1 falls back to XLA when its input channels are not lane-aligned
    (down2's 64-channel input); its GN statistics then reduce on XLA and
    still ride conv2's kernel prologue."""
    from .conv_pallas import conv3x3_fused, conv_pallas_viable

    if conv_pallas_viable(x.shape, block["conv1"].shape[-1]):
        y1, m1 = conv3x3_fused(
            x.astype(dtype), block["conv1"], emit_moments=True
        )
    else:
        y1 = _conv2d(x, block["conv1"], dtype)
        m1 = _gn_sums_xla(y1)
    sc1, bi1 = _gn_affine(block, "gn1", m1, y1, groups)
    y2, m2 = conv3x3_fused(
        y1, block["conv2"], prologue=(sc1, bi1), relu=True, emit_moments=True
    )
    skip = _conv2d(x, block["proj"], dtype) if "proj" in block else x
    return _fused_tail(block, y2, m2, skip, groups)


def _conv_block_s2d_up_fused(block: Params, g, skip_t, groups, dtype):
    """S2D decoder block: conv1's split kernels chain through the fused
    kernel's `accum` input (no HBM round trip for the sum). The up-part
    conv falls back to XLA when `g`'s channels are not lane-aligned
    (up2's 64-channel planar input)."""
    from .conv_pallas import conv3x3_fused, conv_pallas_viable

    if conv_pallas_viable(g.shape, block["conv1_up"].shape[-1]):
        a = conv3x3_fused(g.astype(dtype), block["conv1_up"])
    else:
        a = _conv2d(g, block["conv1_up"], dtype)
    y1, m1 = conv3x3_fused(
        skip_t.astype(dtype), block["conv1_skip"], accum=a, emit_moments=True
    )
    sc1, bi1 = _gn_affine(block, "gn1", m1, y1, groups)
    y2, m2 = conv3x3_fused(
        y1, block["conv2"], prologue=(sc1, bi1), relu=True, emit_moments=True
    )
    skip = _conv2d(g, block["proj_up"], dtype) + _conv2d(
        skip_t, block["proj_skip"], dtype
    )
    return _fused_tail(block, y2, m2, skip, groups)


def _conv_block_up0_fused(block: Params, g, skip_t, groups, dtype):
    """up0: the fractionally-strided up-convs stay on XLA (4x4 dilated
    kernels); the 3x3 skip conv and conv2 run fused, with the up-conv
    accumulated in-kernel."""
    from .conv_pallas import conv3x3_fused

    a = _conv_up(g, block["conv1_up"], dtype)
    y1, m1 = conv3x3_fused(
        skip_t.astype(dtype), block["conv1_skip"], accum=a, emit_moments=True
    )
    sc1, bi1 = _gn_affine(block, "gn1", m1, y1, groups)
    y2, m2 = conv3x3_fused(
        y1, block["conv2"], prologue=(sc1, bi1), relu=True, emit_moments=True
    )
    skip = _conv_up(g, block["proj_up"], dtype) + _conv2d(
        skip_t, block["proj_skip"], dtype
    )
    return _fused_tail(block, y2, m2, skip, groups)




def apply_unet_s2d(
    sparams: Params,
    x: jax.Array,
    config: UNetConfig | None = None,
    pallas_gn: bool | None = None,
    out_s2d: bool = False,
    pallas_conv: bool | None = None,
) -> jax.Array:
    """`unet.apply_unet` on S2D-rewritten parameters; same (B, H, W, Cin) ->
    (B, H, W, 3) contract, H and W multiples of 8. Equal to the plain
    forward up to float reassociation (pinned by tests).

    `out_s2d=True` returns the head output ON the half-resolution S2D grid,
    (B, H/2, W/2, 12) in (c, a) channel order (flat = c*4 + (ay*2 + ax)):
    the same dot products as the transposed-conv head without the
    depth-to-space permutation, for consumers that read the network output
    elementwise (models/flows.compute_masks_sparse_compact_s2d). `_d2s` of
    it with c=3 is exactly the planar output.

    `pallas_gn` selects the fused-moments GroupNorm kernel
    (models/gn_pallas.py) per activation where its shape tiles; None = auto.
    Auto is OFF: composed into the full forward on a real v5e the kernel
    measured a 13 ms/img REGRESSION at 2048^2 (90.3 vs 77.3 ms/img,
    profile_deep.py round 4) - the Mosaic call is a fusion barrier around
    which XLA re-materializes the activation, costing more than the fused
    moment sweep saves. Kept opt-in (AMT_PALLAS_GN=1), same story as the
    blocked diffusion kernel (flows._USE_PALLAS_DIFFUSE) for hardware where
    the tradeoff flips. Spatially-sharded callers must pass False (a Mosaic
    call cannot be partitioned along a sharded image axis)."""
    config = config or UNetConfig()
    dtype = config.compute_dtype
    groups = config.groups
    nb = config.base_channels

    from .gn_pallas import gn_pallas_viable, group_norm_pallas

    use_pallas = (
        pallas_gn
        if pallas_gn is not None
        else os.environ.get("AMT_PALLAS_GN", "0") == "1"
        and jax.devices()[0].platform not in ("cpu",)
    )

    def gn(v, scale, bias, g):
        if use_pallas and gn_pallas_viable(v.shape):
            return group_norm_pallas(v, scale, bias, g)
        return _group_norm(v, scale, bias, g)

    # Fused-conv route (models/conv_pallas.py): default ON for TPU backends
    # where the block's conv shapes tile (conv_pallas_viable); forced off
    # under spatial sharding by callers (a Mosaic call cannot be
    # partitioned along a sharded image axis) and opt-out via
    # AMT_PALLAS_CONV=0. See the fused-block section above for why.
    use_pconv = (
        pallas_conv
        if pallas_conv is not None
        else os.environ.get("AMT_PALLAS_CONV", "1") == "1"
        and jax.devices()[0].platform not in ("cpu",)
    )
    from .conv_pallas import conv_pallas_viable

    def pv(shape_hw, c, co):
        b = x.shape[0]
        return use_pconv and conv_pallas_viable((b, *shape_hw, c), co)

    # encoder levels 0/1: stem blocks read full-resolution planar input and
    # emit the (c, a)-order S2D grid directly (no transpose materialized)
    b_, hh, ww = x.shape[0], x.shape[1] // 2, x.shape[2] // 2
    if pv((hh, ww), 4 * nb[0], 4 * nb[0]):
        h0 = _conv_block_stem_fused(sparams["down0"], x.astype(dtype), groups, dtype)
    else:
        h0 = _conv_block_s2d(
            sparams["down0"], x.astype(dtype), groups, dtype, stem=True, gn=gn
        )
    p0 = _pool_s2d(h0, nb[0])  # planar (B, H/2, W/2, nb0)
    if pv((hh // 2, ww // 2), 4 * nb[1], 4 * nb[1]):
        h1 = _conv_block_stem_fused(sparams["down1"], p0, groups, dtype)
    else:
        h1 = _conv_block_s2d(sparams["down1"], p0, groups, dtype, stem=True, gn=gn)
    p1 = _pool_s2d(h1, nb[1])  # planar (B, H/4, W/4, nb1)

    # deep levels densely (channels already MXU-wide)
    from .unet import _conv_block

    if pv((hh // 2, ww // 2), nb[2], nb[2]):  # conv2; conv1 falls back inside
        h2 = _conv_block_dense_fused(sparams["down_rest"][0], p1, groups, dtype)
    else:
        h2 = _conv_block(sparams["down_rest"][0], p1, groups, dtype, gn=gn)
    p2 = _max_pool(h2)
    if pv((hh // 4, ww // 4), nb[2], nb[3]) and pv((hh // 4, ww // 4), nb[3], nb[3]):
        deep = _conv_block_dense_fused(sparams["down_rest"][1], p2, groups, dtype)
    else:
        deep = _conv_block(sparams["down_rest"][1], p2, groups, dtype, gn=gn)

    style = jnp.mean(deep.astype(jnp.float32), axis=(1, 2))
    style = style / (jnp.linalg.norm(style, axis=-1, keepdims=True) + 1e-6)
    style = jax.nn.relu(style @ sparams["style_dense"])

    # decoder: up0 dense at true H/4 (upsample+concat folded into the
    # kernels), up1/up2 in (c, a) S2D form
    if pv((hh // 2, ww // 2), nb[2], nb[2]):
        h = _conv_block_up0_fused(sparams["up0"], deep, h2, groups, dtype)
    else:
        h = _conv_block_up0(sparams["up0"], deep, h2, groups, dtype, gn=gn)
    h = h + (style @ sparams["style_proj"][0]).astype(h.dtype)[:, None, None, :]

    # up1: true resolution H/2 -> S2D grid H/4; skip is h1 (already S2D).
    # Split kernels read the planar `h` and the skip directly - no tile4 /
    # concat tensor is ever built (see `_split_up_kernel`).
    if pv((hh // 2, ww // 2), nb[2], 4 * nb[1]) and pv(
        (hh // 2, ww // 2), 4 * nb[1], 4 * nb[1]
    ):
        h = _conv_block_s2d_up_fused(sparams["up1"], h, h1, groups, dtype)
    else:
        h = _conv_block_s2d_up(sparams["up1"], h, h1, groups, dtype, gn=gn)
    sb1 = (style @ sparams["style_proj"][1]).astype(h.dtype)
    h = h + jnp.repeat(sb1, 4, axis=1)[:, None, None, :]

    # up2: true resolution H -> S2D grid H/2. The depth-to-space is folded
    # into the up-part kernels (see _compose_d2s_conv3_kernel), so the
    # block is up0-form: fractionally-strided up convs read up1's S2D
    # output directly.
    if pv((hh, ww), 4 * nb[0], 4 * nb[0]):  # skip/conv2; up stays on XLA
        h = _conv_block_up0_fused(sparams["up2"], h, h0, groups, dtype)
    else:
        h = _conv_block_up0(sparams["up2"], h, h0, groups, dtype, gn=gn)
    sb2 = (style @ sparams["style_proj"][2]).astype(h.dtype)
    h = h + jnp.repeat(sb2, 4, axis=1)[:, None, None, :]

    if out_s2d:
        # head on the S2D grid: block-diagonal 1x1 conv, no depth-to-space
        out = _conv2d(h, sparams["head_s2d"], dtype) + sparams["head_bias_s2d"]
        return out.astype(jnp.float32)

    # head + depth-to-space fused in one transposed conv -> full resolution
    out = _conv_d2s(h, sparams["head"], dtype) + sparams["head_bias"]
    return out.astype(jnp.float32)
