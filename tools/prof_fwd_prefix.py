"""Prefix-difference attribution of the S2D U-Net forward on the real chip.

Times jitted PREFIXES of apply_unet_s2d (truncated after each level) and
prints consecutive differences: through this environment's tunneled TPU a
single dispatch carries ~7 ms of overhead, so per-level cost is only honest
as a difference of two whole-program timings (see ROADMAP "Measured and
rejected"). Not part of the test suite.

Usage: PROF_SIZE=2048 PROF_REPS=5 python tools/prof_fwd_prefix.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arcadia_microscopy_tools_tpu.models.unet import UNetConfig, _conv_block, _max_pool
from arcadia_microscopy_tools_tpu.models.unet_s2d import (
    _conv_block_s2d,
    _conv_block_s2d_up,
    _conv_block_up0,
    _conv_d2s,
    _pool_s2d,
    s2d_params,
)
from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
REPS = int(os.environ.get("PROF_REPS", "5"))

ckpt = REPO / "checkpoints" / "unet"
params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()
sparams = s2d_params(params)
cfg = UNetConfig()
dtype, groups, nb = cfg.compute_dtype, cfg.groups, cfg.base_channels

STAGES = [
    "down0", "pool0", "down1", "pool1", "down2", "pool2", "down3",
    "style", "up0", "up1", "d2s", "up2", "head",
]


def forward_prefix(sp, x, n):
    h0 = _conv_block_s2d(sp["down0"], x.astype(dtype), groups, dtype, stem=True)
    if n == 0:
        return h0
    p0 = _pool_s2d(h0, nb[0])
    if n == 1:
        return p0
    h1 = _conv_block_s2d(sp["down1"], p0, groups, dtype, stem=True)
    if n == 2:
        return h1
    p1 = _pool_s2d(h1, nb[1])
    if n == 3:
        return p1
    h2 = _conv_block(sp["down_rest"][0], p1, groups, dtype)
    if n == 4:
        return h2
    p2 = _max_pool(h2)
    if n == 5:
        return p2
    deep = _conv_block(sp["down_rest"][1], p2, groups, dtype)
    if n == 6:
        return deep
    style = jnp.mean(deep.astype(jnp.float32), axis=(1, 2))
    style = style / (jnp.linalg.norm(style, axis=-1, keepdims=True) + 1e-6)
    style = jax.nn.relu(style @ sp["style_dense"])
    if n == 7:
        return style
    h = _conv_block_up0(sp["up0"], deep, h2, groups, dtype)
    h = h + (style @ sp["style_proj"][0]).astype(h.dtype)[:, None, None, :]
    if n == 8:
        return h
    h = _conv_block_s2d_up(sp["up1"], h, h1, groups, dtype)
    sb1 = (style @ sp["style_proj"][1]).astype(h.dtype)
    h = h + jnp.repeat(sb1, 4, axis=1)[:, None, None, :]
    if n == 9:
        return h
    if n == 10:
        return h  # d2s folded into up2's up kernels since round 5
    h = _conv_block_up0(sp["up2"], h, h0, groups, dtype)
    sb2 = (style @ sp["style_proj"][2]).astype(h.dtype)
    h = h + jnp.repeat(sb2, 4, axis=1)[:, None, None, :]
    if n == 11:
        return h
    return _conv_d2s(h, sp["head"], dtype) + sp["head_bias"]


rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))

prev = 0.0
for n, name in enumerate(STAGES):
    fn = jax.jit(lambda xx, n=n: forward_prefix(sparams, xx, n))
    out = fn(x)
    _ = np.asarray(out.ravel()[0])  # warm + force
    t0 = time.time()
    for _ in range(REPS):
        out = fn(x)
    _ = np.asarray(out.ravel()[0])
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"prefix {name:6s} {dt:8.2f} ms/img   delta {dt - prev:8.2f}", flush=True)
    prev = dt
