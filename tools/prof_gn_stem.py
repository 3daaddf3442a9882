"""Microbenchmarks for the two attributed forward hot spots (v5e):

1. GroupNorm at the U-Net's high-res levels: XLA one-pass vs the Pallas
   fused-moments kernel (models/gn_pallas.py).
2. The down0 stem conv (4x4 stride-2, cin=3 replicated grayscale):
   variants that raise the MXU contraction utilization.

Amortized-chain timing (single dispatches carry ~7 ms of tunnel overhead).
Not part of the test suite.
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
from jax import lax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arcadia_microscopy_tools_tpu.models.gn_pallas import group_norm_pallas
from arcadia_microscopy_tools_tpu.models.unet import _group_norm

REPS = int(os.environ.get("PROF_REPS", "10"))
CHAIN = 4  # ops per dispatch; amortizes tunnel overhead


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / (REPS * CHAIN) * 1000
    print(f"{name:52s} {dt:8.2f} ms/op", flush=True)


rng = np.random.default_rng(0)

# ---- GroupNorm at the down0/up2 level: (2, 1024, 1024, 128) bf16 ----
x = jnp.asarray(rng.random((2, 1024, 1024, 128)).astype(np.float32)).astype(
    jnp.bfloat16
)
scale = jnp.asarray(rng.random(128).astype(np.float32))
bias = jnp.asarray(rng.random(128).astype(np.float32))


def chain(fn):
    def run(x0):
        h = x0
        for _ in range(CHAIN):
            h = fn(h) + x0  # keep dtype/shape; defeat CSE via dependence
        return h

    return run


timeit("GN xla  (2,1024,1024,128) bf16", chain(lambda v: _group_norm(v, scale, bias, 8)), x)
timeit("GN plas (2,1024,1024,128) bf16", chain(lambda v: group_norm_pallas(v, scale, bias, 8)), x)

x2 = jnp.asarray(rng.random((2, 512, 512, 256)).astype(np.float32)).astype(jnp.bfloat16)
scale2 = jnp.asarray(rng.random(256).astype(np.float32))
bias2 = jnp.asarray(rng.random(256).astype(np.float32))
timeit("GN xla  (2,512,512,256) bf16", chain(lambda v: _group_norm(v, scale2, bias2, 8)), x2)
timeit("GN plas (2,512,512,256) bf16", chain(lambda v: group_norm_pallas(v, scale2, bias2, 8)), x2)

# numeric check
a = np.asarray(_group_norm(x[:1], scale, bias, 8), dtype=np.float32)
b = np.asarray(group_norm_pallas(x[:1], scale, bias, 8), dtype=np.float32)
print("GN max|diff|:", np.abs(a - b).max(), flush=True)

# ---- stem conv variants: 4x4/2, cin=3 replicated gray, 2048^2 ----
B = 2
img = jnp.asarray(rng.random((B, 2048, 2048)).astype(np.float32))
w4 = jnp.asarray(rng.normal(0, 0.1, (4, 4, 3, 128)).astype(np.float32))
dn3 = lax.conv_dimension_numbers((B, 2048, 2048, 3), (4, 4, 3, 128), ("NHWC", "HWIO", "NHWC"))


def stem_cin3(im):
    x3 = jnp.stack([im, im, im], axis=-1).astype(jnp.bfloat16)
    return lax.conv_general_dilated(
        x3, w4.astype(jnp.bfloat16), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=dn3,
    )


w1 = jnp.sum(w4, axis=2, keepdims=True)  # replicated-gray fold
dn1 = lax.conv_dimension_numbers((B, 2048, 2048, 1), (4, 4, 1, 128), ("NHWC", "HWIO", "NHWC"))


def stem_cin1(im):
    x1 = im[..., None].astype(jnp.bfloat16)
    return lax.conv_general_dilated(
        x1, w1.astype(jnp.bfloat16), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=dn1,
    )


# S2D2 of the gray image -> 2x2 conv cin=4. Window alignment: output (i, j)
# of the stride-2 conv reads input rows 2i-1..2i+2 (pad 1). In S2D2 block
# coords that is blocks i-1..i+1 asymmetric - build via im2col matmul
# instead: taps (dy, dx) in 4x4 around (2i-1, 2j-1).
w_flat = jnp.asarray(np.sum(np.asarray(w4, np.float32), axis=2).reshape(16, 128))


def stem_im2col(im):
    imp = jnp.pad(im, ((0, 0), (1, 2), (1, 2)))  # rows 2i-1 .. 2i+2
    cols = []
    for dy in range(4):
        for dx in range(4):
            cols.append(imp[:, dy : dy + 2048 : 2, dx : dx + 2048 : 2])
    patch = jnp.stack(cols, axis=-1).astype(jnp.bfloat16)  # (B,1024,1024,16)
    return jax.lax.dot_general(
        patch, w_flat.astype(jnp.bfloat16),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def chain_img(fn):
    def run(im):
        acc = None
        h = im
        for _ in range(CHAIN):
            o = fn(h)
            acc = o if acc is None else acc + o
            h = h + acc[..., 0].repeat(2, 1).repeat(2, 2).astype(im.dtype)
        return acc

    return run


timeit("stem 4x4/2 cin=3 (current)", chain_img(stem_cin3), img)
timeit("stem 4x4/2 cin=1 (gray fold)", chain_img(stem_cin1), img)
timeit("stem im2col 16 -> matmul", chain_img(stem_im2col), img)

a = np.asarray(stem_cin3(img), np.float32)
c = np.asarray(stem_im2col(img), np.float32)
print("stem max|cin3-im2col|:", np.abs(a - c).max(), flush=True)
