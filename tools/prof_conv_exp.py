"""Microbenchmark: XLA conv3x3 chain layouts vs alternatives at the S2D
level-0 shape (B, 1024, 1024, 128) bf16.

The composed forward pays ~0.8 ms relayout copies between consecutive convs
(xprof round 4); this isolates a 4-conv chain with GN+relu between (the real
block structure) and compares:
  nhwc   - production path (_conv2d NHWC)
  nchw   - same math, NCHW dimension numbers
  taps   - conv as 9 shifted dot_generals on a once-padded tensor
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

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "1024"))
C = int(os.environ.get("PROF_CH", "128"))
REPS = int(os.environ.get("PROF_REPS", "5"))
NCONV = 4

# activations generated ON-DEVICE: a (B, 1024, 1024, 128) f32 host array is
# ~1 GB and the tunneled H2D link moves 3-40 MB/s - host-side generation
# times the transfer, not the chain
keys = jax.random.split(jax.random.PRNGKey(0), NCONV + 1)
x0 = jax.jit(
    lambda k: jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
)(keys[0])
ws = [
    jax.jit(lambda k: jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.05)(k)
    for k in keys[1:]
]
scale = jnp.ones((C,), jnp.float32)
bias = jnp.zeros((C,), jnp.float32)


def gn_relu(h):
    # 8-group GN + relu, mirroring unet._group_norm's structure
    b, hh, ww, c = h.shape
    g = 8
    v = h.astype(jnp.float32).reshape(b, hh, ww, g, c // g)
    mu = v.mean(axis=(1, 2, 4), keepdims=True)
    var = ((v - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    v = (v - mu) * lax.rsqrt(var + 1e-5)
    v = v.reshape(b, hh, ww, c) * scale + bias
    return jax.nn.relu(v).astype(h.dtype)


@jax.jit
def chain_nhwc(x):
    h = x
    for w in ws:
        dn = lax.conv_dimension_numbers(h.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        h = lax.conv_general_dilated(
            h, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        h = lax.optimization_barrier(h)
        h = gn_relu(h)
    return h


@jax.jit
def chain_nchw(x):
    h = jnp.transpose(x, (0, 3, 1, 2))
    for w in ws:
        dn = lax.conv_dimension_numbers(h.shape, w.shape, ("NCHW", "HWIO", "NCHW"))
        h = lax.conv_general_dilated(
            h, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        h = lax.optimization_barrier(h)
        hh = jnp.transpose(h, (0, 2, 3, 1))
        h = jnp.transpose(gn_relu(hh), (0, 3, 1, 2))
    return jnp.transpose(h, (0, 2, 3, 1))


@jax.jit
def chain_taps(x):
    h = x
    for w in ws:
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = lax.dynamic_slice(hp, (0, dy, dx, 0), (B, H, W, C))
                acc = acc + lax.dot_general(
                    xs, w[dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        h = lax.optimization_barrier(acc.astype(jnp.bfloat16))
        h = gn_relu(h)
    return h


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    dt = (time.time() - t0) / (REPS * B * NCONV) * 1000
    print(f"{name:12s} {dt:7.3f} ms/img/conv", flush=True)


from arcadia_microscopy_tools_tpu.models.conv_pallas import (
    conv3x3_fused,
    gn_affine_params,
)


@jax.jit
def chain_pallas(x):
    # conv -> GN -> relu chain with GN folded into kernel prologue/moments
    h = x
    prev = None  # (eff_scale, eff_bias) from previous conv's moments
    for w in ws:
        h, (s1, s2) = conv3x3_fused(
            h, w, prologue=prev, relu=prev is not None, emit_moments=True
        )
        prev = gn_affine_params(s1, s2, scale, bias, 8, H * W * (C // 8))
    # final GN applied plain so output matches chain_nhwc's tail
    b, hh, ww_, c = h.shape
    f = h.astype(jnp.float32) * prev[0][:, None, None, :] + prev[1][:, None, None, :]
    return jax.nn.relu(f).astype(jnp.bfloat16)


flop = H * W * C * C * 9 * 2
print(f"shape (B={B}, {H}x{W}, {C}ch): {flop/1e9:.1f} GFLOP/conv/img "
      f"-> {flop/197e12*1000:.2f} ms at bf16 peak")
timeit("nhwc", chain_nhwc, x0)
if os.environ.get("PROF_ALL", "") == "1":
    timeit("nchw", chain_nchw, x0)
    timeit("taps", chain_taps, x0)
timeit("pallas", chain_pallas, x0)
