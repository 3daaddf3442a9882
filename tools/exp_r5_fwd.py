"""Round-5 experiment: is the conv/GN `optimization_barrier` still paying
for itself inside the full S2D forward?

The barrier was introduced in round 3 when fusing the GroupNorm reduction
into the conv epilogue pessimized a conv+GN PAIR ~2x in isolation. The
round-5 xprof of the full forward shows ~15-20 ms/img of layout copies and
materialized pads clustered around the barrier-pinned values (copy.3xx /
pad.3x ops at 0.8 ms each) - a barrier forces a materialized tensor whose
layout XLA picks independently on each side. This times the FULL forward
with the barrier as identity vs. live. Not part of the test suite.

Usage: python tools/exp_r5_fwd.py
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

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
REPS = int(os.environ.get("PROF_REPS", "5"))

from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params
from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params

ckpt = REPO / "checkpoints" / "unet"
params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()
sp = s2d_params(params, gray_input=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"{name:46s} {dt:8.1f} ms/img", flush=True)
    return out


@jax.jit
def fwd_barrier(xx):
    return apply_unet_s2d(sp, xx, out_s2d=True)


ref = timeit("forward s2d head (barriers ON, current)", fwd_barrier, x)

# identity-patch the barrier and build a distinct jit cache entry
_orig = jax.lax.optimization_barrier
jax.lax.optimization_barrier = lambda v: v
from arcadia_microscopy_tools_tpu.models import unet, unet_s2d

unet.lax.optimization_barrier = lambda v: v  # same module object; explicit


@jax.jit
def fwd_nobarrier(xx):
    return apply_unet_s2d(sp, xx, out_s2d=True)


got = timeit("forward s2d head (barriers OFF)", fwd_nobarrier, x)
jax.lax.optimization_barrier = _orig

d = float(jnp.max(jnp.abs(got - ref)))
print(f"max |diff| barriers on/off: {d:.2e}")
