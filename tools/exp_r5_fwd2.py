"""Round-5: composed S2D forward with the fused Pallas conv route ON vs
OFF, on the real chip, plus the plate-runner calling convention (vmap over
wells of B=1 calls -> sequential_vmap). Not part of the test suite.

Usage: python tools/exp_r5_fwd2.py
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
def fwd_xla(xx):
    return apply_unet_s2d(sp, xx, out_s2d=True, pallas_conv=False)


@jax.jit
def fwd_pallas(xx):
    return apply_unet_s2d(sp, xx, out_s2d=True, pallas_conv=True)


@jax.jit
def fwd_pallas_vmap(xx):
    # plate convention: per-well B=1 call under vmap
    return jax.vmap(lambda im: apply_unet_s2d(sp, im[None, ..., None], out_s2d=True,
                                              pallas_conv=True)[0])(xx)


ref = timeit("forward s2d head (XLA convs)", fwd_xla, x)
got = timeit("forward s2d head (Pallas fused convs)", fwd_pallas, x)
d = float(jnp.max(jnp.abs(got - ref)))
print(f"max |diff| xla vs pallas: {d:.3e} (range {float(jnp.abs(ref).max()):.2f})")
got2 = timeit("forward s2d head (fused, vmap-of-B=1)", fwd_pallas_vmap, x[..., 0])
d2 = float(jnp.max(jnp.abs(got2 - got)))
print(f"max |diff| batched vs vmapped: {d2:.3e}")
