"""Quick steady-state timing of the fused deep plate program at B=8.

Measures the exact program `bench.py` reports as "U-Net plate throughput"
without the other bench configs - for fast iteration on deep-path
optimizations. Not part of the test suite.
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
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params
from arcadia_microscopy_tools_tpu.parallel.plate import PlateRunConfig, _build_well_program

B = int(os.environ.get("PROF_BATCH", "8"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
C = 4
REPS = int(os.environ.get("PROF_REPS", "3"))

ckpt = REPO / "checkpoints" / "unet"
params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()

rng = np.random.default_rng(0)
base = rng.normal(150, 15, (B, C, H, W)).clip(0, None)
yy, xx = np.mgrid[0:48, 0:48]
blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
for b in range(B):
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        base[b, 0, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
        for ch in range(1, C):
            base[b, ch, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob * rng.uniform(0.2, 1)
wells = jnp.asarray(base.astype(np.uint16))

config = PlateRunConfig(
    method="unet", max_cells=1024, min_size=20, niter=200, flow_threshold=0.4,
)
well_fn = _build_well_program(config, n_channels=C, unet_params=params)
program = jax.jit(jax.vmap(well_fn))

warm = program(wells)
packed, health = warm
_ = float(packed.ravel()[0])
overflow = np.asarray(health)[..., 1] > 0
assert not overflow.any(), "fg cap overflow - rate would undercount"

t0 = time.time()
out = None
for _ in range(REPS):
    out = program(wells)
_ = float(out[0].ravel()[0])
dt = time.time() - t0
ms = dt / (REPS * B) * 1000
print(f"deep plate fused: {ms:.1f} ms/img = {1000/ms:.2f} img/s/chip (B={B}, reps={REPS})")
