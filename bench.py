"""Headline benchmark: images/sec/chip for 2048x2048 4-channel wells through
the full fused pipeline (DoG background subtraction -> percentile rescale ->
Otsu -> connected components -> per-cell morphology + 4-channel fluorescence
quantification), i.e. BASELINE.json's primary metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against the north-star target rate of 12.5
images/sec/chip (>100 images/sec on a v5e-8 for a 384-well 4-channel 2048^2
plate, BASELINE.md section b).

Env knobs: BENCH_BATCH (wells per dispatch), BENCH_SIZE, BENCH_REPS,
BENCH_CONFIG selects a BASELINE.md config instead of the headline run:
  2 = batched preprocessing only (Gaussian + median + rolling-ball, 2048^2)
  4 = U-Net inference + flow-tracking mask reconstruction
(The headline run covers configs 1/3/5's compute path end-to-end.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def _bench_preprocessing(B: int, H: int, reps: int) -> None:
    """BASELINE config 2: Gaussian + median denoise + rolling-ball background."""
    import jax
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.ops.filters import (
        gaussian_filter,
        median_filter,
        subtract_background_rolling_ball,
    )

    rng = np.random.default_rng(0)
    tiles = jnp.asarray((rng.random((B, H, H)) * 4000).astype(np.uint16))

    @jax.jit
    def program(x):
        y = gaussian_filter(x.astype(jnp.float32), 2.0)
        y = median_filter(y, 3)
        return subtract_background_rolling_ball(y, radius=25)

    _ = float(program(tiles).ravel()[0])
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = program(tiles)
    _ = float(out.ravel()[0])
    rate = B * reps / (time.time() - t0)
    print(json.dumps({
        "metric": "2048x2048 preprocessing (gaussian+median+rolling-ball)",
        "value": round(rate, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / 12.5, 3),
    }))


def _bench_unet(B: int, reps: int) -> None:
    """BASELINE config 4: U-Net forward + flow tracking at 512^2."""
    import jax
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.models.flows import compute_masks
    from arcadia_microscopy_tools_tpu.models.unet import apply_unet
    from arcadia_microscopy_tools_tpu.models.weights import seeded_params

    params = seeded_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 512, 512, 3)).astype(np.float32))

    @jax.jit
    def program(params, x):
        out = apply_unet(params, x)
        return jax.vmap(
            lambda o: compute_masks(o, flow_threshold=0.0, niter=100, max_cells=1024)
        )(out)

    _ = float(program(params, x).ravel()[0])
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = program(params, x)
    _ = float(out.ravel()[0])
    rate = B * reps / (time.time() - t0)
    print(json.dumps({
        "metric": "512x512 U-Net segment (forward + flow tracking)",
        "value": round(rate, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / 12.5, 3),
    }))


def main() -> None:
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.parallel.plate import (
        PlateRunConfig,
        _build_well_program,
    )

    config_mode = os.environ.get("BENCH_CONFIG", "")
    if config_mode == "2":
        _bench_preprocessing(
            int(os.environ.get("BENCH_BATCH", "2")),
            int(os.environ.get("BENCH_SIZE", "2048")),
            int(os.environ.get("BENCH_REPS", "5")),
        )
        return
    if config_mode == "4":
        _bench_unet(
            int(os.environ.get("BENCH_BATCH", "2")),
            int(os.environ.get("BENCH_REPS", "5")),
        )
        return

    B = int(os.environ.get("BENCH_BATCH", "8"))
    H = W = int(os.environ.get("BENCH_SIZE", "2048"))
    C = 4
    reps = int(os.environ.get("BENCH_REPS", "5"))

    # synthetic 4-channel wells with ~300 cells each
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

    config = PlateRunConfig(max_cells=1024, min_size=20)
    well_fn = _build_well_program(config, n_channels=C)
    program = jax.jit(jax.vmap(well_fn))

    def force(out):
        # A scalar readback forces program completion; block_until_ready
        # alone does not reliably block through tunneled TPU backends.
        props, _, _ = out
        return float(props["area"].ravel()[0])

    # warmup / compile
    force(program(wells))

    t0 = time.time()
    out = None
    for _ in range(reps):
        out = program(wells)
    force(out)
    elapsed = time.time() - t0

    n_images = B * reps
    rate = n_images / elapsed
    n_chips = max(1, len([d for d in jax.devices() if d.platform != "cpu"]))
    per_chip = rate / n_chips

    target_per_chip = 12.5  # >100 images/sec on 8 chips (BASELINE.md)
    result = {
        "metric": "2048x2048 4-ch preprocess+segment+measure throughput",
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / target_per_chip, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
