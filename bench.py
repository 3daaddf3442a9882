"""Headline benchmark: images/sec/chip for 2048x2048 4-channel wells through
the full fused pipeline (DoG background subtraction -> percentile rescale ->
Otsu -> connected components -> per-cell morphology + 4-channel fluorescence
quantification), i.e. BASELINE.json's primary metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against the north-star target rate of 12.5
images/sec/chip (>100 images/sec on a v5e-8 for a 384-well 4-channel 2048^2
plate, BASELINE.md section b).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.parallel.plate import (
        PlateRunConfig,
        _build_well_program,
    )

    B = int(os.environ.get("BENCH_BATCH", "2"))
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
        _, props, _ = out
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
