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
  3 = timelapse classical (local threshold + morphology + CC, 1024^2 stack)
  4 = U-Net inference + flow-tracking mask reconstruction
  5 = decode-inclusive plate run from real ND2 files on disk
(The headline run covers configs 1/5's compute path end-to-end.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

# Roofline assumptions (TPU v5e, per chip): bf16 MXU peak and HBM bandwidth
# from the public v5e datasheet. `mfu` = achieved analytical FLOP rate /
# BF16 peak; `hbm_frac` = achieved HBM traffic rate / peak bandwidth. FLOP
# and byte counts come from XLA's own cost model on the compiled program
# (compiled.cost_analysis()), so they reflect post-fusion reality rather
# than hand math. For memory-bound stages hbm_frac is the roofline to read;
# for the U-Net forward, mfu.
V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _xla_cost(jitted, *args) -> tuple[float, float]:
    """(flops, bytes accessed) of the compiled program per dispatch, from
    XLA's cost model; (0, 0) when the backend does not expose it."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:  # noqa: BLE001 - cost analysis is best-effort telemetry
        return 0.0, 0.0


def _trials(default: int = 5) -> int:
    return max(1, int(os.environ.get("BENCH_TRIALS", str(default))))


def _rate_stats(time_one_trial, n_items: int, trials: int) -> dict:
    """Median-of-trials throughput with spread. Each trial re-times the same
    dispatch loop; the tunnel jitters enough that single point estimates
    cannot gate regressions (round-4 VERDICT item 2), so every metric now
    reports the median rate, the relative spread (max-min)/median, and the
    raw per-trial rates."""
    rates = []
    for _ in range(trials):
        rates.append(n_items / time_one_trial())
    rates.sort()
    n = len(rates)
    med = rates[n // 2] if n % 2 else 0.5 * (rates[n // 2 - 1] + rates[n // 2])
    return {
        "rate": med,
        "spread": round((rates[-1] - rates[0]) / med, 4) if med else 0.0,
        "trials": trials,
        "trial_rates": [round(r, 3) for r in rates],
    }


def _emit(metric: str, rate: float, flops_per_img: float = 0.0,
          bytes_per_img: float = 0.0, **extra) -> None:
    line = {
        "metric": metric,
        "value": round(rate, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / 12.5, 3),
    }
    if flops_per_img > 0:
        line["flops_per_image"] = float(f"{flops_per_img:.4g}")
        line["mfu"] = round(rate * flops_per_img / V5E_BF16_PEAK_FLOPS, 4)
    if bytes_per_img > 0:
        line["hbm_bytes_per_image"] = float(f"{bytes_per_img:.4g}")
        line["hbm_frac"] = round(rate * bytes_per_img / V5E_HBM_BYTES_PER_S, 4)
    line.update(extra)
    print(json.dumps(line))


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

    flops, nbytes = _xla_cost(program, tiles)
    _ = float(program(tiles).ravel()[0])

    def trial():
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = program(tiles)
        _ = float(out.ravel()[0])
        return time.time() - t0

    stats = _rate_stats(trial, B * reps, _trials())
    _emit(
        f"{H}x{H} preprocessing (gaussian+median+rolling-ball)",
        stats["rate"], flops / B, nbytes / B,
        spread=stats["spread"], trials=stats["trials"],
        trial_rates=stats["trial_rates"],
    )


def _bench_unet(B: int, reps: int, H: int = 512) -> None:
    """BASELINE config 4: U-Net forward + flow tracking (BENCH_SIZE, default
    512^2)."""
    import jax
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.models.flows import compute_masks
    from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params
    from arcadia_microscopy_tools_tpu.models.weights import seeded_params

    params = s2d_params(seeded_params())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, H, 3)).astype(np.float32))

    @jax.jit
    def program(params, x):
        out = apply_unet_s2d(params, x)
        return jax.vmap(
            lambda o: compute_masks(o, flow_threshold=0.0, niter=100, max_cells=1024)
        )(out)

    flops, nbytes = _xla_cost(program, params, x)
    _ = float(program(params, x).ravel()[0])

    def trial():
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = program(params, x)
        _ = float(out.ravel()[0])
        return time.time() - t0

    stats = _rate_stats(trial, B * reps, _trials())
    _emit(
        f"{H}x{H} U-Net segment (forward + flow tracking)",
        stats["rate"], flops / B, nbytes / B,
        spread=stats["spread"], trials=stats["trials"],
        trial_rates=stats["trial_rates"],
    )


def _bench_unet_plate(wells, reps: int) -> None:
    """Deep-path headline: the FULL U-Net plate program (normalize -> U-Net
    forward -> flow tracking -> QC -> per-cell morphology + 4-ch intensity)
    on 2048^2 wells - the round-2 VERDICT asked for this number recorded in
    the BENCH artifact (the reference's deep path is a serial Python loop
    over Cellpose at amt/model.py:276-288)."""
    from pathlib import Path

    import jax

    from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params
    from arcadia_microscopy_tools_tpu.parallel.plate import (
        PlateRunConfig,
        _build_well_program,
    )

    ckpt = Path(__file__).parent / "checkpoints" / "unet"
    params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()

    B, C, H = wells.shape[0], wells.shape[1], wells.shape[2]
    # the DEFAULT fg_cap_fraction (0.0625 = 262k active pixels at 2048^2,
    # ~3.5x margin over these wells' true foreground) - what a user gets out
    # of the box; the no-overflow assert below keeps the number honest (an
    # overflowed dispatch advects only a prefix of the active pixels = less
    # work, and real denser wells would pay the escalation redispatch)
    config = PlateRunConfig(
        method="unet", max_cells=1024, min_size=20, niter=200, flow_threshold=0.4,
    )
    well_fn = _build_well_program(config, n_channels=C, unet_params=params)
    program = jax.jit(jax.vmap(well_fn))

    def force(out):
        packed, _ = out
        return float(packed.ravel()[0])

    warm = program(wells)
    force(warm)
    # health vector layout: [num_components, fg_overflow, converged]
    overflow = np.asarray(warm[1])[..., 1] > 0
    if overflow.any():
        raise RuntimeError(
            "U-Net plate bench overflowed its foreground cap; the measured "
            "rate would undercount the work - raise fg_cap_fraction"
        )
    flops, nbytes = _xla_cost(program, wells)

    def trial():
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = program(wells)
        force(out)
        return time.time() - t0

    stats = _rate_stats(trial, B * reps, _trials())
    _emit(
        f"{H}x{H} 4-ch U-Net plate throughput (forward+flows+measure)",
        stats["rate"], flops / B, nbytes / B,
        spread=stats["spread"], trials=stats["trials"],
        trial_rates=stats["trial_rates"],
    )


def _bench_timelapse_classical(B: int, T: int, H: int, reps: int) -> None:
    """BASELINE config 3: local threshold + morphology + connected components
    over a timelapse stack, one fused vmapped program per batch."""
    import jax
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.ops.labeling import label
    from arcadia_microscopy_tools_tpu.ops.morphology import binary_opening, disk
    from arcadia_microscopy_tools_tpu.ops.threshold import threshold_local

    rng = np.random.default_rng(0)
    base = rng.normal(400, 40, (B * T, H, H)).clip(0, None)
    yy, xx = np.mgrid[0:32, 0:32]
    blob = 2500 * np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 24.0)
    for f in range(B * T):
        for _ in range(120):
            cy, cx = rng.integers(16, H - 16), rng.integers(16, H - 16)
            base[f, cy - 16 : cy + 16, cx - 16 : cx + 16] += blob
    stack = jnp.asarray(base.astype(np.uint16))
    footprint = disk(2)

    @jax.jit
    def program(frames):
        def one(img):
            # offset below the local mean by less than the blob amplitude:
            # cells (locally bright) pass, background (= its own local mean
            # plus noise) does not
            mask = img.astype(jnp.float32) > threshold_local(img, block_size=33, offset=-150.0)
            mask = binary_opening(mask, footprint)
            return label(mask, checked=False)

        return jax.vmap(one)(frames)

    def force(out):
        # slice ON DEVICE and read one scalar: np.asarray(out) would drag the
        # whole label stack through the (slow, tunneled) host link and
        # dominate the measurement
        return int(out[0, 0, 0])

    _ = force(program(stack))

    def trial():
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = program(stack)
        _ = force(out)
        return time.time() - t0

    stats = _rate_stats(trial, B * T * reps, _trials())
    print(json.dumps({
        "metric": f"{H}x{H} timelapse classical (local threshold+opening+CC)",
        "value": round(stats["rate"], 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(stats["rate"] / 12.5, 3),
        "spread": stats["spread"],
        "trials": stats["trials"],
        "trial_rates": stats["trial_rates"],
    }))


def _make_well_pixels(rng, C: int, H: int) -> np.ndarray:
    base = rng.normal(150, 15, (C, H, H)).clip(0, None)
    yy, xx = np.mgrid[0:48, 0:48]
    blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, H - 24)
        base[0, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
        for ch in range(1, C):
            base[ch, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob * rng.uniform(0.2, 1)
    return base.astype(np.uint16)


def _bench_decode_inclusive(n_wells: int, H: int, fmt: str = "nd2") -> None:
    """The north-star metric as defined: file decode -> preprocess -> segment
    -> quantify, end-to-end from real ND2 (or LIF, fmt="lif") files on disk,
    with decode prefetched on one worker thread per host core so it overlaps
    device compute.

    Prints one JSON line (before the headline line) with the decode-inclusive
    rate and the per-stage timings. Reading the timings: `decode_s` sums
    per-well decode WALL seconds on the worker threads (on a host with fewer
    cores than concurrent threads it includes time the worker was
    descheduled); `decode_cpu_s` sums the worker-thread CPU seconds - the
    honest per-well decode cost is decode_cpu_s / decode_wells. `device_s`
    is dispatch+drain wall; decode and device overlap, so the stages can sum
    past `wall_s`.
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

    from arcadia_microscopy_tools_tpu.core.microplate import MicroplateLayout, Well
    from arcadia_microscopy_tools_tpu.parallel.plate import PlateRunConfig, PlateRunner

    C = 4
    plate_dir = Path(
        os.environ.get("BENCH_PLATE_DIR", f"/tmp/amt_bench_plate_{H}_{fmt}")
    )
    plate_dir.mkdir(parents=True, exist_ok=True)
    ids = [f"{chr(65 + i // 12)}{(i % 12) + 1:02d}" for i in range(n_wells)]
    rng = np.random.default_rng(0)

    if fmt == "nd2":
        from nd2_builder import write_nd2

        from arcadia_microscopy_tools_tpu.io.nikon import load_nd2

        for well_id in ids:
            path = plate_dir / f"{well_id}.nd2"
            if not path.exists():
                write_nd2(
                    path,
                    _make_well_pixels(rng, C, H),
                    channel_names=["DAPI", "FITC", "TRITC", "CY5"],
                )

        def source(well_id: str) -> np.ndarray:
            pixels, _ = load_nd2(plate_dir / f"{well_id}.nd2")
            return pixels
    else:
        from lif_builder import LifBuilder

        from arcadia_microscopy_tools_tpu.io.leica import load_lif_image

        for well_id in ids:
            path = plate_dir / f"{well_id}.lif"
            if not path.exists():
                builder = LifBuilder()
                builder.add_image(
                    well_id,
                    _make_well_pixels(rng, C, H),
                    dims=[(1, H, H * 3.5e-7, "m"), (2, H, H * 3.5e-7, "m")],
                )
                builder.write(path)

        def source(well_id: str) -> np.ndarray:
            pixels, _ = load_lif_image(plate_dir / f"{well_id}.lif", well_id)
            return pixels

    layout = MicroplateLayout([Well(id=i) for i in ids])
    runner = PlateRunner(PlateRunConfig(max_cells=1024, min_size=20, batch_size=8))
    runner.run(MicroplateLayout([Well(id=ids[0])]), source)  # compile warmup

    walls = []
    last = None

    def trial():
        nonlocal last
        t0 = time.time()
        results = runner.run(layout, source)
        dt = time.time() - t0
        assert not results.failed_wells, results.failed_wells
        walls.append(dt)
        last = results
        return dt

    # decode-inclusive trials are expensive (full plate decode each time);
    # default 3 here vs 5 for the compute-only configs
    stats = _rate_stats(trial, n_wells, _trials(3))
    timings = {k: round(v, 3) for k, v in last.timings.items()}
    if last.timings.get("decode_wells"):
        timings["decode_cpu_ms_per_well"] = round(
            1e3 * last.timings["decode_cpu_s"] / last.timings["decode_wells"], 1
        )
    print(json.dumps({
        "metric": f"{H}x{H} {C}-ch {fmt.upper()}-decode-inclusive plate throughput",
        "value": round(stats["rate"], 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(stats["rate"] / 12.5, 3),
        "spread": stats["spread"],
        "trials": stats["trials"],
        "trial_rates": stats["trial_rates"],
        "timings": timings,
        "wall_s": round(sorted(walls)[len(walls) // 2], 3),
    }))


def _probe_backend(timeout_s: float = 180.0) -> None:
    """Fail fast (with a diagnosable message, NOT a bogus metric line) when
    the device backend is unreachable: a wedged TPU tunnel makes
    jax.devices() hang forever, which would otherwise hang the whole bench
    with no output. The probe runs in a subprocess so the hang is killable."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench: device backend unreachable (jax.devices() hung "
            f"{timeout_s:.0f}s - wedged TPU tunnel?); refusing to hang",
            file=sys.stderr,
        )
        raise SystemExit(2)
    except subprocess.CalledProcessError as exc:
        print(
            f"bench: device backend probe failed: {exc.stderr.decode()[-500:]}",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main() -> None:
    _probe_backend()
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu.parallel.plate import (
        PlateRunConfig,
        _build_well_program,
    )

    config_mode = os.environ.get("BENCH_CONFIG", "")
    if config_mode == "5":
        _bench_decode_inclusive(
            int(os.environ.get("BENCH_WELLS", "16")),
            int(os.environ.get("BENCH_SIZE", "2048")),
            os.environ.get("BENCH_FORMAT", "nd2"),
        )
        return
    if config_mode == "2":
        _bench_preprocessing(
            int(os.environ.get("BENCH_BATCH", "2")),
            int(os.environ.get("BENCH_SIZE", "2048")),
            int(os.environ.get("BENCH_REPS", "5")),
        )
        return
    if config_mode == "3":
        _bench_timelapse_classical(
            int(os.environ.get("BENCH_BATCH", "2")),
            int(os.environ.get("BENCH_T", "8")),
            int(os.environ.get("BENCH_SIZE", "1024")),
            int(os.environ.get("BENCH_REPS", "3")),
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
        packed, _ = out
        return float(packed.ravel()[0])

    # warmup / compile
    force(program(wells))

    def trial():
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = program(wells)
        force(out)
        return time.time() - t0

    stats = _rate_stats(trial, B * reps, _trials())
    n_chips = max(1, len([d for d in jax.devices() if d.platform != "cpu"]))
    per_chip = stats["rate"] / n_chips

    # secondary metrics first (the headline line prints LAST so single-line
    # consumers read the primary metric). Every BASELINE config runs every
    # round so regressions are visible (round-3 VERDICT item 6): config 2
    # (preprocessing), config 3 (timelapse classical), the deep-path plate
    # program at the same 2048^2 shape, then the decode-inclusive end-to-end
    # numbers from real ND2 AND LIF files on disk, prefetch-pipelined.
    def _secondary(name, fn, *args):
        if os.environ.get(f"BENCH_SKIP_{name}", "") == "1":
            return
        try:
            fn(*args)
        except Exception as e:  # noqa: BLE001 - secondary metric must not kill the run
            print(f"{name} bench skipped: {e}", file=sys.stderr)

    _secondary("PREPROC", _bench_preprocessing, 2, H, 3)
    _secondary("TIMELAPSE", _bench_timelapse_classical, 2, 8, 1024, 3)
    # full batch: per-dispatch fixed costs amortize (B=8 measured ~10%
    # faster per image than B=2 on v5e)
    _secondary("UNET", _bench_unet_plate, wells, max(2, reps // 2))
    n_dec = int(os.environ.get("BENCH_WELLS", "16"))
    _secondary("DECODE", _bench_decode_inclusive, n_dec, H, "nd2")
    _secondary("DECODE_LIF", _bench_decode_inclusive, n_dec, H, "lif")

    target_per_chip = 12.5  # >100 images/sec on 8 chips (BASELINE.md)
    result = {
        "metric": "2048x2048 4-ch preprocess+segment+measure throughput",
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / target_per_chip, 3),
        "spread": stats["spread"],
        "trials": stats["trials"],
        "trial_rates": stats["trial_rates"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
