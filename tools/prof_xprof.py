"""Capture an xprof trace of the production S2D forward and print per-op
device time, aggregated by HLO op name.

The prefix-difference profiler (tools/prof_fwd_prefix.py) attributes cost
per LEVEL but returning intermediates perturbs late-stage fusion; this tool
reads the real per-op device timeline instead. Parses the xplane protobuf
directly (tensorflow.tsl.profiler.protobuf.xplane_pb2 ships in the image);
no tensorboard server involved. Not part of the test suite.

Usage: python tools/prof_xprof.py [program]
  program: fwd (default) | tail | plate
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict
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
TRACE_DIR = os.environ.get("PROF_TRACE_DIR", "/tmp/amt_xprof")


def build_program(which: str):
    from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params

    ckpt = REPO / "checkpoints" / "unet"
    params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()
    rng = np.random.default_rng(0)

    if which == "fwd":
        from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params

        sp = s2d_params(params, gray_input=True)
        x = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))
        return jax.jit(lambda xx: apply_unet_s2d(sp, xx)), (x,)

    if which == "plate":
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            _build_well_program,
        )

        config = PlateRunConfig(
            method="unet", max_cells=1024, min_size=20, niter=200,
            flow_threshold=0.4,
        )
        well_fn = _build_well_program(config, n_channels=4, unet_params=params)
        base = rng.normal(150, 15, (B, 4, H, W)).clip(0, None)
        yy, xx = np.mgrid[0:48, 0:48]
        blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
        for b in range(B):
            for _ in range(300):
                cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
                base[b, :, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
        wells = jnp.asarray(base.astype(np.uint16))
        return jax.jit(jax.vmap(well_fn)), (wells,)

    raise SystemExit(f"unknown program {which!r}")


def collect(trace_dir: str):
    """Aggregate device-plane XEvent durations by event name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no xplane files under {trace_dir}")
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    plane_names = []
    for f in files[-1:]:
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(f, "rb").read())
        for plane in space.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                # XLA Ops line carries per-HLO events; step lines etc. skipped
                if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                    pass
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e9  # ms
                    counts[name] += 1
    return totals, counts, plane_names


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    fn, args = build_program(which)
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        wall = (time.time() - t0) * 1000
    print(f"wall: {wall:.1f} ms for B={B}")

    totals, counts, planes = collect(TRACE_DIR)
    if not totals:
        print("planes seen:", planes)
        raise SystemExit("no XLA Ops events found (device tracing unsupported?)")
    total = sum(totals.values())
    print(f"device total: {total:.2f} ms ({total / B:.2f} ms/img)")

    def category(name: str) -> str:
        head = name.split(" = ", 1)[0].lstrip("%")
        base = head.split(".")[0].rstrip("0123456789")
        if base in ("copy", "reshape", "transpose", "bitcast", "pad", "slice",
                    "concatenate", "copy-done", "copy-start"):
            return f"layout:{base}"
        if "convolution" in name and "fusion" not in base:
            return "conv"
        if base == "fusion" or base.endswith("fusion"):
            # classify fusions by their payload where the name hints at it
            if "convolution" in name:
                return "fusion:conv"
            return f"fusion:{base}" if base != "fusion" else "fusion"
        if base in ("sort", "scatter", "gather", "while", "dynamic-slice",
                    "dynamic-update-slice", "reduce", "custom-call",
                    "all-reduce", "select-and-scatter", "rng"):
            return base
        return f"other:{base}"

    cats: dict[str, float] = defaultdict(float)
    cat_counts: dict[str, int] = defaultdict(int)
    for name, ms in totals.items():
        cats[category(name)] += ms
        cat_counts[category(name)] += counts[name]
    print(f"\n{'category':28s} {'ms/img':>8s} {'n':>6s} {'%':>5s}")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{c:28s} {ms / B:8.3f} {cat_counts[c]:6d} {100 * ms / total:5.1f}")

    topn = int(os.environ.get("PROF_TOPN", "48"))
    print(f"\n{'op':68s} {'ms/img':>8s} {'n':>5s} {'%':>5s}")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"{name[:68]:68s} {ms / B:8.3f} {counts[name]:5d} {100 * ms / total:5.1f}")


if __name__ == "__main__":
    main()
