# %% [markdown]
# # HCS plate pipeline
# The flagship path: a whole microplate of ND2 wells decoded on the host,
# segmented and quantified on the TPU as one sharded program per well batch,
# with per-well failure isolation and checkpoint/resume. This is the
# framework's answer to BASELINE config 5 (decode -> preprocess -> segment ->
# per-cell morphology + fluorescence quantification).

# %%
import sys
import tempfile
from pathlib import Path

# allow running straight from a checkout without installing the package
_repo_root = Path(__file__).resolve().parents[2]
if str(_repo_root) not in sys.path:
    sys.path.insert(0, str(_repo_root))
_tests = _repo_root / "tests"
if str(_tests) not in sys.path:
    sys.path.insert(0, str(_tests))

import numpy as np

from arcadia_microscopy_tools_tpu.core.channels import CY5, DAPI, FITC, TRITC
from arcadia_microscopy_tools_tpu.core.microplate import MicroplateLayout, Well
from arcadia_microscopy_tools_tpu.io.nikon import load_nd2
from arcadia_microscopy_tools_tpu.parallel.plate import PlateRunConfig, PlateRunner

# %% [markdown]
# ## Synthesize a small plate of ND2 files
# Real runs point `image_source` at a directory of instrument files; here we
# write spec-conformant ND2 containers with the test suite's builder so the
# example is runnable from a bare checkout. Each well gets a 4-channel
# 512x512 frame with ~40 cells.

# %%
from nd2_builder import write_nd2

plate_dir = Path(tempfile.mkdtemp(prefix="amt_plate_"))
rng = np.random.default_rng(0)
well_ids = [f"{row}{col:02d}" for row in "AB" for col in (1, 2, 3)]

for well_id in well_ids:
    base = rng.normal(150, 15, (4, 512, 512)).clip(0, None)
    yy, xx = np.mgrid[0:48, 0:48]
    blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
    for _ in range(40):
        cy, cx = rng.integers(24, 488), rng.integers(24, 488)
        base[0, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
        for ch in range(1, 4):
            base[ch, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob * rng.uniform(0.2, 1)
    write_nd2(
        plate_dir / f"{well_id}.nd2",
        base.astype(np.uint16),
        channel_names=["DAPI", "FITC", "TRITC", "CY5"],
    )
print(f"{len(well_ids)} wells written to {plate_dir}")

# %% [markdown]
# ## Run the plate
# `image_source` is any `well_id -> (C, H, W) uint16` mapping or callable;
# decode runs on a prefetch worker pool so it overlaps device compute. The
# checkpoint directory makes the run resumable: re-running skips wells whose
# tables are already on disk.

# %%
layout = MicroplateLayout([Well(id=w) for w in well_ids])
channels = [DAPI, FITC, TRITC, CY5]


def source(well_id: str) -> np.ndarray:
    pixels, _meta = load_nd2(plate_dir / f"{well_id}.nd2")
    return pixels

checkpoint_dir = plate_dir / "results"
runner = PlateRunner(
    PlateRunConfig(max_cells=256, min_size=20, batch_size=2),
    checkpoint_dir=checkpoint_dir,
)
results = runner.run(layout, source, channels=channels)
print("failed wells:", results.failed_wells)
print("timings:", {k: round(v, 2) for k, v in results.timings.items()})

# %% Per-well summary and the combined per-cell table
print(results.summary().to_string(index=False))
table = results.to_dataframe()
print(table.columns.tolist())
table.head(8)

# %% [markdown]
# ## Resume
# A second run against the same checkpoint directory loads every completed
# well from disk - the device is never touched for finished work.

# %%
resumed = PlateRunner(
    PlateRunConfig(max_cells=256, min_size=20, batch_size=2),
    checkpoint_dir=checkpoint_dir,
).run(layout, source, channels=channels)
print("resumed run device seconds:", round(resumed.timings["device_s"], 4))
print("tables intact:", all(len(t) > 0 for t in resumed.tables.values()))

# %% [markdown]
# ## Reading the measurements
# Each row is one cell: morphology (area, perimeter, eccentricity, axes,
# orientation, extent, circularity, prolate-spheroid volume) plus per-channel
# intensity statistics suffixed with the channel name
# (`intensity_mean_dapi`, ...). Dense wells that exceed the static
# capacities are re-dispatched automatically with larger ones; wells that
# fail decode or never converge are reported in `failed_wells` instead of
# crashing the run.

# %%
by_well = table.groupby("well_id")["area"].agg(["count", "mean"])
print(by_well.to_string())
