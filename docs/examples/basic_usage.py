# %% [markdown]
# # Basic usage
# Loading microscopy images with full instrument metadata and running fused
# preprocessing pipelines. (Executable twin of the reference's
# basic_usage.ipynb, docs/examples/.)

# %%
import sys
from pathlib import Path

# allow running straight from a checkout without installing the package
_repo_root = Path(__file__).resolve().parents[2]
if str(_repo_root) not in sys.path:
    sys.path.insert(0, str(_repo_root))

from pathlib import Path

import numpy as np

from arcadia_microscopy_tools_tpu import (
    ImageOperation,
    MicroscopyImage,
    Pipeline,
)
from arcadia_microscopy_tools_tpu.operations import (
    apply_threshold,
    crop_to_center,
    rescale_by_percentile,
    subtract_background_dog,
)

DATA = Path(__file__).parents[2] / "tests" / "data"

# %% Load a Nikon ND2 file: intensities + parsed metadata in one pass
image = MicroscopyImage.from_nd2_path(DATA / "example-multichannel.nd2")
print(image)
print("sizes:", image.sizes)
print("channels:", [c.name for c in image.channels])
print("dimensions:", image.dimensions)

# %% Inspect per-channel instrument metadata
cm = image.metadata.instrument.channel_metadata_list[1]  # DAPI
print("xy step [um]:", cm.resolution.xy_step_um)
print("objective:", cm.optics.objective, cm.optics.magnification, "x")
print("exposure [s]:", cm.acquisition.exposure_time_s)

# %% Extract one channel and build a fused pipeline
dapi = image.get_channel_intensities("DAPI")

pipeline = Pipeline(
    [
        ImageOperation(subtract_background_dog, 1.0, 16.0),
        ImageOperation(rescale_by_percentile, (0.5, 99.5)),
        ImageOperation(crop_to_center, (192, 192)),
    ]
)
processed = image.apply_pipeline(pipeline, "DAPI")
print("processed:", processed.shape, processed.dtype, processed.min(), processed.max())

# %% Thresholding - ten methods, all running on device histograms
for method in ("otsu", "li", "triangle", "mean"):
    mask = apply_threshold(np.asarray(dapi), method)
    print(f"{method:10s} -> {mask.sum()} foreground px")

# %% Timelapse data keeps its T axis; parallel pipelines vmap over it
timelapse = MicroscopyImage.from_nd2_path(DATA / "example-timelapse.nd2")
stack_pipe = Pipeline([ImageOperation(rescale_by_percentile, (1, 99))], parallel=True)
normalized = timelapse.apply_pipeline(stack_pipe, timelapse.channels[0])
print("per-frame normalized:", normalized.shape)
