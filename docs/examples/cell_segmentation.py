# %% [markdown]
# # Cell segmentation
# Classical (threshold -> connected components) and deep (U-Net + flow
# tracking) segmentation with per-cell measurements. (Executable twin of the
# reference's cell_segmentation.ipynb.)

# %%
import sys
from pathlib import Path

# allow running straight from a checkout without installing the package
_repo_root = Path(__file__).resolve().parents[2]
if str(_repo_root) not in sys.path:
    sys.path.insert(0, str(_repo_root))

import numpy as np

from arcadia_microscopy_tools_tpu.masks import SegmentationMask
from arcadia_microscopy_tools_tpu.model import SegmentationModel
from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells
from arcadia_microscopy_tools_tpu.operations import apply_threshold, rescale_by_percentile

rng = np.random.default_rng(0)
image, ground_truth = synthesize_cells(rng, (256, 256), n_cells=30)
intensities = (image * 65535).astype(np.uint16)

# %% Classical path: normalize -> Otsu -> SegmentationMask
normalized = rescale_by_percentile(intensities, (1, 99))
binary = np.asarray(apply_threshold((np.asarray(normalized) * 65535).astype(np.uint16)))
mask = SegmentationMask(
    mask_image=binary,
    intensity_image_dict={},
    remove_edge_cells=True,
)
print("cells:", mask.num_cells)
props = mask.cell_properties
print("mean area:", props["area"].mean().round(1))
print("mean circularity:", props["circularity"].mean().round(3))

# %% Filter small objects and convert to microns
filtered = mask.filter("area", min_value=60)
um = filtered.convert_properties_to_microns(pixel_size_um=0.325)
print("areas [um^2]:", um["area_um2"][:5].round(2))

# %% Deep path: the from-scratch U-Net with flow-tracking reconstruction
model = SegmentationModel(checkpoint_path="checkpoints/unet")
labels = model.segment(image.astype(np.float64))
print("U-Net cells:", labels.max())

# %% Batch segmentation with failure isolation
batch = [image.astype(np.float64) for _ in range(3)]
masks = model.batch_segment(batch, show_progress=False)
print("batch results:", [m.max() if m is not None else None for m in masks])
