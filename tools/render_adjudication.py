"""Render classical vs U-Net masks on the three golden ND2 fixtures for
visual adjudication (VERDICT round-2 item 4)."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from arcadia_microscopy_tools_tpu.core.microscopy import MicroscopyImage
from arcadia_microscopy_tools_tpu.models.segmentation import SegmentationModel
from arcadia_microscopy_tools_tpu.operations import (
    apply_threshold,
    rescale_by_percentile,
    subtract_background_dog,
)
from arcadia_microscopy_tools_tpu.ops.labeling import label

# (file, channel, cell_diameter_px for the U-Net path - Cellpose semantics;
# the zstack's confluent epithelial cells are ~70 px across)
FIXTURES = [
    ("example-multichannel.nd2", "BRIGHTFIELD", None),
    ("example-pbmc.nd2", "BRIGHTFIELD", None),
    ("example-cerevisiae.nd2", "DIC", None),
    ("example-timelapse.nd2", "FITC", None),
    ("example-zstack.nd2", "FITC", 70.0),
]
REPO = __import__("pathlib").Path(__file__).resolve().parent.parent
DATA = str(REPO / "tests" / "data")

model = SegmentationModel(checkpoint_path=REPO / "checkpoints" / "unet")

fig, axes = plt.subplots(len(FIXTURES), 3, figsize=(13, 4.3 * len(FIXTURES)))
for row, (name, ch, diam) in enumerate(FIXTURES):
    img = MicroscopyImage.from_nd2_path(f"{DATA}/{name}")
    inten = img.get_channel_intensities(ch)
    while inten.ndim > 2:
        inten = inten[inten.shape[0] // 2]  # middle frame / slice
    inten = np.asarray(inten)

    x = subtract_background_dog(inten, 1.0, 16.0)
    x = rescale_by_percentile(x, (0.5, 99.9))
    q = (np.asarray(x) * 65535).astype(np.uint16)
    classical = np.asarray(label(np.asarray(apply_threshold(q, "otsu"))))

    unet = np.asarray(model.segment(inten, cell_diameter_px=diam))

    lo, hi = np.percentile(inten, (1, 99.5))
    disp = np.clip((inten.astype(float) - lo) / max(hi - lo, 1), 0, 1)

    for col, (title, lbl) in enumerate(
        [
            ("raw", None),
            (f"classical ({classical.max()})", classical),
            (f"unet ({unet.max()})", unet),
        ]
    ):
        ax = axes[row][col]
        ax.imshow(disp, cmap="gray", interpolation="nearest")
        if lbl is not None and lbl.max() > 0:
            from numpy import ma

            edges = np.zeros_like(lbl, bool)
            edges[1:, :] |= lbl[1:, :] != lbl[:-1, :]
            edges[:, 1:] |= lbl[:, 1:] != lbl[:, :-1]
            edges &= lbl > 0
            overlay = ma.masked_where(~edges, np.ones_like(lbl))
            ax.imshow(overlay, cmap="autumn", alpha=0.9, interpolation="nearest")
        ax.set_title(f"{name.split('.')[0]} {ch}: {title}", fontsize=8)
        ax.axis("off")

plt.tight_layout()
plt.savefig(REPO / "docs" / "fixture_adjudication.png", dpi=110)
print("saved docs/fixture_adjudication.png")
