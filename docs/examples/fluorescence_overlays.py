# %% [markdown]
# # Fluorescence overlays
# Compositing multichannel fluorescence onto brightfield backgrounds with
# alpha and additive blending. (Executable twin of the reference's
# fluorescence_overlays.ipynb.)

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
    BlendMode,
    Layer,
    MicroscopyImage,
    create_overlay,
    overlay_channels,
)
from arcadia_microscopy_tools_tpu.operations import rescale_by_percentile

DATA = Path(__file__).parents[2] / "tests" / "data"
image = MicroscopyImage.from_nd2_path(DATA / "example-multichannel.nd2")

# %% Normalize each channel to [0, 1]
norm = {
    ch: np.asarray(rescale_by_percentile(image.get_channel_intensities(ch), (1, 99.5)))
    for ch in image.channels
}
brightfield = norm[image.channels[0]]

# %% Simple uniform overlay: all fluorescence channels, additive blending
overlay = overlay_channels(
    background=brightfield,
    channel_intensities={ch: norm[ch] for ch in image.channels[1:]},
    blend_mode=BlendMode.ADDITIVE,
)
print("overlay:", overlay.shape, overlay.dtype, overlay.max())

# %% Per-layer control: opacity and blend mode per channel
layers = [
    Layer(image.channels[1], norm[image.channels[1]], opacity=0.9),
    Layer(image.channels[2], norm[image.channels[2]], opacity=0.7,
          blend_mode=BlendMode.ADDITIVE),
    Layer(image.channels[3], norm[image.channels[3]], opacity=0.5,
          zero_transparent=False),
]
composite = create_overlay(brightfield, layers)
print("composite:", composite.shape)

# %% Save a PNG for inspection (optional)
try:
    from PIL import Image as PILImage

    PILImage.fromarray((composite * 255).astype(np.uint8)).save("/tmp/overlay.png")
    print("wrote /tmp/overlay.png")
except ImportError:
    pass
