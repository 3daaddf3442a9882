"""arcadia_microscopy_tools_tpu: a TPU-native quantitative-microscopy framework.

From-scratch JAX/XLA/Pallas rebuild of Arcadia-Science/arcadia-microscopy-tools
(reference v0.4.1). The public facade re-exports the same ten names as the
reference (`src/arcadia_microscopy_tools/__init__.py:9-20`); deeper modules
(`model`, `masks`, `microplate`, `io.nikon`, `io.leica`, `operations`) mirror
the reference's submodule layout so existing imports keep working.

Execution model: host Python handles I/O, metadata, and orchestration; all
per-image compute - normalization, filtering, thresholding, morphology,
connected components, per-cell measurement, U-Net segmentation - runs as
fused jitted kernels over HBM-resident batches, sharded across TPU meshes via
pjit/shard_map (see `parallel/`).
"""

from .core.channels import Channel
from .core.microscopy import MicroscopyImage
from .exceptions import MetadataWarning, SegmentationWarning
from .ops.pipeline import ImageOperation, Pipeline
from .viz.blending import BlendMode, Layer, create_overlay, overlay_channels

__version__ = "0.4.0"

__all__ = [
    "BlendMode",
    "Channel",
    "Layer",
    "MetadataWarning",
    "MicroscopyImage",
    "ImageOperation",
    "Pipeline",
    "SegmentationWarning",
    "create_overlay",
    "overlay_channels",
]
