"""Model facade (reference module parity:
`src/arcadia_microscopy_tools/model.py`)."""

from .models.segmentation import (
    SegmentationModel,
    SegmentationParams,
    find_best_available_device,
)

# Name kept for drop-in compatibility with reference call sites
CellposeParams = SegmentationParams

__all__ = ["SegmentationModel", "SegmentationParams", "find_best_available_device"]
