"""Model facade (reference module parity:
`src/arcadia_microscopy_tools/model.py`)."""

from .models.segmentation import (
    SegmentationModel,
    SegmentationParams,
    find_best_available_device,
)

import logging

# Module logger, same name contract as the reference's `model.logger`
# (src/arcadia_microscopy_tools/model.py announces device + model load on it)
logger = logging.getLogger(__name__)

# Name kept for drop-in compatibility with reference call sites
CellposeParams = SegmentationParams

__all__ = ["SegmentationModel", "SegmentationParams", "find_best_available_device"]
