"""Metadata structures facade (reference module parity:
`src/arcadia_microscopy_tools/metadata_structures.py`)."""

from .core.metadata_structures import (
    AcquisitionSettings,
    ChannelMetadata,
    DimensionFlags,
    MeasuredDimensions,
    MicroscopeConfig,
    NominalDimensions,
)

__all__ = [
    "AcquisitionSettings", "ChannelMetadata", "DimensionFlags",
    "MeasuredDimensions", "MicroscopeConfig", "NominalDimensions",
]
