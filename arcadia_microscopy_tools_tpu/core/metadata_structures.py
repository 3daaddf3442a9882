"""Structured instrument metadata.

Same contracts as the reference (`src/arcadia_microscopy_tools/
metadata_structures.py:14-141`): dimension bit-flags, dimension-conditional
required fields via dataclass field metadata, and the per-channel metadata
aggregate that validates its sub-structures eagerly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Flag, auto
from typing import TYPE_CHECKING, Any

from .channels import Channel
from ..typing import Float64Array

if TYPE_CHECKING:
    from dataclasses import Field


def dimension_field(dimension: DimensionFlags, default: Any = None) -> Any:
    """Create a field that's required for a specific dimension."""
    return field(default=default, metadata={"requires_dimension": dimension})


class DimensionValidatorMixin:
    """Mixin that provides dimension-based field validation for dataclasses."""

    if TYPE_CHECKING:
        __dataclass_fields__: dict[str, Field[Any]]

    def validate(self, dimensions: DimensionFlags) -> None:
        """Validate that required fields are present for the given dimensions."""
        for field_info in self.__dataclass_fields__.values():
            required_dimension = field_info.metadata.get("requires_dimension")
            if required_dimension and (dimensions & required_dimension):
                if getattr(self, field_info.name) is None:
                    raise ValueError(
                        f"{field_info.name} is required for {required_dimension.name}"
                    )


class DimensionFlags(Flag):
    """Bit flags for what dimensions are present."""

    SPATIAL_2D = 0
    MULTICHANNEL = auto()
    Z_STACK = auto()
    TIMELAPSE = auto()
    SPECTRAL = auto()
    RGB = auto()
    MONTAGE = auto()

    @property
    def is_multichannel(self) -> bool:
        return bool(self & DimensionFlags.MULTICHANNEL)

    @property
    def is_zstack(self) -> bool:
        return bool(self & DimensionFlags.Z_STACK)

    @property
    def is_timelapse(self) -> bool:
        return bool(self & DimensionFlags.TIMELAPSE)

    @property
    def is_spectral(self) -> bool:
        return bool(self & DimensionFlags.SPECTRAL)

    @property
    def is_rgb(self) -> bool:
        return bool(self & DimensionFlags.RGB)

    @property
    def is_montage(self) -> bool:
        return bool(self & DimensionFlags.MONTAGE)


@dataclass
class NominalDimensions(DimensionValidatorMixin):
    """Nominal values for the physical dimensions of the imaging volume."""

    x_size_px: int
    y_size_px: int
    xy_step_um: float
    z_size_px: int | None = dimension_field(DimensionFlags.Z_STACK)
    z_step_um: float | None = dimension_field(DimensionFlags.Z_STACK)
    t_size_px: int | None = dimension_field(DimensionFlags.TIMELAPSE)
    t_step_ms: float | None = dimension_field(DimensionFlags.TIMELAPSE)
    w_size_px: int | None = dimension_field(DimensionFlags.SPECTRAL)
    w_step_nm: float | None = dimension_field(DimensionFlags.SPECTRAL)


@dataclass
class MeasuredDimensions(DimensionValidatorMixin):
    """Actual measured coordinate values for each dimension.

    These represent the actual values recorded during acquisition, which may
    differ from nominal spacing due to hardware, timing jitter, or intentional
    non-uniform sampling.
    """

    x_values_um: Float64Array | None = dimension_field(DimensionFlags.MONTAGE)
    y_values_um: Float64Array | None = dimension_field(DimensionFlags.MONTAGE)
    z_values_um: Float64Array | None = dimension_field(DimensionFlags.Z_STACK)
    t_values_ms: Float64Array | None = dimension_field(DimensionFlags.TIMELAPSE)
    w_values_nm: Float64Array | None = dimension_field(DimensionFlags.SPECTRAL)


@dataclass
class AcquisitionSettings(DimensionValidatorMixin):
    """Acquisition parameters for image capture."""

    exposure_time_s: float | None = None
    zoom: float | None = None
    binning: str | None = None
    pixel_dwell_time_us: float | None = None
    line_scan_speed_hz: float | None = None
    line_averaging: int | None = None
    line_accumulation: int | None = None
    frame_averaging: int | None = None
    frame_accumulation: int | None = None


@dataclass
class MicroscopeConfig:
    """Microscope optical configuration and settings."""

    magnification: int
    numerical_aperture: float
    objective: str | None = None
    light_source: str | None = None
    power_mw: float | None = None


@dataclass
class ChannelMetadata:
    """Metadata for a microscopy channel."""

    channel: Channel
    timestamp: datetime
    dimensions: DimensionFlags
    resolution: NominalDimensions
    measured: MeasuredDimensions
    acquisition: AcquisitionSettings
    optics: MicroscopeConfig

    def __post_init__(self) -> None:
        """Validate all sub-components against dimension flags."""
        self.resolution.validate(self.dimensions)
        self.measured.validate(self.dimensions)
