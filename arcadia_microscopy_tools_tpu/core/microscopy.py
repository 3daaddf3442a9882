"""Core image data model.

`MicroscopyImage` keeps the exact API and validation semantics of the
reference (`src/arcadia_microscopy_tools/microscopy.py:17-308`): an intensity
array whose shape must equal ``tuple(metadata.instrument.sizes.values())``,
a uint16 dtype contract enforced by a `MetadataWarning`, name-based channel
extraction, and a pipeline bridge.

TPU-native additions: intensities may live on host (NumPy) or device (JAX);
``device_intensities()`` moves them to HBM once and caches the result so that
repeated channel extraction / pipeline application never re-crosses the
host->device boundary.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from functools import cached_property
from pathlib import Path
from typing import Any

import numpy as np

from ..exceptions import MetadataWarning
from ..typing import AnyArray, ScalarArray, UInt16Array
from .channels import Channel
from .metadata_structures import ChannelMetadata, DimensionFlags


@dataclass
class InstrumentMetadata:
    """Instrument metadata for a microscopy image.

    Contains metadata for all channels in the image.

    Attributes:
        sizes: Mapping of dimensions to sizes (e.g., {'T': 100, 'C': 2, 'Y': 512, 'X': 512}).
        channel_metadata_list: List of ChannelMetadata objects for each channel in the image.
        channel_axis: Axis index for the channel dimension, or None if single channel.
        dimensions: Dimension flags indicating which dimensions are present in the image.
    """

    sizes: dict[str, int]
    channel_metadata_list: list[ChannelMetadata]

    def __post_init__(self) -> None:
        """Validate consistency between sizes and channel_metadata_list."""
        for key in ("X", "Y"):
            if key not in self.sizes:
                raise ValueError(
                    f"sizes must contain '{key}' dimension, got keys: {list(self.sizes.keys())}"
                )

        expected_num_channels = self.sizes.get("C", 1)
        actual_num_channels = len(self.channel_metadata_list)
        if actual_num_channels != expected_num_channels:
            raise ValueError(
                f"Number of channel metadata entries ({actual_num_channels}) does not match "
                f"the channel dimension size ({expected_num_channels}) in sizes"
            )

    @property
    def channel_axis(self) -> int | None:
        """Get the axis index for the channel dimension, or None if single channel."""
        if "C" in self.sizes:
            return list(self.sizes.keys()).index("C")
        return None

    @cached_property
    def dimensions(self) -> DimensionFlags:
        """Derive dimension flags by combining from all channels."""
        _dimensions = DimensionFlags(0)
        for channel_metadata in self.channel_metadata_list:
            _dimensions |= channel_metadata.dimensions

        # Add MULTICHANNEL flag if there are multiple channels
        if len(self.channel_metadata_list) > 1:
            _dimensions |= DimensionFlags.MULTICHANNEL

        return _dimensions


@dataclass
class Metadata:
    """Combined metadata for a microscopy image of a sample.

    Contains both sample-specific metadata and instrument acquisition metadata.

    Attributes:
        instrument: Instrument acquisition metadata including dimensions and
            channel information.
        sample: Optional dictionary containing sample-specific metadata.
    """

    instrument: InstrumentMetadata
    sample: dict[str, Any] | None = None

    def __repr__(self) -> str:
        """Return a concise string representation of the metadata."""
        channels = [cm.channel.name for cm in self.instrument.channel_metadata_list]
        sample_str = f", sample={self.sample}" if self.sample else ""
        return f"<Metadata sizes={self.instrument.sizes}, channels={channels}{sample_str}>"


@dataclass
class MicroscopyImage:
    """Dataclass for microscopy image data.

    Contains both the image intensity data and associated metadata for all
    channels. Provides methods to access specific channel data.

    Attributes:
        intensities: Array containing the image intensity data. Shape depends on
            acquisition type (e.g., (Y, X) for 2D, (T, Y, X) for time-lapse,
            (T, C, Y, X) for multi-channel time-lapse). Host (NumPy) or device
            (JAX) resident.
        metadata: Combined metadata containing image acquisition metadata and
            optional sample-specific metadata.
    """

    intensities: UInt16Array
    metadata: Metadata

    def __post_init__(self) -> None:
        """Validate consistency between intensities array and metadata."""
        expected_shape = tuple(self.metadata.instrument.sizes.values())
        if tuple(self.intensities.shape) != expected_shape:
            raise ValueError(
                f"Intensities shape {tuple(self.intensities.shape)} does not match "
                f"metadata sizes {self.metadata.instrument.sizes} "
                f"(expected shape {expected_shape})"
            )

        if self.intensities.dtype != np.uint16:
            warnings.warn(
                f"Expected uint16 intensities, got {self.intensities.dtype}. "
                f"Some operations may behave unexpectedly.",
                MetadataWarning,
                stacklevel=2,
            )

    def __repr__(self) -> str:
        """Return a concise string representation of the microscopy image."""
        dtype_str = f"dtype={self.intensities.dtype}"

        flat = np.asarray(self.intensities).ravel()
        total = flat.size
        if total <= 10:
            intensity_str = f"intensities={flat.tolist()}"
        else:
            first_vals = flat[:3].tolist()
            last_vals = flat[-3:].tolist()
            intensity_str = (
                f"intensities=[{', '.join(map(str, first_vals))}, ..., "
                f"{', '.join(map(str, last_vals))}]"
            )

        sizes_str = f"sizes={self.sizes}"
        channels_str = f"channels={[channel.name for channel in self.channels]}"
        info = f"{sizes_str}, {channels_str}, {intensity_str}, {dtype_str}"

        return f"<MicroscopyImage {info}>"

    @classmethod
    def from_nd2_path(
        cls,
        nd2_path: Path,
        channels: list[Channel] | None = None,
        sample_metadata: dict[str, Any] | None = None,
    ) -> MicroscopyImage:
        """Create MicroscopyImage from a Nikon ND2 file.

        Args:
            nd2_path: Path to the Nikon ND2 file.
            channels: Optional list of Channel objects to override automatic
                channel detection. If not provided, channels are inferred from
                the ND2 file's optical configuration.
            sample_metadata: Optional dictionary containing sample-specific metadata.

        Returns:
            MicroscopyImage: A new microscopy image with intensity data and metadata.
        """
        from ..io.nikon import load_nd2

        intensities, instrument_metadata = load_nd2(nd2_path, channels)
        metadata = Metadata(instrument_metadata, sample_metadata)
        return cls(intensities, metadata)

    @classmethod
    def from_lif_path(
        cls,
        lif_path: Path,
        image_name: str,
        channels: list[Channel] | None = None,
        sample_metadata: dict[str, Any] | None = None,
    ) -> MicroscopyImage:
        """Create MicroscopyImage from a Leica LIF file.

        Args:
            lif_path: Path to the Leica LIF file.
            image_name: Name of the image within the LIF file to load.
            channels: Optional list of Channel objects to override automatic
                channel detection. If not provided, channels are inferred from
                the LIF file metadata.
            sample_metadata: Optional dictionary containing sample-specific metadata.

        Returns:
            MicroscopyImage: A new microscopy image with intensity data and metadata.
        """
        from ..io.leica import load_lif_image

        intensities, instrument_metadata = load_lif_image(lif_path, image_name, channels)
        metadata = Metadata(instrument_metadata, sample_metadata)
        return cls(intensities, metadata)

    @property
    def shape(self) -> tuple[int, ...]:
        """Get the shape of the intensity array."""
        return tuple(self.intensities.shape)

    @property
    def sizes(self) -> dict[str, int]:
        """Get the dimension sizes dictionary (e.g., {'T': 100, 'C': 2, 'Y': 512, 'X': 512})."""
        return self.metadata.instrument.sizes

    @property
    def dimensions(self) -> DimensionFlags:
        """Get the dimension flags indicating which dimensions are present."""
        return self.metadata.instrument.dimensions

    @property
    def channels(self) -> list[Channel]:
        """Get the list of channels in this image."""
        return [
            channel_metadata.channel
            for channel_metadata in self.metadata.instrument.channel_metadata_list
        ]

    @property
    def channel_axis(self) -> int | None:
        """Get the axis index for the channel dimension, or None if single channel."""
        return self.metadata.instrument.channel_axis

    @property
    def num_channels(self) -> int:
        """Get the number of channels in this image."""
        return len(self.metadata.instrument.channel_metadata_list)

    def device_intensities(self) -> AnyArray:
        """Move the intensity array to the default JAX device (HBM) and cache it.

        Repeated calls return the same device buffer; channel extraction and
        pipelines built on top of it stay on device.
        """
        cached = self.__dict__.get("_device_intensities")
        if cached is None:
            import jax

            cached = jax.device_put(np.asarray(self.intensities))
            self.__dict__["_device_intensities"] = cached
        return cached

    @staticmethod
    def _resolve_channel_name(channel: str | Channel) -> str:
        return channel if isinstance(channel, str) else channel.name

    def get_channel_intensities(
        self, channel: str | Channel, *, device: bool = False
    ) -> UInt16Array:
        """Extract intensity data for a specific channel.

        Returns all data for the requested channel, preserving temporal and
        spatial dimensions (e.g., time-lapse or Z-stack).

        Args:
            channel: The channel to extract, as a Channel object or a channel
                name string.
            device: If True, slice the cached device-resident copy so the
                result stays in HBM.

        Returns:
            Intensity array for the specified channel. Shape depends on acquisition:
            - 2D single frame: (Y, X)
            - Time-lapse: (T, Y, X)
            - Z-stack: (Z, Y, X)
            - Multi-channel 2D: (Y, X)
            - Multi-channel time-lapse/Z-stack: (T, Y, X) or (Z, Y, X)

        Raises:
            ValueError: If the specified channel is not in this image or no
                metadata is available.
        """
        name = self._resolve_channel_name(channel)
        channel_names = [ch.name for ch in self.channels]
        if name not in channel_names:
            raise ValueError(
                f"Channel '{name}' not found in image. Available channels: "
                f"{[ch.name for ch in self.channels]}"
            )

        source = self.device_intensities() if device else self.intensities

        # Single channel - return all data (may include T or Z dimensions)
        if self.num_channels == 1:
            return source

        # Multi-channel - extract the specific channel using channel_axis
        channel_index = channel_names.index(name)
        if self.channel_axis is None:
            raise ValueError("Channel axis not found in metadata")

        # Build slice tuple to extract the channel
        slices: list[slice | int] = [slice(None)] * len(source.shape)
        slices[self.channel_axis] = channel_index

        return source[tuple(slices)]

    def apply_pipeline(
        self,
        pipeline,
        channel: str | Channel,
    ) -> ScalarArray:
        """Apply a processing pipeline to intensity data from a specific channel.

        Extracts the intensity data for the specified channel and processes it
        through the provided pipeline (a single fused, jitted device program).

        Args:
            pipeline: The processing pipeline to apply.
            channel: The channel whose intensity data should be processed,
                as a Channel object or a channel name string.

        Returns:
            Processed intensity data. The shape and dtype depend on
            the specific transformations in the pipeline.

        Raises:
            ValueError: If the specified channel is not found in this image or
                if no image metadata is available.
        """
        intensities = self.get_channel_intensities(channel)
        return pipeline(intensities)
