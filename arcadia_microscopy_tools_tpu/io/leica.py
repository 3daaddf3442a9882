"""Leica LIF ingest: image listing, loading, CRS physics, metadata parser.

Behavioral twin of the reference's Leica layer
(`src/arcadia_microscopy_tools/leica.py:39-898`), built on the from-scratch
`io.lif` reader instead of the `liffile` package, with plain dataclasses in
place of pydantic models. All parser quirks are preserved: SI unit
conversion, CRS Raman/anti-Stokes math with the 1031.7 nm Stokes constant,
the laser-state channel-inference engine (single UV/WLL laser ->
Channel.from_wavelength; otherwise detector-name/beam-route mapping with CRS
modalities getting computed wavelengths and ambiguity warnings), dimension
flags including spectral lambda/Lambda and mosaic M, the Apollo-11 placeholder
timestamp, xy>1% mismatch warning, montage tile mean-centering with Z-stack
priority, the two Lambda-scan reconstruction paths, and the exposure formula
dwell * X * Y * averaging * accumulation.
"""

from __future__ import annotations

import warnings
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from datetime import datetime
from enum import Enum
from pathlib import Path
from typing import Any, Literal

import numpy as np

from ..core.channels import BRIGHTFIELD, E_CARS, E_SHG, F_CARS, F_SHG, SRS, Channel
from ..core.metadata_structures import (
    AcquisitionSettings,
    ChannelMetadata,
    DimensionFlags,
    MeasuredDimensions,
    MicroscopeConfig,
    NominalDimensions,
)
from ..core.microscopy import InstrumentMetadata
from ..exceptions import MetadataWarning
from ..typing import Float64Array, UInt16Array
from . import lif as liffile

_SI_UNITS: dict[str, float] = {
    "m": 1,
    "mm": 1e-3,
    "um": 1e-6,
    "nm": 1e-9,
    "s": 1,
    "ms": 1e-3,
    "us": 1e-6,
}

CRS_STOKES_WAVELENGTH_NM: float = 1031.7


def list_image_names(lif_path: Path) -> list[str]:
    """List all image names contained in a LIF file."""
    with liffile.LifFile(lif_path) as f:
        return [image.name for image in f.images]


def load_lif_image(
    lif_path: Path,
    image_name: str,
    channels: list[Channel] | None = None,
) -> tuple[UInt16Array, InstrumentMetadata]:
    """Load intensity data and metadata from a Leica LIF file in a single pass.

    Args:
        lif_path: Path to the Leica LIF file.
        image_name: Name of the specific image within the LIF file to extract.
        channels: Optional list of Channel objects to override automatic
            channel detection.

    Returns:
        Tuple of (intensities, instrument_metadata).

    Raises:
        ValueError: If the specified image is not found in the LIF file.
    """
    parser = _LeicaMetadataParser(lif_path, image_name, channels)
    with liffile.LifFile(lif_path) as lif:
        available_names = [img.name for img in lif.images]
        if image_name not in available_names:
            raise ValueError(
                f"Image {image_name} not found in {lif_path}. Available images: {available_names}"
            )
        intensities = lif.images[image_name].asarray()
        instrument_metadata = parser.parse(lif)
    return intensities, instrument_metadata


def calculate_raman_shift(
    pump_wavelength_nm: float | Float64Array,
    stokes_wavelength_nm: float | Float64Array = CRS_STOKES_WAVELENGTH_NM,
) -> float | Float64Array:
    """Raman shift in wavenumbers (cm^-1) from pump and Stokes wavelengths:
    (1/lambda_p - 1/lambda_s) * 1e7."""
    return (1 / pump_wavelength_nm - 1 / stokes_wavelength_nm) * 1e7


def calculate_antistokes_wavelength(
    pump_wavelength_nm: float | Float64Array,
    stokes_wavelength_nm: float | Float64Array = CRS_STOKES_WAVELENGTH_NM,
) -> float | Float64Array:
    """Anti-Stokes wavelength in nm: 1 / (2/lambda_p - 1/lambda_s)."""
    return 1 / (2 / pump_wavelength_nm - 1 / stokes_wavelength_nm)


def _convert_units(value: float, from_unit: str, to_unit: str) -> float:
    if from_unit not in _SI_UNITS:
        raise ValueError(f"Unknown unit {from_unit!r}")
    if to_unit not in _SI_UNITS:
        raise ValueError(f"Unknown unit {to_unit!r}")
    return value * _SI_UNITS[from_unit] / _SI_UNITS[to_unit]


def _get_required_attr(element: ET.Element, name: str) -> str:
    """Get a required attribute from an XML element."""
    value = element.get(name)
    if value is None:
        raise ValueError(f"Missing attribute {name!r} on <{element.tag}>")
    return value


@dataclass(frozen=True)
class _LifChannel:
    """Channel description from the ImageDescription XML."""

    data_type: int
    channel_tag: int
    resolution: int
    lut_name: str
    bytes_inc: int
    bit_inc: int
    min_value: float
    max_value: float
    unit: str
    name_of_measured_quantity: str
    properties: dict[str, str]

    @classmethod
    def from_xml(cls, element: ET.Element) -> "_LifChannel":
        props: dict[str, str] = {}
        for prop in element.findall("ChannelProperty"):
            key_element = prop.find("Key")
            value_element = prop.find("Value")
            if key_element is None or value_element is None or key_element.text is None:
                continue
            props[key_element.text] = value_element.text or ""

        return cls(
            data_type=int(_get_required_attr(element, "DataType")),
            channel_tag=int(_get_required_attr(element, "ChannelTag")),
            resolution=int(_get_required_attr(element, "Resolution")),
            lut_name=_get_required_attr(element, "LUTName"),
            bytes_inc=int(_get_required_attr(element, "BytesInc")),
            bit_inc=int(_get_required_attr(element, "BitInc")),
            min_value=float(_get_required_attr(element, "Min")),
            max_value=float(_get_required_attr(element, "Max")),
            unit=element.get("Unit", ""),
            name_of_measured_quantity=element.get("NameOfMeasuredQuantity", ""),
            properties=props,
        )


@dataclass(frozen=True)
class _LifDimension:
    """Dimension description from the ImageDescription XML."""

    dim_id: int
    number_of_elements: int
    origin: float
    length: float
    unit: str
    bit_inc: int
    bytes_inc: int

    @property
    def step(self) -> float:
        """Step size for this dimension."""
        return self.length / self.number_of_elements

    @classmethod
    def from_xml(cls, element: ET.Element) -> "_LifDimension":
        return cls(
            dim_id=int(_get_required_attr(element, "DimID")),
            number_of_elements=int(_get_required_attr(element, "NumberOfElements")),
            origin=float(_get_required_attr(element, "Origin")),
            length=float(_get_required_attr(element, "Length")),
            unit=_get_required_attr(element, "Unit"),
            bit_inc=int(_get_required_attr(element, "BitInc")),
            bytes_inc=int(_get_required_attr(element, "BytesInc")),
        )


@dataclass(frozen=True)
class _ImageDescription:
    lif_channels: list[_LifChannel]
    lif_dimensions: list[_LifDimension]


class _PowerState(str, Enum):
    ON = "On"
    OFF = "Off"


class _LightSourceType(int, Enum):
    DIODE = 1
    WLL = 4
    CRS = 6


@dataclass(frozen=True)
class _LaserState:
    """State of a single laser (extra XML attributes ignored)."""

    LightSourceType: _LightSourceType
    LightSourceName: str
    WavelengthDouble: float
    PowerState: _PowerState

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "_LaserState":
        return cls(
            LightSourceType=_LightSourceType(int(data["LightSourceType"])),
            LightSourceName=str(data.get("LightSourceName", "")),
            WavelengthDouble=float(data.get("WavelengthDouble", 0.0)),
            PowerState=_PowerState(str(data["PowerState"])),
        )


class _LaserSystemState:
    """Collection of laser states for the entire laser system."""

    def __init__(self, lasers: list[_LaserState]) -> None:
        self.lasers = lasers

    @property
    def active_lasers(self) -> list[_LightSourceType]:
        return [
            laser.LightSourceType for laser in self.lasers if laser.PowerState == _PowerState.ON
        ]

    def get_laser_by_type(self, laser_type: _LightSourceType) -> _LaserState:
        laser = next((laser for laser in self.lasers if laser.LightSourceType == laser_type), None)
        if laser is None:
            raise ValueError(f"No laser of type {laser_type!r} in laser system")
        return laser

    def get_laser_by_name(
        self, laser_name: Literal["UV Light", "SuperContVisible Light", "CARS Light (Attenuator)"]
    ) -> _LaserState:
        laser = next((laser for laser in self.lasers if laser.LightSourceName == laser_name), None)
        if laser is None:
            raise ValueError(f"No laser named {laser_name!r} in laser system")
        return laser


@dataclass(frozen=True)
class _LaserValue:
    """Laser parameters at a specific Lambda-scan step."""

    Step: int
    Wavelength: float
    Power: float = 0.0
    FixedLinePower: float = 0.0
    Temperature: float = 0.0
    Humidity: float = 0.0

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "_LaserValue":
        return cls(
            Step=int(data.get("Step", 0)),
            Wavelength=float(data.get("Wavelength", 0.0)),
            Power=float(data.get("Power", 0.0)),
            FixedLinePower=float(data.get("FixedLinePower", 0.0)),
            Temperature=float(data.get("Temperature", 0.0)),
            Humidity=float(data.get("Humidity", 0.0)),
        )


@dataclass(frozen=True)
class _TileInfo:
    """Stage position at a Navigator tile."""

    FieldX: int
    FieldY: int
    PosX: float
    PosY: float
    PosZ: float

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "_TileInfo":
        return cls(
            FieldX=int(data.get("FieldX", 0)),
            FieldY=int(data.get("FieldY", 0)),
            PosX=float(data.get("PosX", 0.0)),
            PosY=float(data.get("PosY", 0.0)),
            PosZ=float(data.get("PosZ", 0.0)),
        )


class _LeicaMetadataParser:
    """Parser for extracting metadata from Leica LIF files."""

    # Set of detectors used for either the UV (405 nm) or WLL laser
    _FLUORESCENCE_DETECTORS = {"HyD S 1", "HyD S 2", "HyD X 3", "HyD R 4"}

    # Set of channels that utilize the CRS laser
    _CRS_LASER_MODALITIES = {SRS, E_CARS, F_CARS, E_SHG, F_SHG}

    # Map of LIF dimension key -> DimensionFlag for get_dimension_flags
    _DIM_FLAG_MAP: dict[str, DimensionFlags] = {
        "T": DimensionFlags.TIMELAPSE,
        "Z": DimensionFlags.Z_STACK,
        "S": DimensionFlags.RGB,
        "λ": DimensionFlags.SPECTRAL,
        "Λ": DimensionFlags.SPECTRAL,
        "M": DimensionFlags.MONTAGE,
    }

    # Map of (detector_name, beam_route) to Channel for automatic detection
    _CHANNEL_DETECTION_MAP = {
        ("F-SRS", None): SRS,  # expected beam route is "10;0" but not checked
        ("HyD NDD 1", "20;21"): E_CARS,
        ("HyD NDD 2", "20;2"): E_SHG,
        ("Trans PMT 2", None): F_CARS,  # beam route unknown
        ("Trans PMT 3", "10;2"): BRIGHTFIELD,  # ambiguous: same detector/route as F_SHG
    }

    # Map of (detector_name, beam_route) to warning for ambiguous assignments
    _CHANNEL_AMBIGUITY_WARNINGS: dict[tuple[str | None, str | None], str] = {
        ("Trans PMT 3", "10;2"): (
            "Detected BRIGHTFIELD via Trans PMT 3 / BeamRoute '10;2', but this detector and beam "
            "route are also used for F-SHG. If this is an F-SHG channel, pass the channels "
            "argument explicitly (e.g. channels=[..., F_SHG, ...])."
        ),
    }

    def __init__(
        self,
        lif_path: Path,
        image_name: str,
        channels: list[Channel] | None = None,
    ):
        self.lif_path = lif_path
        self.image_name = image_name
        self.channels = channels
        # Attributes populated during parse()
        self._lif: liffile.LifFile
        self.image: Any
        self.sizes: dict[str, int]
        self.dimensions: DimensionFlags
        self.timestamp: datetime
        self.image_description: _ImageDescription
        self.laser_system_state: _LaserSystemState

    def parse(self, lif: liffile.LifFile | None = None) -> InstrumentMetadata:
        """Parse the LIF file and extract all metadata for the specified image."""
        if lif is not None:
            return self._extract_metadata(lif)
        with liffile.LifFile(self.lif_path) as opened:
            return self._extract_metadata(opened)

    def _extract_metadata(self, lif: liffile.LifFile) -> InstrumentMetadata:
        self._lif = lif
        self.image = self._lif.images[self.image_name]

        if not hasattr(self.image, "attrs"):
            raise ValueError(
                f"Missing attrs metadata for image '{self.image_name}' in {self.lif_path}"
            )

        self.sizes = self.image.sizes
        self.dimensions = self.get_dimension_flags()
        self.timestamp = self.parse_timestamp()

        self.image_description = self.parse_image_description()
        self.laser_system_state = self.parse_laser_array_data()

        resolution = self.parse_nominal_dimensions()
        measured = self.parse_measured_dimensions()
        acquisition = self.parse_acquisition_settings()
        optics = self.parse_microscope_settings()

        channel_metadata_list = self.parse_all_channels(resolution, measured, acquisition, optics)
        return InstrumentMetadata(self.sizes, channel_metadata_list)

    def parse_image_description(self) -> _ImageDescription:
        """Parse the ImageDescription XML element into structured data."""
        image_description_element = self.image.xml_element.find("./Data/Image/ImageDescription")
        if image_description_element is None:
            raise ValueError(
                f"Missing image description metadata for image '{self.image_name}' "
                f"in {self.lif_path}"
            )

        channels_element = image_description_element.find("Channels")
        dimensions_element = image_description_element.find("Dimensions")
        if channels_element is None or dimensions_element is None:
            raise ValueError("Expected <Channels> and <Dimensions> under <ImageDescription>")

        lif_channels = [
            _LifChannel.from_xml(e) for e in channels_element.findall("ChannelDescription")
        ]
        lif_dimensions = [
            _LifDimension.from_xml(e) for e in dimensions_element.findall("DimensionDescription")
        ]

        return _ImageDescription(lif_channels=lif_channels, lif_dimensions=lif_dimensions)

    def parse_laser_array_data(self) -> _LaserSystemState:
        """Parse laser system states from hardware settings."""
        laser_array_data = (
            self.image.attrs.get("HardwareSetting", {})
            .get("ATLConfocalSettingDefinition", {})
            .get("LaserArray", {})
            .get("Laser", {})
        )
        # Normalize to list: XML conversion returns a dict for one element
        if isinstance(laser_array_data, dict):
            laser_array_data = [laser_array_data]
        return _LaserSystemState(
            lasers=[_LaserState.from_dict(laser_data) for laser_data in laser_array_data]
        )

    def parse_all_channels(
        self,
        resolution: NominalDimensions,
        measured: MeasuredDimensions,
        acquisition: AcquisitionSettings,
        optics: MicroscopeConfig,
    ) -> list[ChannelMetadata]:
        """Parse metadata for all channels in the LIF image."""
        num_channels = len(self.image_description.lif_channels)
        if self.channels is not None and len(self.channels) != num_channels:
            raise ValueError(
                f"Expected {num_channels} channels but got {len(self.channels)} in channels list"
            )

        return [
            self.parse_channel_metadata(
                lif_channel,
                self.channels[i] if self.channels else None,
                resolution,
                measured,
                acquisition,
                optics,
            )
            for i, lif_channel in enumerate(self.image_description.lif_channels)
        ]

    def parse_channel_metadata(
        self,
        lif_channel: _LifChannel,
        channel: Channel | None,
        resolution: NominalDimensions,
        measured: MeasuredDimensions,
        acquisition: AcquisitionSettings,
        optics: MicroscopeConfig,
    ) -> ChannelMetadata:
        """Parse metadata for a specific channel."""
        if channel is None:
            channel = self.infer_channel(lif_channel)

        return ChannelMetadata(
            channel=channel,
            timestamp=self.timestamp,
            dimensions=self.dimensions,
            resolution=resolution,
            measured=measured,
            acquisition=acquisition,
            optics=optics,
        )

    def infer_channel(self, lif_channel: _LifChannel) -> Channel:
        """Infer channel from LIF metadata using laser state and detector
        configuration (see reference leica.py:488-512 for the heuristics'
        rationale and limitations)."""
        active_lasers = self.laser_system_state.active_lasers
        if not active_lasers:
            raise ValueError(f"No active laser for '{self.image_name}' in {self.lif_path}")

        if len(active_lasers) == 1 and active_lasers[0] in (
            _LightSourceType.DIODE,
            _LightSourceType.WLL,
        ):
            active_laser_state = self.laser_system_state.get_laser_by_type(active_lasers[0])
            return self.infer_channel_from_laser_state(active_laser_state)

        return self.infer_channel_from_detector(lif_channel, active_lasers)

    def infer_channel_from_laser_state(self, laser_state: _LaserState) -> Channel:
        """Infer channel from laser state using excitation wavelength."""
        if laser_state.LightSourceType == _LightSourceType.CRS:
            raise ValueError("Cannot infer channel from CRS laser")

        excitation_wavelength_nm = self.extract_wavelength_value(laser_state.WavelengthDouble)
        try:
            return Channel.from_wavelength(
                excitation_wavelength_nm, name=laser_state.LightSourceType.name
            )
        except ValueError:
            warnings.warn(
                f"Parsed excitation wavelength {excitation_wavelength_nm} nm outside accepted "
                "range for Channel inference. Pass a Channel instance to prevent this warning.",
                MetadataWarning,
                stacklevel=2,
            )
            # NIR lasers are typically 700-1400 nm; assign a dark red color
            return Channel(name=laser_state.LightSourceType.name, color="#8B0000")

    def infer_channel_from_detector(
        self,
        lif_channel: _LifChannel,
        active_lasers: list[_LightSourceType],
    ) -> Channel:
        """Infer channel from detector name and beam route."""
        detector_name = lif_channel.properties.get("DetectorName")
        beam_route = lif_channel.properties.get("BeamRoute")

        if detector_name in self._FLUORESCENCE_DETECTORS:
            # crude assumption: prefer WLL over DIODE when both are active
            laser_type = (
                _LightSourceType.WLL
                if _LightSourceType.WLL in active_lasers
                else _LightSourceType.DIODE
            )
            laser_state = self.laser_system_state.get_laser_by_type(laser_type)
            return self.infer_channel_from_laser_state(laser_state)

        channel = self._CHANNEL_DETECTION_MAP.get(
            (detector_name, beam_route)
        ) or self._CHANNEL_DETECTION_MAP.get((detector_name, None))

        if channel is None:
            raise ValueError(
                f"Could not determine channel from DetectorName: {detector_name}, "
                f"BeamRoute: {beam_route}. Please provide channels list explicitly."
            )

        warning_msg = self._CHANNEL_AMBIGUITY_WARNINGS.get(
            (detector_name, beam_route)
        ) or self._CHANNEL_AMBIGUITY_WARNINGS.get((detector_name, None))
        if warning_msg:
            warnings.warn(warning_msg, MetadataWarning, stacklevel=2)

        # For SRS, (E/F)CARS, and (E/F)SHG calculate wavelengths from CRS laser
        if channel in self._CRS_LASER_MODALITIES:
            laser_state = self.laser_system_state.get_laser_by_type(_LightSourceType.CRS)
            pump_wavelength_nm = self.extract_wavelength_value(laser_state.WavelengthDouble)

            if channel in (E_CARS, F_CARS):
                # CARS detects the anti-Stokes wavelength
                emission_nm = float(
                    calculate_antistokes_wavelength(pump_wavelength_nm, CRS_STOKES_WAVELENGTH_NM)
                )
            elif channel in (E_SHG, F_SHG):
                # SHG emission is exactly half the excitation wavelength
                emission_nm = pump_wavelength_nm / 2
            else:  # SRS
                # SRS is loss-based: emission wavelength equals excitation
                emission_nm = pump_wavelength_nm

            return Channel(
                name=channel.name,
                excitation_nm=round(pump_wavelength_nm, 1),
                emission_nm=round(emission_nm, 1),
                color=channel.color,
            )

        return channel

    def get_dimension_flags(self) -> DimensionFlags:
        """Determine dimension flags from the LIF sizes (keys per the LAS X
        dimension legend; see io/lif.py)."""
        result = DimensionFlags(0)
        for key, flag in self._DIM_FLAG_MAP.items():
            if self.sizes.get(key, 0) > 1:
                result |= flag
        return result

    def parse_timestamp(self) -> datetime:
        """Parse timestamp from LIF metadata (Apollo-11 placeholder on
        failure, with MetadataWarning - reference leica.py:634-645)."""
        try:
            return self._lif.images[self.image_name].timestamps[0]
        except IndexError:
            warnings.warn(
                f"Could not parse timestamp for image '{self.image_name}' in {self.lif_path}. "
                "Defaulting to a placeholder timestamp. Image metadata may be corrupted.",
                MetadataWarning,
                stacklevel=2,
            )
            return datetime(1969, 7, 20, 20, 17)

    @property
    def confocal_settings(self) -> dict[str, Any]:
        """ATLConfocalSettingDefinition from hardware settings."""
        return self.image.attrs.get("HardwareSetting", {}).get("ATLConfocalSettingDefinition", {})

    def parse_nominal_dimensions(self) -> NominalDimensions:
        """Parse nominal dimensions from LIF metadata (dim-id legend:
        X=1, Y=2, Z=3, T=4, lambda=5, Lambda=9, M=10)."""
        x_dim = self.find_dimension(1)
        y_dim = self.find_dimension(2)
        x_step_um = _convert_units(x_dim.step, x_dim.unit, "um")
        y_step_um = _convert_units(y_dim.step, y_dim.unit, "um")
        if abs(x_step_um - y_step_um) / x_step_um > 0.01:
            warnings.warn(
                f"X ({x_step_um:.4f} µm) and Y ({y_step_um:.4f} µm) pixel steps differ by more "
                "than 1%; using average for xy_step_um.",
                MetadataWarning,
                stacklevel=2,
            )
        xy_step_um = (x_step_um + y_step_um) / 2

        z_size_px, z_step_um = None, None
        if self.dimensions.is_zstack:
            z_dim = self.find_dimension(3)
            z_size_px = z_dim.number_of_elements
            z_step_um = _convert_units(z_dim.step, z_dim.unit, "um")

        t_size_px, t_step_ms = None, None
        if self.dimensions.is_timelapse:
            t_dim = self.find_dimension(4)
            t_size_px = t_dim.number_of_elements
            t_step_ms = _convert_units(t_dim.step, t_dim.unit, "ms")

        w_size_px, w_step_nm = None, None
        if self.dimensions.is_spectral:
            for dim_id, size_key in [(9, "Λ"), (5, "λ")]:
                if size_key in self.sizes and self.sizes[size_key] > 1:
                    w_dim = self.find_dimension(dim_id)
                    w_size_px = w_dim.number_of_elements
                    w_step_nm = _convert_units(w_dim.step, w_dim.unit, "nm")
                    break

        return NominalDimensions(
            x_size_px=x_dim.number_of_elements,
            y_size_px=y_dim.number_of_elements,
            xy_step_um=xy_step_um,
            z_size_px=z_size_px,
            z_step_um=z_step_um,
            t_size_px=t_size_px,
            t_step_ms=t_step_ms,
            w_size_px=w_size_px,
            w_step_nm=w_step_nm,
        )

    def find_dimension(self, dim_id: int) -> _LifDimension:
        """Find a _LifDimension by its ID."""
        dimension = next(
            (d for d in self.image_description.lif_dimensions if d.dim_id == dim_id), None
        )
        if dimension is None:
            raise ValueError(f"Missing dimension (dim_id={dim_id}) in LIF metadata")
        return dimension

    def parse_measured_dimensions(self) -> MeasuredDimensions:
        """Parse measured dimension values (see reference leica.py:725-824 for
        the acquisition-type-dependent Lambda-scan paths and the Z-priority
        rule when both montage and z-stack flags are set)."""
        x_values_um = None
        y_values_um = None
        z_values_um = None
        t_values_ms = None
        w_values_nm = None

        if self.dimensions.is_montage:
            tile_scan_data = self.image.attrs.get("TileScanInfo", {}).get("Tile", {})
            if isinstance(tile_scan_data, dict):
                tile_scan_data = [tile_scan_data]
            to_um = _convert_units(1, "m", "um")
            x_values_um = to_um * np.array([_TileInfo.from_dict(i).PosX for i in tile_scan_data])
            y_values_um = to_um * np.array([_TileInfo.from_dict(i).PosY for i in tile_scan_data])
            z_values_um = to_um * np.array([_TileInfo.from_dict(i).PosZ for i in tile_scan_data])
            # Convert to relative positions
            x_values_um -= x_values_um.mean()
            y_values_um -= y_values_um.mean()
            z_values_um -= z_values_um.mean()

        if self.dimensions.is_zstack:
            # Z-stack coordinates take priority over montage tile Z positions
            z_dim = self.find_dimension(3)
            to_um = _convert_units(1, z_dim.unit, "um")
            z_values_um = to_um * self.image.coords["Z"]

        if self.dimensions.is_timelapse:
            t_dim = self.find_dimension(4)
            to_ms = _convert_units(1, t_dim.unit, "ms")
            t_values_ms = to_ms * self.image.coords["T"]

        # Typical Lambda scan
        if (
            self.dimensions.is_spectral
            and not self.dimensions.is_montage
            and "merged" not in self.image_name.lower()
        ):
            laser_values_data = (
                self.image.attrs.get("LaserValues", {})
                .get("Laser", {})
                .get("StagePosition", {})
                .get("LaserValues", {})
            )
            if isinstance(laser_values_data, dict):
                laser_values_data = [laser_values_data]
            w_values_nm = np.array(
                [_LaserValue.from_dict(item).Wavelength for item in laser_values_data]
            )

        # Lambda scan in Navigator: metadata only contains the scan definition
        elif self.dimensions.is_spectral:
            lambda_scan_definition = (
                self.image.attrs.get("HardwareSetting", {})
                .get("ATLConfocalSettingDefinition", {})
                .get("LambdaDefinition", {})
                .get("LambdaExcitation", {})
            )
            w_start_nm = float(lambda_scan_definition.get("LambdaExcitationBeginDouble", np.nan))
            w_end_nm = float(lambda_scan_definition.get("LambdaExcitationEndDouble", np.nan))
            w_steps = int(lambda_scan_definition.get("LambdaExcitationStepCount", 0))
            w_values_nm = np.linspace(w_start_nm, w_end_nm, w_steps)

        return MeasuredDimensions(
            x_values_um=x_values_um,
            y_values_um=y_values_um,
            z_values_um=z_values_um,
            t_values_ms=t_values_ms,
            w_values_nm=w_values_nm,
        )

    def parse_acquisition_settings(self) -> AcquisitionSettings:
        """Parse acquisition settings; total exposure accounts for all
        averaging and accumulation passes (reference leica.py:826-862)."""
        microscope_data = self.confocal_settings

        zoom = float(microscope_data.get("Zoom", np.nan))
        pixel_dwell_time_s = float(microscope_data.get("PixelDwellTime", np.nan))
        line_scan_speed_hz = float(microscope_data.get("ScanSpeed", np.nan))
        line_averaging = int(microscope_data.get("LineAverage", 1))
        line_accumulation = int(microscope_data.get("Line_Accumulation", 1))
        frame_averaging = int(microscope_data.get("FrameAverage", 1))
        frame_accumulation = int(microscope_data.get("FrameAccumulation", 1))

        pixel_dwell_time_us = 1e6 * pixel_dwell_time_s

        exposure_time_s = (
            pixel_dwell_time_s
            * self.sizes["X"]
            * self.sizes["Y"]
            * line_averaging
            * line_accumulation
            * frame_averaging
            * frame_accumulation
        )

        return AcquisitionSettings(
            exposure_time_s=exposure_time_s,
            zoom=zoom,
            binning=None,
            pixel_dwell_time_us=pixel_dwell_time_us,
            line_scan_speed_hz=line_scan_speed_hz,
            line_averaging=line_averaging,
            line_accumulation=line_accumulation,
            frame_averaging=frame_averaging,
            frame_accumulation=frame_accumulation,
        )

    def parse_microscope_settings(self) -> MicroscopeConfig:
        """Parse microscope settings from LIF metadata."""
        microscope_data = self.confocal_settings

        magnification = int(microscope_data.get("Magnification", 0))
        numerical_aperture = float(microscope_data.get("NumericalAperture", np.nan))
        objective = microscope_data.get("ObjectiveName", "").strip()

        return MicroscopeConfig(
            magnification=magnification,
            numerical_aperture=numerical_aperture,
            objective=objective,
            light_source=None,
            power_mw=None,
        )

    @staticmethod
    def extract_wavelength_value(value: str | int | float) -> float:
        """Extract a wavelength value, converting meters to nanometers when
        the magnitude suggests SI meters (< 1e-3)."""
        try:
            wavelength = float(value)
            return wavelength * 1e9 if wavelength < 1e-3 else wavelength
        except (ValueError, TypeError) as ex:
            raise ValueError(f"Cannot determine wavelength from {value}") from ex
