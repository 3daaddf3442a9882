"""Segmentation mask analysis.

API twin of the reference's `SegmentationMask`
(`src/arcadia_microscopy_tools/masks.py:118-467`): the same defaults, field
immutability, cached lazy properties, derived circularity/volume formulas,
per-channel intensity suffixes, `filter` semantics, and unit conversion
tables. Execution differs: label processing and all per-cell measurements run
as one device program (connected components + segment reductions,
`ops.labeling` / `ops.regionprops`) instead of skimage's per-region Python
loops; only outline extraction and convex hulls stay on host (as they do in
the reference, where they are lazy `cached_property` paths).
"""

from __future__ import annotations

import warnings
from collections.abc import Mapping
from dataclasses import dataclass, field
from functools import cached_property
from typing import ClassVar, Literal

import numpy as np

from .core.channels import Channel
from .measure import convex_areas, extract_outlines, feret_diameters, region_moments
from .ops.labeling import clear_border as _clear_border
from .ops.labeling import label as _label
from .ops.labeling import relabel_sequential as _relabel_sequential
from .ops.regionprops import measure_intensity_stack, measure_labels
from .typing import BoolArray, Float64Array, Int64Array, ScalarArray, UInt16Array

DEFAULT_CELL_PROPERTY_NAMES = [
    "label",
    "centroid",
    "volume",
    "area",
    "area_convex",
    "perimeter",
    "eccentricity",
    "circularity",
    "solidity",
    "axis_major_length",
    "axis_minor_length",
    "orientation",
]

DEFAULT_INTENSITY_PROPERTY_NAMES = [
    "intensity_mean",
    "intensity_max",
    "intensity_min",
    "intensity_std",
]

# Properties computed directly by the device measurement kernel.
_DEVICE_PROPERTIES = {
    "area",
    "perimeter",
    "eccentricity",
    "axis_major_length",
    "axis_minor_length",
    "orientation",
    "extent",
}

# Host-side moment-derived property families (skimage regionprops_table
# column layout: "moments-p-q", "inertia_tensor-i-j", ...-eigvals-k).
_MOMENT_PROPERTIES = {
    "moments",
    "moments_central",
    "moments_normalized",
    "inertia_tensor",
    "inertia_tensor_eigvals",
}

SUPPORTED_PROPERTY_NAMES = sorted(
    _DEVICE_PROPERTIES
    | _MOMENT_PROPERTIES
    | {
        "label",
        "centroid",
        "bbox",
        "area_convex",
        "solidity",
        "circularity",
        "volume",
        "feret_diameter_max",
        "equivalent_diameter_area",
    }
)


def _round_up(n: int, multiple: int = 256) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def _process_mask(
    mask_image: BoolArray | Int64Array,
    remove_edge_cells: bool,
) -> Int64Array:
    """Process a mask image by optionally removing edge cells and ensuring
    consecutive labels (reference masks.py:38-65 semantics: clear border,
    then label/relabel, erroring when nothing remains).

    Returns:
        Processed label image with consecutive labels starting from 1.

    Raises:
        ValueError: If no cells remain after processing.
    """
    mask = np.asarray(mask_image)
    if mask.dtype == bool:
        lbl = _label(mask)
    else:
        lbl = np.asarray(mask).astype(np.int64)

    if remove_edge_cells:
        lbl = _clear_border(lbl)
        if int(np.asarray(lbl).max()) == 0:
            raise ValueError(
                "No cells remain after removing edge cells. Try setting remove_edge_cells=False."
            )

    return np.asarray(_relabel_sequential(lbl)).astype(np.int64)


def _extract_outlines_cellpose(label_image: Int64Array) -> list[Float64Array]:
    """Boundary-pixel outlines, (y, x) format (reference masks.py:68-79)."""
    return extract_outlines(label_image, method="cellpose")


def _extract_outlines_skimage(label_image: Int64Array) -> list[Float64Array]:
    """Sub-pixel marching-squares outlines, (y, x) format
    (reference masks.py:82-115)."""
    return extract_outlines(label_image, method="skimage")


@dataclass
class SegmentationMask:
    """Container for segmentation mask data and feature extraction.

    Args:
        mask_image: 2D integer or boolean array where each cell has a unique
            label (background=0).
        intensity_image_dict: Optional dict mapping Channel instances to 2D
            intensity arrays with the same shape as mask_image. Channel names
            are used as suffixes for intensity properties.
        remove_edge_cells: Whether to remove cells touching image borders.
            Defaults to True.
        outline_extractor: Outline extraction method ("cellpose" or "skimage").
            Defaults to "cellpose".
        property_names: List of property names to compute. If None, uses
            DEFAULT_CELL_PROPERTY_NAMES.
        intensity_property_names: List of intensity property names to compute.
            If None, uses DEFAULT_INTENSITY_PROPERTY_NAMES when
            intensity_image_dict is provided.
    """

    mask_image: BoolArray | Int64Array
    intensity_image_dict: Mapping[Channel, UInt16Array] | None = None
    remove_edge_cells: bool = True
    outline_extractor: Literal["cellpose", "skimage"] = "cellpose"
    property_names: list[str] | None = field(default=None)
    intensity_property_names: list[str] | None = field(default=None)

    # Core fields that must not be mutated after initialisation. cached_property
    # writes directly to instance.__dict__, bypassing __setattr__, so it is
    # unaffected.
    _IMMUTABLE_FIELDS: ClassVar[frozenset[str]] = frozenset(
        {
            "mask_image",
            "intensity_image_dict",
            "remove_edge_cells",
            "outline_extractor",
            "property_names",
            "intensity_property_names",
        }
    )

    def __setattr__(self, name: str, value: object) -> None:
        if getattr(self, "_initialized", False) and name in self._IMMUTABLE_FIELDS:
            raise AttributeError(
                f"Cannot modify '{name}' after SegmentationMask is initialized. "
                "Create a new instance instead."
            )
        super().__setattr__(name, value)

    def __post_init__(self):
        """Validate inputs and set defaults."""
        if not isinstance(self.mask_image, np.ndarray):
            raise TypeError("mask_image must be a numpy array")
        if self.mask_image.ndim != 2:
            raise ValueError("mask_image must be a 2D array")
        if np.any(self.mask_image < 0):
            raise ValueError("mask_image must have non-negative values")
        if self.mask_image.max() == 0:
            raise ValueError("mask_image contains no cells (all values are 0)")

        if self.intensity_image_dict is not None:
            if not isinstance(self.intensity_image_dict, Mapping):
                raise TypeError("intensity_image_dict must be a Mapping of channels to 2D arrays")
            for channel, intensities in self.intensity_image_dict.items():
                if not isinstance(intensities, np.ndarray):
                    raise TypeError(f"Intensity image for '{channel.name}' must be a numpy array")
                if intensities.ndim != 2:
                    raise ValueError(f"Intensity image for '{channel.name}' must be 2D")
                if intensities.shape != self.mask_image.shape:
                    raise ValueError(
                        f"Intensity image for '{channel.name}' must have same shape as mask_image"
                    )
            # Shallow-copy so key changes in one instance (e.g. after filter())
            # do not affect another; the arrays are shared by reference.
            self.intensity_image_dict = dict(self.intensity_image_dict)

        if self.property_names is None:
            self.property_names = DEFAULT_CELL_PROPERTY_NAMES.copy()

        if self.intensity_property_names is None:
            if self.intensity_image_dict:
                self.intensity_property_names = DEFAULT_INTENSITY_PROPERTY_NAMES.copy()
            else:
                self.intensity_property_names = []

        object.__setattr__(self, "_initialized", True)

    @cached_property
    def label_image(self) -> Int64Array:
        """Processed label image with consecutive labels starting from 1
        (background=0). Edge cells removed if remove_edge_cells=True."""
        return _process_mask(self.mask_image, self.remove_edge_cells)

    @cached_property
    def num_cells(self) -> int:
        """Number of cells in the mask (maximum label value)."""
        return int(self.label_image.max())

    @cached_property
    def cell_outlines(self) -> list[Float64Array]:
        """Cell outlines via the configured extractor, ordered by label
        (index 0 = label 1); empty (0, 2) arrays keep alignment."""
        if self.outline_extractor == "cellpose":
            return _extract_outlines_cellpose(self.label_image)
        else:  # must be "skimage" due to Literal type
            return _extract_outlines_skimage(self.label_image)

    @cached_property
    def _device_measurements(self) -> dict[str, np.ndarray]:
        """One fused device pass of all morphological measurements, trimmed to
        num_cells on host."""
        max_cells = _round_up(self.num_cells)
        padded = measure_labels(self.label_image, max_cells=max_cells)
        n = self.num_cells
        return {k: np.asarray(v)[:n] for k, v in padded.items()}

    @cached_property
    def cell_properties(self) -> dict[str, ScalarArray]:
        """Extract cell property values (morphological + per-channel intensity).

        For multichannel intensity images, property names are suffixed with
        the lowercased channel name: "intensity_mean_dapi", "intensity_max_fitc".

        Returns:
            Dictionary mapping property names to arrays of values (one per cell).
        """
        assert self.property_names is not None  # type checker blind to __post_init__

        requested = list(self.property_names)
        needs_circularity = "circularity" in requested
        needs_volume = "volume" in requested
        needs_solidity = "solidity" in requested
        needs_convex = "area_convex" in requested or needs_solidity

        dm = self._device_measurements
        properties: dict[str, ScalarArray] = {}

        convex = convex_areas(self.label_image) if needs_convex else None
        needs_moments = bool(_MOMENT_PROPERTIES & set(requested))
        raw_m = central_m = None
        if needs_moments:
            raw_m, central_m = region_moments(self.label_image)

        for name in requested:
            if name == "label":
                properties["label"] = dm["label"].astype(np.int64)
            elif name == "centroid":
                properties["centroid_y"] = dm["centroid_y"].astype(np.float64)
                properties["centroid_x"] = dm["centroid_x"].astype(np.float64)
            elif name in _DEVICE_PROPERTIES:
                properties[name] = dm[name].astype(np.float64)
            elif name == "bbox":
                properties["bbox-0"] = dm["bbox_min_row"].astype(np.int64)
                properties["bbox-1"] = dm["bbox_min_col"].astype(np.int64)
                properties["bbox-2"] = dm["bbox_max_row"].astype(np.int64)
                properties["bbox-3"] = dm["bbox_max_col"].astype(np.int64)
            elif name == "area_convex":
                properties["area_convex"] = convex  # type: ignore[assignment]
            elif name == "solidity":
                area = dm["area"].astype(np.float64)
                properties["solidity"] = np.where(convex > 0, area / np.maximum(convex, 1), 0.0)
            elif name == "moments":
                for p in range(4):
                    for q in range(4):
                        properties[f"moments-{p}-{q}"] = raw_m[:, p, q]
            elif name == "moments_central":
                for p in range(4):
                    for q in range(4):
                        properties[f"moments_central-{p}-{q}"] = central_m[:, p, q]
            elif name == "moments_normalized":
                mu00 = np.maximum(central_m[:, 0, 0], 1e-30)
                for p in range(4):
                    for q in range(4):
                        if p + q < 2:
                            # undefined below order 2 (skimage leaves nan)
                            values = np.full(central_m.shape[0], np.nan)
                        else:
                            values = central_m[:, p, q] / mu00 ** (1 + (p + q) / 2.0)
                        properties[f"moments_normalized-{p}-{q}"] = values
            elif name in ("inertia_tensor", "inertia_tensor_eigvals"):
                mu00 = np.maximum(central_m[:, 0, 0], 1e-30)
                t00 = central_m[:, 2, 0] / mu00
                t11 = central_m[:, 0, 2] / mu00
                t01 = -central_m[:, 1, 1] / mu00
                if name == "inertia_tensor":
                    properties["inertia_tensor-0-0"] = t00
                    properties["inertia_tensor-0-1"] = t01
                    properties["inertia_tensor-1-0"] = t01
                    properties["inertia_tensor-1-1"] = t11
                else:
                    half_trace = (t00 + t11) / 2.0
                    spread = np.sqrt(((t00 - t11) / 2.0) ** 2 + t01**2)
                    properties["inertia_tensor_eigvals-0"] = half_trace + spread
                    properties["inertia_tensor_eigvals-1"] = np.maximum(
                        half_trace - spread, 0.0
                    )
            elif name == "feret_diameter_max":
                properties["feret_diameter_max"] = feret_diameters(self.label_image)
            elif name == "equivalent_diameter_area":
                area = dm["area"].astype(np.float64)
                properties["equivalent_diameter_area"] = np.sqrt(4.0 * area / np.pi)
            elif name in ("circularity", "volume"):
                continue  # derived below
            else:
                raise ValueError(
                    f"Unsupported property name: '{name}'. Supported names: "
                    f"{SUPPORTED_PROPERTY_NAMES}"
                )

        # Derive circularity: (4*pi*area) / perimeter^2, clamped to 0 when
        # perimeter == 0 (reference masks.py:291-297).
        if needs_circularity:
            area = dm["area"].astype(np.float64)
            perimeter = dm["perimeter"].astype(np.float64)
            properties["circularity"] = np.where(
                perimeter > 0, (4.0 * np.pi * area) / (perimeter**2), 0.0
            )

        # Derive volume: prolate spheroid model (4/3)*pi*a*b^2 from 2D
        # semi-axes - a relative shape indicator (reference masks.py:299-305).
        if needs_volume:
            a = dm["axis_major_length"].astype(np.float64) / 2.0
            b = dm["axis_minor_length"].astype(np.float64) / 2.0
            properties["volume"] = np.where(
                (a > 0) & (b > 0), (4.0 / 3.0) * np.pi * a * b * b, 0.0
            )

        # Per-channel intensity properties: one fused device pass for the
        # whole channel stack
        if self.intensity_image_dict and self.intensity_property_names:
            max_cells = _round_up(self.num_cells)
            channels = list(self.intensity_image_dict.keys())
            stack = np.stack([self.intensity_image_dict[ch] for ch in channels])
            all_stats = measure_intensity_stack(
                self.label_image, stack, max_cells=max_cells
            )
            for ci, channel in enumerate(channels):
                stats = all_stats[ci]
                for prop_name in self.intensity_property_names:
                    if prop_name not in stats:
                        raise ValueError(
                            f"Unsupported intensity property name: '{prop_name}'"
                        )
                    values = np.asarray(stats[prop_name])[: self.num_cells]
                    properties[f"{prop_name}_{channel.name.lower()}"] = values.astype(
                        np.float64
                    )

        return properties

    @cached_property
    def centroids_yx(self) -> Float64Array:
        """Cell centroids as an (num_cells, 2) array of (y, x) coordinates."""
        if self.property_names is None:
            raise ValueError("property_names cannot be None.")

        if "centroid" not in self.property_names:
            warnings.warn(
                "Centroid property not available. Include 'centroid' in property_names "
                "to get centroid coordinates. Returning empty array.",
                UserWarning,
                stacklevel=2,
            )
            return np.array([]).reshape(0, 2)

        yc = self.cell_properties["centroid_y"]
        xc = self.cell_properties["centroid_x"]
        return np.array([yc, xc], dtype=float).T

    def filter(
        self,
        property_name: str,
        min_value: float | None = None,
        max_value: float | None = None,
    ) -> SegmentationMask:
        """Return a new SegmentationMask with cells removed based on a
        property threshold (reference masks.py:355-418 semantics).

        Raises:
            ValueError: If neither min_value nor max_value is provided, if
                property_name is not found, or if no cells remain.
        """
        assert self.property_names is not None
        assert self.intensity_property_names is not None

        if min_value is None and max_value is None:
            raise ValueError("At least one of min_value or max_value must be provided.")

        if property_name not in self.cell_properties:
            raise ValueError(
                f"Property '{property_name}' not found. "
                f"Available properties: {list(self.cell_properties.keys())}"
            )

        values = self.cell_properties[property_name]
        labels = np.arange(1, self.num_cells + 1)

        keep = np.ones(len(labels), dtype=bool)
        if min_value is not None:
            keep &= values >= min_value
        if max_value is not None:
            keep &= values <= max_value

        labels_to_keep = labels[keep]
        new_label_image = np.where(
            np.isin(self.label_image, labels_to_keep),
            self.label_image,
            0,
        ).astype(np.int64)

        if new_label_image.max() == 0:
            raise ValueError(
                f"No cells remain after filtering '{property_name}' "
                f"with min={min_value}, max={max_value}."
            )

        return SegmentationMask(
            mask_image=new_label_image,
            intensity_image_dict=self.intensity_image_dict,
            remove_edge_cells=False,
            outline_extractor=self.outline_extractor,
            property_names=list(self.property_names),
            intensity_property_names=list(self.intensity_property_names),
        )

    def convert_properties_to_microns(
        self,
        pixel_size_um: float,
    ) -> dict[str, ScalarArray]:
        """Convert cell properties from pixels to microns.

        Scaling by dimensionality (reference masks.py:420-467): linear
        properties x pixel_size ("_um"), areas x pixel_size^2 ("_um2"),
        volumes x pixel_size^3 ("_um3"), tensors x pixel_size^2 ("_um2");
        dimensionless properties, intensity stats, labels, and centroid
        pixel coordinates pass through unchanged. Tensor/eigenvalue columns
        are classified by their base name, so the suffixed regionprops
        columns ("inertia_tensor-0-0", "inertia_tensor_eigvals-1") convert
        correctly (the reference's table lists the base names but its column
        keys never match them, so tensors silently pass through there).
        """
        linear_properties = {
            "perimeter",
            "axis_major_length",
            "axis_minor_length",
            "feret_diameter_max",
            "equivalent_diameter_area",
        }
        area_properties = {"area", "area_convex"}
        volume_properties = {"volume"}
        tensor_properties = {"inertia_tensor", "inertia_tensor_eigvals"}

        converted = {}
        for prop_name, prop_values in self.cell_properties.items():
            base = prop_name.split("-")[0]
            if prop_name in linear_properties:
                converted[f"{prop_name}_um"] = prop_values * pixel_size_um
            elif prop_name in area_properties:
                converted[f"{prop_name}_um2"] = prop_values * (pixel_size_um**2)
            elif prop_name in volume_properties:
                converted[f"{prop_name}_um3"] = prop_values * (pixel_size_um**3)
            elif base in tensor_properties:
                converted[f"{prop_name}_um2"] = prop_values * (pixel_size_um**2)
            else:
                converted[prop_name] = prop_values

        return converted
