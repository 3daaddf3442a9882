"""Microscopy channel definitions and wavelength-to-color utilities.

Same data model and predefined-channel registry as the reference
(`src/arcadia_microscopy_tools/channels.py:35-117`), but with a
zero-dependency colorimetry path: instead of the `colour-science` package we
use the Wyman-Sloan-Shirley (2013) analytic approximation of the CIE 1931
2-degree color matching functions, which is accurate to ~1% over the visible
range - more than enough to pick a display color for a channel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_HEX_RE = re.compile(r"^#(?:[0-9a-fA-F]{3}){1,2}$")


def _piecewise_gaussian(x: float, mu: float, s1: float, s2: float) -> float:
    """Asymmetric Gaussian lobe used by the analytic CIE CMF fit."""
    t = (x - mu) * (s1 if x < mu else s2)
    return float(np.exp(-0.5 * t * t))


def _wavelength_to_xyz(wavelength_nm: float) -> np.ndarray:
    """CIE 1931 2-degree XYZ tristimulus values for a monochromatic stimulus.

    Analytic multi-lobe Gaussian fit (Wyman, Sloan & Shirley, JCGT 2013).
    """
    w = float(wavelength_nm)
    x = (
        0.362 * _piecewise_gaussian(w, 442.0, 0.0624, 0.0374)
        + 1.056 * _piecewise_gaussian(w, 599.8, 0.0264, 0.0323)
        - 0.065 * _piecewise_gaussian(w, 501.1, 0.0490, 0.0382)
    )
    y = 0.821 * _piecewise_gaussian(w, 568.8, 0.0213, 0.0247) + 0.286 * _piecewise_gaussian(
        w, 530.9, 0.0613, 0.0322
    )
    z = 1.217 * _piecewise_gaussian(w, 437.0, 0.0845, 0.0278) + 0.681 * _piecewise_gaussian(
        w, 459.0, 0.0385, 0.0725
    )
    return np.array([x, y, z], dtype=np.float64)


# sRGB (IEC 61966-2-1) XYZ -> linear-RGB matrix, D65 white point.
_XYZ_TO_SRGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    dtype=np.float64,
)


def _srgb_encode(linear: np.ndarray) -> np.ndarray:
    """Apply the sRGB opto-electronic transfer function."""
    return np.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * np.power(np.clip(linear, 0.0, None), 1.0 / 2.4) - 0.055,
    )


def wavelength_to_hex(wavelength_nm: float) -> str:
    """Convert a visible-spectrum wavelength to a hex color string.

    Args:
        wavelength_nm: Wavelength in nanometers (360-780).

    Returns:
        Hex color string, e.g. ``"#1A2BFF"``.

    Raises:
        ValueError: If wavelength is outside the visible range.
    """
    if not 360 <= wavelength_nm <= 780:
        raise ValueError(
            f"Wavelength must be in the visible range (360-780 nm), got {wavelength_nm} nm"
        )
    xyz = _wavelength_to_xyz(wavelength_nm)
    rgb = np.clip(_srgb_encode(_XYZ_TO_SRGB @ xyz), 0, 1)
    r, g, b = (rgb * 255).astype(int)
    return f"#{r:02X}{g:02X}{b:02X}"


@dataclass(frozen=True)
class Channel:
    """A microscopy imaging channel.

    Attributes:
        name: Human-readable channel identifier (e.g. ``"DAPI"``).
        color: Hex color string used for visualization (e.g. ``"#0033FF"``).
        excitation_nm: Excitation wavelength in nanometers, if known.
        emission_nm: Emission wavelength in nanometers, if known.
    """

    name: str
    color: str
    excitation_nm: float | None = None
    emission_nm: float | None = None

    def __post_init__(self) -> None:
        if not _HEX_RE.match(self.color):
            raise ValueError(f"color must be a hex code like '#FF0000', got '{self.color}'")
        if self.excitation_nm is not None and self.excitation_nm <= 0:
            raise ValueError("excitation_nm must be positive")
        if self.emission_nm is not None and self.emission_nm <= 0:
            raise ValueError("emission_nm must be positive")

    @classmethod
    def from_wavelength(
        cls,
        wavelength_nm: float,
        *,
        name: str | None = None,
        is_excitation: bool = True,
    ) -> Channel:
        """Create a channel with a color derived from a visible wavelength.

        Args:
            wavelength_nm: Wavelength in nanometers (360-780).
            name: Channel name. Defaults to ``"{wavelength}nm"``.
            is_excitation: If True (default), ``wavelength_nm`` is stored as
                excitation. Otherwise it is stored as emission.
        """
        hex_color = wavelength_to_hex(wavelength_nm)
        name = name or f"{wavelength_nm:.0f}nm"
        wl = round(wavelength_nm, 1)
        return cls(
            name=name,
            color=hex_color,
            excitation_nm=wl if is_excitation else None,
            emission_nm=wl if not is_excitation else None,
        )

    def rgb(self) -> tuple[float, float, float]:
        """Return the channel color as an (r, g, b) float tuple in [0, 1]."""
        hex_color = self.color.lstrip("#")
        if len(hex_color) == 3:
            hex_color = "".join(c * 2 for c in hex_color)
        return tuple(int(hex_color[i : i + 2], 16) / 255.0 for i in (0, 2, 4))  # type: ignore


# -- Predefined channels ------------------------------------------------------
# Registry matches the reference channel set (channels.py:88-117).

BRIGHTFIELD = Channel("BRIGHTFIELD", "#FFFFFF")
DIC = Channel("DIC", "#FFFFFF")
PHASE = Channel("PHASE", "#DDDDDD")
DAPI = Channel("DAPI", "#0033FF", excitation_nm=405, emission_nm=450)
FITC = Channel("FITC", "#07FF00", excitation_nm=488, emission_nm=512)
TRITC = Channel("TRITC", "#FFBF00", excitation_nm=561, emission_nm=595)
CY5 = Channel("CY5", "#A30000", excitation_nm=640, emission_nm=665)
SRS = Channel("SRS", "#E63535")
E_CARS = Channel("E-CARS", "#AB1299")
F_CARS = Channel("F-CARS", "#AB1299")
E_SHG = Channel("E-SHG", "#F29B4F")
F_SHG = Channel("F-SHG", "#F29B4F")

CHANNELS: dict[str, Channel] = {
    ch.name: ch
    for ch in [
        BRIGHTFIELD,
        DIC,
        PHASE,
        DAPI,
        FITC,
        TRITC,
        CY5,
        SRS,
        E_CARS,
        F_CARS,
        E_SHG,
        F_SHG,
    ]
}
