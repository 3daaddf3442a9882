"""Fluorescence overlay rendering as fused device kernels.

API parity with the reference blending module
(`src/arcadia_microscopy_tools/blending.py:14-226`): `BlendMode`, `Layer`,
`overlay_channels`, `create_overlay`, plus the internal blend helpers the
reference tests exercise. The matplotlib colormap dependency is gone - the
reference's two-stop `LinearSegmentedColormap` (blending.py:204-221) is a
closed-form linear interpolation between the zero anchor and the channel
color, evaluated continuously (no 256-entry LUT quantization) and fused with
the compositing math into one jitted program per (layer-config, shape)
signature.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from enum import Enum
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.channels import Channel
from ..typing import Float64Array

__all__ = ["BlendMode", "Layer", "create_overlay", "overlay_channels"]


class BlendMode(Enum):
    """Compositing rule for putting one layer onto the canvas.

    ``ALPHA`` is the classic "over" operator — each layer partially replaces
    what is underneath it, so the stacking order of layers is significant.
    ``ADDITIVE`` sums light instead of replacing it (then clips to [0, 1]),
    which matches the physics of fluorescence imaging where every fluorophore
    emits independently; with this mode the layer order is irrelevant.
    """

    ALPHA = "alpha"
    ADDITIVE = "additive"


def _hex_to_rgb(color: str) -> tuple[float, float, float]:
    hex_color = color.lstrip("#")
    if len(hex_color) == 3:
        hex_color = "".join(c * 2 for c in hex_color)
    return tuple(int(hex_color[i : i + 2], 16) / 255.0 for i in (0, 2, 4))  # type: ignore


def _clipped_unit_range(values, what: str):
    """Warn when *values* stray outside [0, 1] and clip them back in."""
    lo, hi = float(values.min()), float(values.max())
    if lo < 0.0 or hi > 1.0:
        warnings.warn(
            f"{what} outside [0, 1] (min={lo:.4g}, max={hi:.4g}). Values will "
            f"be clipped, which may indicate missing normalization.",
            stacklevel=3,
        )
        values = np.clip(values, 0.0, 1.0)
    return values



@dataclass
class Layer:
    """One channel's contribution to an overlay: intensities in [0, 1] plus
    the rendering knobs for that channel.

    ``zero_transparent=True`` ramps from fully transparent at zero intensity
    up to the channel color; ``False`` ramps from opaque black instead (a
    classic LUT look, no transparency). ``opacity`` scales the whole layer's
    alpha. Out-of-range intensities are clipped with a warning.
    """

    channel: Channel
    intensities: Float64Array
    opacity: float = 1.0
    zero_transparent: bool = True
    blend_mode: BlendMode = BlendMode.ALPHA

    def __post_init__(self) -> None:
        if self.intensities.ndim != 2:
            raise ValueError(f"Expected 2D intensities array, got shape {self.intensities.shape}")
        if not 0 <= self.opacity <= 1:
            raise ValueError(f"Opacity must be in [0, 1], got {self.opacity}")
        self.intensities = _clipped_unit_range(
            self.intensities, f"Layer '{self.channel.name}' has intensity values"
        )


class _TwoStopColormap:
    """Closed-form two-stop colormap: rgba(t) = lerp(anchor, color, t).

    Behavioral twin of the reference's LRU-cached LinearSegmentedColormap
    (blending.py:204-221), evaluated continuously instead of through a
    256-entry LUT.
    """

    def __init__(self, color: str, zero_transparent: bool):
        self.color = color
        self.zero_transparent = zero_transparent
        r, g, b = _hex_to_rgb(color)
        if zero_transparent:
            self.start = np.array([0.5, 0.5, 0.5, 0.0])
        else:
            self.start = np.array([0.0, 0.0, 0.0, 1.0])
        self.stop = np.array([r, g, b, 1.0])

    def __call__(self, intensities):
        t = jnp.clip(jnp.asarray(intensities, dtype=jnp.float32), 0.0, 1.0)[..., None]
        start = jnp.asarray(self.start, dtype=jnp.float32)
        stop = jnp.asarray(self.stop, dtype=jnp.float32)
        return start + t * (stop - start)


@lru_cache(maxsize=64)
def _build_colormap(color: str, zero_transparent: bool) -> _TwoStopColormap:
    """Return the two-stop colormap for *color*, with LRU caching.

    When *zero_transparent* is True the zero-point is a fully-transparent
    neutral gray (0.5, 0.5, 0.5, 0); otherwise it is opaque black (0, 0, 0, 1),
    giving a classic LUT-style ramp (matching the reference's anchors).
    """
    return _TwoStopColormap(color, zero_transparent)


def _gray_to_rgb(image):
    """Broadcast a single-channel 2D image to (H, W, 3)."""
    img = jnp.asarray(image)
    return jnp.repeat(img[:, :, None], 3, axis=2)


def _blend_alpha(background, foreground, alpha):
    """Porter-Duff 'over' compositing."""
    return jnp.clip(alpha * foreground + (1 - alpha) * background, 0.0, 1.0)


def _blend_additive(background, foreground, alpha):
    """Additive (screen-like) compositing - contributions accumulate."""
    return jnp.clip(background + alpha * foreground, 0.0, 1.0)


def _composite(background, foreground, alpha, mode: BlendMode):
    """Composite *foreground* onto *background* using the given blend mode."""
    if mode is BlendMode.ADDITIVE:
        return _blend_additive(background, foreground, alpha)
    return _blend_alpha(background, foreground, alpha)


@lru_cache(maxsize=128)
def _compiled_overlay(layer_configs: tuple):
    """Jit the full multi-layer composite for a static layer configuration.

    layer_configs: tuple of (color, opacity, zero_transparent, blend_mode).
    """

    def run(background, *layer_intensities):
        canvas = _gray_to_rgb(jnp.clip(background, 0.0, 1.0))
        for (color, opacity, zero_transparent, mode), intens in zip(
            layer_configs, layer_intensities
        ):
            cmap = _build_colormap(color, zero_transparent)
            rgba = cmap(intens)
            rgb = rgba[..., :3]
            alpha = opacity * rgba[..., 3:4]
            canvas = _composite(canvas, rgb, alpha, mode)
        return canvas

    return jax.jit(run)


def overlay_channels(
    background: Float64Array,
    channel_intensities: dict[Channel, Float64Array],
    *,
    opacity: float = 1.0,
    zero_transparent: bool = True,
    blend_mode: BlendMode = BlendMode.ALPHA,
) -> Float64Array:
    """Composite every channel onto *background* with shared settings.

    Thin wrapper that wraps each (channel, intensities) pair in a
    :class:`Layer` with the same opacity / transparency / blend mode and
    hands the stack to :func:`create_overlay`; build the Layer list yourself
    when channels need individual settings.
    """
    layers = [
        Layer(channel, intensities, opacity, zero_transparent, blend_mode)
        for channel, intensities in channel_intensities.items()
    ]
    return create_overlay(background, layers)


def create_overlay(
    background: Float64Array,
    layers: list[Layer],
) -> Float64Array:
    """Render *layers* onto a 2D grayscale background, returning (H, W, 3).

    Each layer's colormap + compositing math is fused into a single jitted
    device program keyed on the layer configuration; a NumPy background comes
    back as float64 NumPy, a device background stays on device. Raises
    ValueError for a non-2D background or a layer whose shape disagrees with
    it; out-of-range background values are clipped with a warning.
    """
    if background.ndim != 2:
        raise ValueError(f"Expected 2D background array, got shape {background.shape}")

    background = _clipped_unit_range(background, "Background has values")

    mismatched = [l for l in layers if l.intensities.shape != background.shape]
    if mismatched:
        bad = mismatched[0]
        raise ValueError(
            f"Layer '{bad.channel.name}' has shape {bad.intensities.shape}, "
            f"but background has shape {background.shape}."
        )

    configs = tuple(
        (layer.channel.color, float(layer.opacity), bool(layer.zero_transparent), layer.blend_mode)
        for layer in layers
    )
    run = _compiled_overlay(configs)
    result = run(jnp.asarray(background), *[jnp.asarray(l.intensities) for l in layers])

    if isinstance(background, np.ndarray):
        return np.asarray(result, dtype=np.float64)
    return result
