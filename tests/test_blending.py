"""Overlay/compositing algebraic identities (reference test_blending.py)."""

import warnings

import numpy as np
import pytest

from arcadia_microscopy_tools_tpu.blending import (
    BlendMode,
    Layer,
    _blend_additive,
    _blend_alpha,
    _build_colormap,
    _gray_to_rgb,
    create_overlay,
    overlay_channels,
)
from arcadia_microscopy_tools_tpu.channels import Channel

CHAN_BLUE = Channel("Blue", "#0000FF")
CHAN_GREEN = Channel("Green", "#00FF00")


@pytest.fixture
def background():
    return np.full((4, 4), 0.5, dtype=np.float64)


@pytest.fixture
def ones_layer():
    return np.ones((4, 4), dtype=np.float64)


@pytest.fixture
def zeros_layer():
    return np.zeros((4, 4), dtype=np.float64)


class TestLayer:
    def test_valid_layer(self, ones_layer):
        layer = Layer(CHAN_BLUE, ones_layer)
        assert layer.opacity == 1.0
        assert layer.zero_transparent is True
        assert layer.blend_mode is BlendMode.ALPHA

    def test_non_2d_intensities_raises(self):
        with pytest.raises(ValueError, match="Expected 2D"):
            Layer(CHAN_BLUE, np.ones((4, 4, 3), dtype=np.float64))

    def test_opacity_out_of_range_raises(self, ones_layer):
        with pytest.raises(ValueError, match="Opacity must be in"):
            Layer(CHAN_BLUE, ones_layer, opacity=-0.1)
        with pytest.raises(ValueError, match="Opacity must be in"):
            Layer(CHAN_BLUE, ones_layer, opacity=1.5)

    def test_out_of_range_intensities_warns_and_clips(self):
        raw = np.array([[0.0, 2.0], [-0.5, 0.5]], dtype=np.float64)
        with pytest.warns(match="outside \\[0, 1\\]"):
            layer = Layer(CHAN_BLUE, raw)
        assert float(layer.intensities.min()) >= 0.0
        assert float(layer.intensities.max()) <= 1.0

    def test_in_range_intensities_no_warning(self, ones_layer):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            Layer(CHAN_BLUE, ones_layer)


class TestBlendFunctions:
    def test_alpha_zero_returns_background(self):
        bg = np.full((2, 2, 3), 0.3)
        fg = np.full((2, 2, 3), 0.9)
        alpha = np.zeros((2, 2, 1))
        np.testing.assert_allclose(np.asarray(_blend_alpha(bg, fg, alpha)), bg)
        np.testing.assert_allclose(np.asarray(_blend_additive(bg, fg, alpha)), bg)

    def test_alpha_one_returns_foreground(self):
        bg = np.full((2, 2, 3), 0.3)
        fg = np.full((2, 2, 3), 0.9)
        alpha = np.ones((2, 2, 1))
        np.testing.assert_allclose(np.asarray(_blend_alpha(bg, fg, alpha)), fg, atol=1e-7)

    def test_alpha_half_is_midpoint(self):
        bg = np.zeros((2, 2, 3))
        fg = np.ones((2, 2, 3))
        alpha = np.full((2, 2, 1), 0.5)
        np.testing.assert_allclose(np.asarray(_blend_alpha(bg, fg, alpha)), 0.5)

    def test_additive_accumulates_and_clips(self):
        bg = np.full((2, 2, 3), 0.8)
        fg = np.full((2, 2, 3), 0.5)
        alpha = np.ones((2, 2, 1))
        out = np.asarray(_blend_additive(bg, fg, alpha))
        np.testing.assert_allclose(out, 1.0)

    def test_additive_commutative(self, background):
        a = np.random.default_rng(0).random((4, 4))
        b = np.random.default_rng(1).random((4, 4))
        ab = overlay_channels(
            background, {CHAN_BLUE: a, CHAN_GREEN: b}, blend_mode=BlendMode.ADDITIVE
        )
        ba = overlay_channels(
            background, {CHAN_GREEN: b, CHAN_BLUE: a}, blend_mode=BlendMode.ADDITIVE
        )
        np.testing.assert_allclose(ab, ba, atol=1e-7)


class TestColormap:
    def test_lru_identity(self):
        a = _build_colormap("#00FF00", True)
        b = _build_colormap("#00FF00", True)
        assert a is b

    def test_transparent_anchor(self):
        cmap = _build_colormap("#FF0000", True)
        rgba0 = np.asarray(cmap(np.zeros((1, 1))))
        rgba1 = np.asarray(cmap(np.ones((1, 1))))
        assert rgba0[0, 0, 3] == 0.0
        np.testing.assert_allclose(rgba0[0, 0, :3], 0.5)
        assert rgba1[0, 0, 3] == 1.0
        np.testing.assert_allclose(rgba1[0, 0, :3], [1, 0, 0], atol=1e-6)

    def test_opaque_black_anchor(self):
        cmap = _build_colormap("#FF0000", False)
        rgba0 = np.asarray(cmap(np.zeros((1, 1))))
        np.testing.assert_allclose(rgba0[0, 0], [0, 0, 0, 1], atol=1e-7)


class TestCreateOverlay:
    def test_shape_and_range(self, background, ones_layer):
        out = create_overlay(background, [Layer(CHAN_BLUE, ones_layer)])
        assert out.shape == (4, 4, 3)
        assert out.dtype == np.float64
        assert out.min() >= 0 and out.max() <= 1

    def test_non_2d_background_raises(self, ones_layer):
        with pytest.raises(ValueError, match="Expected 2D background"):
            create_overlay(np.zeros((4, 4, 3)), [Layer(CHAN_BLUE, ones_layer)])

    def test_shape_mismatch_raises(self, background):
        with pytest.raises(ValueError, match="has shape"):
            create_overlay(background, [Layer(CHAN_BLUE, np.ones((5, 5)))])

    def test_out_of_range_background_warns(self, ones_layer):
        with pytest.warns(match="outside \\[0, 1\\]"):
            create_overlay(np.full((4, 4), 1.5), [Layer(CHAN_BLUE, ones_layer)])

    def test_zero_intensity_transparent_leaves_background(self, background, zeros_layer):
        out = create_overlay(background, [Layer(CHAN_BLUE, zeros_layer)])
        np.testing.assert_allclose(out, np.asarray(_gray_to_rgb(background)), atol=1e-7)

    def test_full_intensity_opaque_is_channel_color(self, background, ones_layer):
        out = create_overlay(background, [Layer(CHAN_BLUE, ones_layer, opacity=1.0)])
        np.testing.assert_allclose(out[..., 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-6)

    def test_opacity_scales_contribution(self, background, ones_layer):
        full = create_overlay(background, [Layer(CHAN_BLUE, ones_layer, opacity=1.0)])
        half = create_overlay(background, [Layer(CHAN_BLUE, ones_layer, opacity=0.5)])
        expected = 0.5 * full[..., 2] + 0.5 * np.asarray(background)
        np.testing.assert_allclose(half[..., 2], expected, atol=1e-6)

    def test_overlay_channels_wrapper(self, background, ones_layer, zeros_layer):
        out = overlay_channels(
            background, {CHAN_BLUE: ones_layer, CHAN_GREEN: zeros_layer}
        )
        assert out.shape == (4, 4, 3)

    def test_device_input_returns_device_array(self, background, ones_layer):
        import jax
        import jax.numpy as jnp

        out = create_overlay(jnp.asarray(background), [Layer(CHAN_BLUE, ones_layer)])
        assert isinstance(out, jax.Array)


class TestEmptyLayers:
    def test_no_layers_returns_gray_rgb(self):
        """An empty layer list broadcasts the background to RGB unchanged."""
        bg = np.linspace(0, 1, 64 * 64).reshape(64, 64)
        out = create_overlay(bg, [])
        assert out.shape == (64, 64, 3)
        for c in range(3):
            np.testing.assert_allclose(out[..., c], bg, atol=1e-6)

    def test_overlay_channels_empty_dict(self):
        bg = np.full((32, 32), 0.5)
        out = overlay_channels(bg, {})
        assert out.shape == (32, 32, 3)
        np.testing.assert_allclose(out[..., 0], bg, atol=1e-6)
