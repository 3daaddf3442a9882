"""Parity tests for the core preprocessing ops against independent NumPy/SciPy
reference implementations (see tests/reference_impl.py)."""

import numpy as np
import pytest

import reference_impl as ref
from arcadia_microscopy_tools_tpu.operations import (
    apply_threshold,
    crop_to_center,
    rescale_by_percentile,
    subtract_background_dog,
)


@pytest.fixture
def cells_image(rng):
    """Synthetic uint16 image with bright blobs on a noisy background."""
    img = rng.normal(200, 30, size=(128, 128)).clip(0, None)
    yy, xx = np.mgrid[0:128, 0:128]
    for cy, cx, r, amp in [(30, 30, 9, 3000), (80, 90, 12, 2400), (100, 40, 7, 4000)]:
        blob = amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * (r / 2) ** 2))
        img += blob
    return img.astype(np.uint16)


class TestRescaleByPercentile:
    def test_full_range_maps_to_unit_interval(self, cells_image):
        out = rescale_by_percentile(cells_image)
        assert out.dtype == np.float64
        assert out.min() == pytest.approx(0.0)
        assert out.max() == pytest.approx(1.0)

    def test_matches_reference(self, cells_image):
        out = rescale_by_percentile(cells_image, (1, 99))
        p1, p2 = np.percentile(cells_image, (1, 99))
        expected = ref.rescale_intensity(cells_image, (p1, p2), (0, 1))
        np.testing.assert_allclose(out, expected, atol=2e-5)

    def test_custom_out_range(self, cells_image):
        out = rescale_by_percentile(cells_image, (0, 100), out_range=(10, 20))
        assert out.min() == pytest.approx(10.0)
        assert out.max() == pytest.approx(20.0)

    def test_invalid_percentile_range(self, cells_image):
        with pytest.raises(ValueError, match="Invalid percentile range"):
            rescale_by_percentile(cells_image, (50, 10))
        with pytest.raises(ValueError, match="Invalid percentile range"):
            rescale_by_percentile(cells_image, (-1, 99))

    def test_constant_image(self):
        img = np.full((16, 16), 100, dtype=np.uint16)
        out = rescale_by_percentile(img)
        np.testing.assert_array_equal(out, np.zeros((16, 16)))

    def test_empty_image(self):
        img = np.zeros((0, 4), dtype=np.uint16)
        out = rescale_by_percentile(img)
        assert out.shape == (0, 4)


class TestSubtractBackgroundDog:
    def test_matches_reference(self, cells_image):
        out = subtract_background_dog(cells_image, low_sigma=1.0, high_sigma=8.0)
        expected_dog = ref.difference_of_gaussians(cells_image, 1.0, 8.0)
        expected = np.clip(expected_dog - expected_dog.min(), 0, None)
        # float32 device accumulation vs float64 reference: tiny residual
        np.testing.assert_allclose(out, expected, atol=3e-4)

    def test_nonnegative(self, cells_image):
        out = subtract_background_dog(cells_image)
        assert out.min() >= 0.0
        assert out.dtype == np.float64

    def test_invalid_sigmas(self, cells_image):
        with pytest.raises(ValueError, match="low_sigma"):
            subtract_background_dog(cells_image, low_sigma=5, high_sigma=2)

    def test_invalid_percentile(self, cells_image):
        with pytest.raises(ValueError, match="Percentile"):
            subtract_background_dog(cells_image, percentile=150)

    def test_percentile_background(self, cells_image):
        out = subtract_background_dog(cells_image, percentile=50)
        # Half the filtered pixels sit below the background level -> many zeros
        assert (np.asarray(out) == 0).mean() > 0.4


class TestCropToCenter:
    def test_basic_crop(self, cells_image):
        out = crop_to_center(cells_image, (64, 32))
        assert out.shape == (64, 32)
        np.testing.assert_array_equal(np.asarray(out), cells_image[32:96, 48:80])

    def test_crop_larger_than_image(self, cells_image):
        out = crop_to_center(cells_image, (500, 500))
        assert out.shape == cells_image.shape

    def test_multidim(self, rng):
        stack = (rng.random((3, 5, 40, 40)) * 100).astype(np.uint16)
        out = crop_to_center(stack, (16, 20))
        assert out.shape == (3, 5, 16, 20)

    def test_preserves_dtype(self, cells_image):
        out = crop_to_center(cells_image, (10, 10))
        assert np.asarray(out).dtype == np.uint16


class TestApplyThresholdDispatch:
    def test_unsupported_method(self, cells_image):
        with pytest.raises(ValueError, match="Unsupported thresholding method"):
            apply_threshold(cells_image, method="bogus")

    def test_empty_image(self):
        out = apply_threshold(np.zeros((0, 3), dtype=np.uint16))
        assert out.shape == (0, 3)
        assert out.dtype == bool

    def test_constant_image_all_false(self):
        out = apply_threshold(np.full((8, 8), 7, dtype=np.uint16))
        assert not out.any()

    def test_returns_bool(self, cells_image):
        out = apply_threshold(cells_image, "otsu")
        assert out.dtype == bool
        assert out.shape == cells_image.shape
