"""Bit-level / tolerance parity of every thresholding method against the
published algorithms (tests/reference_impl.py). Integer-image global
thresholds must match exactly: they drive mask IoU parity for the BASELINE
classical-segmentation config."""

import numpy as np
import pytest

import reference_impl as ref
from arcadia_microscopy_tools_tpu.ops import threshold as th


def bimodal_uint16(rng, shape=(64, 64), lo=(200, 40), hi=(1800, 120), frac=0.3):
    n = int(np.prod(shape))
    n_hi = int(n * frac)
    a = rng.normal(lo[0], lo[1], n - n_hi)
    b = rng.normal(hi[0], hi[1], n_hi)
    img = np.concatenate([a, b]).clip(0, 65535).astype(np.uint16)
    rng.shuffle(img)
    return img.reshape(shape)


@pytest.fixture
def img(rng):
    return bimodal_uint16(rng)


@pytest.fixture
def img_float(img):
    return (img.astype(np.float32) / 65535.0).astype(np.float32)


class TestGlobalThresholdsInteger:
    def test_otsu_exact(self, img):
        assert float(th.threshold_otsu(img)) == ref.threshold_otsu(img)

    def test_isodata_exact(self, img):
        assert float(th.threshold_isodata(img)) == ref.threshold_isodata(img)

    def test_yen_exact(self, img):
        assert float(th.threshold_yen(img)) == ref.threshold_yen(img)

    def test_triangle_exact(self, img):
        assert float(th.threshold_triangle(img)) == ref.threshold_triangle(img)

    def test_mean_exact(self, img):
        assert float(th.threshold_mean(img)) == pytest.approx(ref.threshold_mean(img), rel=1e-6)

    def test_minimum_close(self, img):
        # The minimum method smooths the histogram thousands of times; float32
        # device accumulation picks a slightly different bin in the (flat)
        # valley than the float64 reference. Both are valid valley cuts, so
        # assert on the meaningful criterion: the resulting masks agree.
        ours = float(th.threshold_minimum(img))
        theirs = ref.threshold_minimum(img)
        mask_ours = img > ours
        mask_theirs = img > theirs
        assert (mask_ours == mask_theirs).mean() > 0.99

    def test_li_close(self, img):
        assert float(th.threshold_li(img)) == pytest.approx(ref.threshold_li(img), rel=1e-3)

    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
    def test_otsu_exact_many_seeds(self, seed):
        rng = np.random.default_rng(seed)
        img = bimodal_uint16(rng, frac=0.1 + 0.08 * seed)
        assert float(th.threshold_otsu(img)) == ref.threshold_otsu(img)

    def test_otsu_uint8(self, rng):
        img = (bimodal_uint16(rng) // 256).astype(np.uint8)
        assert float(th.threshold_otsu(img)) == ref.threshold_otsu(img)

    @pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16, 17, 18])
    def test_otsu_matches_brute_force(self, seed):
        """Ground-truth check that does NOT share code with reference_impl:
        Otsu is DEFINED as the split maximizing between-class variance, so
        an O(bins^2) direct evaluation is an independent oracle (this caught
        the round-3 reversed-cumsum off-by-one that reference_impl and the
        device kernel previously shared)."""
        rng = np.random.default_rng(seed)
        img = (bimodal_uint16(rng) // 256).astype(np.uint8)
        counts, centers = ref.histogram(img)
        best_v, best_t = -1.0, centers[0]
        total = counts.sum()
        for k in range(len(centers) - 1):
            w1 = counts[: k + 1].sum()
            w2 = total - w1
            if w1 == 0 or w2 == 0:
                continue
            m1 = (counts[: k + 1] * centers[: k + 1]).sum() / w1
            m2 = (counts[k + 1 :] * centers[k + 1 :]).sum() / w2
            v = w1 * w2 * (m1 - m2) ** 2
            if v > best_v:
                best_v, best_t = v, centers[k]
        assert ref.threshold_otsu(img) == best_t
        assert float(th.threshold_otsu(img)) == best_t


class TestGlobalThresholdsFloat:
    def test_otsu_float(self, img_float):
        ours = float(th.threshold_otsu(img_float))
        theirs = ref.threshold_otsu(img_float.astype(np.float64))
        assert ours == pytest.approx(theirs, rel=1e-4)

    def test_mean_float(self, img_float):
        assert float(th.threshold_mean(img_float)) == pytest.approx(
            float(img_float.mean()), rel=1e-5
        )


class TestLocalThresholds:
    def test_niblack(self, img):
        ours = np.asarray(th.threshold_niblack(img, window_size=15, k=0.2))
        theirs = ref.threshold_niblack(img, 15, 0.2)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=0.05)

    def test_sauvola(self, img):
        ours = np.asarray(th.threshold_sauvola(img, window_size=15, k=0.2))
        theirs = ref.threshold_sauvola(img, 15, 0.2)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=0.05)

    def test_sauvola_explicit_r(self, img):
        ours = np.asarray(th.threshold_sauvola(img, window_size=11, k=0.3, r=1000.0))
        theirs = ref.threshold_sauvola(img, 11, 0.3, r=1000.0)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=0.05)

    def test_local_mean(self, img):
        # skimage threshold_local passes scipy-mode 'reflect' to uniform_filter
        ours = np.asarray(th.threshold_local(img, block_size=9, method="mean"))
        from scipy import ndimage as ndi

        theirs = ndi.uniform_filter(img.astype(np.float64), 9, mode="reflect")
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=0.05)

    def test_local_gaussian_matches_scipy(self, img):
        from scipy import ndimage as ndi

        ours = np.asarray(th.threshold_local(img, block_size=25, method="gaussian"))
        sigma = (25 - 1) / 6.0
        theirs = ndi.gaussian_filter(img.astype(np.float64), sigma, mode="reflect")
        # float32 conv accumulation at uint16 scale: ~2e-3 relative residual
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=2.0)

    def test_odd_window_required(self, img):
        with pytest.raises(ValueError, match="odd"):
            th.threshold_local(img, block_size=10)


class TestMaskIoU:
    """End-to-end criterion: Otsu masks must be IDENTICAL for integer images."""

    @pytest.mark.parametrize("seed", [7, 8, 9])
    def test_otsu_mask_identical(self, seed):
        from arcadia_microscopy_tools_tpu.operations import apply_threshold

        rng = np.random.default_rng(seed)
        img = bimodal_uint16(rng, shape=(128, 128))
        ours = np.asarray(apply_threshold(img, "otsu"))
        theirs = img > ref.threshold_otsu(img)
        np.testing.assert_array_equal(ours, theirs)
