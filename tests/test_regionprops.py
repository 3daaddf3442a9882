"""Region measurement parity: analytic disks (the reference's tier-2 fixture
strategy, test_masks.py:14-30) plus per-region comparison against independent
moment/perimeter reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from arcadia_microscopy_tools_tpu.ops import label, measure_intensity, measure_labels


def make_label_image(shape=(64, 64), cells=((32, 32, 8),)):
    lbl = np.zeros(shape, dtype=np.int32)
    for i, (cy, cx, r) in enumerate(cells, start=1):
        lbl[ref.disk_mask(shape, cy, cx, r)] = i
    return lbl


def trimmed(props, key):
    valid = np.asarray(props["valid"])
    return np.asarray(props[key])[valid]


class TestMorphologyProps:
    def test_disk_area_and_centroid(self):
        lbl = make_label_image(cells=[(20, 24, 7), (45, 40, 10)])
        props = measure_labels(lbl, max_cells=8)
        areas = trimmed(props, "area")
        cys = trimmed(props, "centroid_y")
        cxs = trimmed(props, "centroid_x")
        exp0 = ref.disk_mask((64, 64), 20, 24, 7).sum()
        exp1 = ref.disk_mask((64, 64), 45, 40, 10).sum()
        np.testing.assert_allclose(areas, [exp0, exp1])
        np.testing.assert_allclose(cys, [20, 45], atol=0.01)
        np.testing.assert_allclose(cxs, [24, 40], atol=0.01)

    def test_circularity_of_disk(self):
        lbl = make_label_image(cells=[(32, 32, 10)])
        props = measure_labels(lbl, max_cells=4)
        area = trimmed(props, "area")[0]
        perim = trimmed(props, "perimeter")[0]
        circularity = 4 * np.pi * area / perim**2
        assert circularity > 0.85

    def test_perimeter_matches_reference(self):
        lbl = make_label_image(cells=[(20, 20, 9), (45, 45, 6)])
        props = measure_labels(lbl, max_cells=8)
        perims = trimmed(props, "perimeter")
        for k, expected_label in enumerate([1, 2], start=0):
            expected = ref.perimeter(lbl == expected_label)
            assert perims[k] == pytest.approx(expected, rel=1e-5)

    def test_perimeter_matches_reference_random_blobs(self, rng):
        from scipy import ndimage as ndi

        noise = ndi.gaussian_filter(rng.random((96, 96)), 2.5)
        mask = noise > np.quantile(noise, 0.7)
        lbl = np.asarray(label(mask))
        n = lbl.max()
        props = measure_labels(lbl, max_cells=64)
        perims = trimmed(props, "perimeter")
        for k in range(n):
            expected = ref.perimeter(lbl == k + 1)
            assert perims[k] == pytest.approx(expected, rel=1e-4), f"label {k+1}"

    def test_ellipse_axes_and_orientation(self):
        # Axis-aligned ellipse with known semi-axes
        yy, xx = np.mgrid[0:80, 0:80]
        ellipse = ((yy - 40) / 18.0) ** 2 + ((xx - 40) / 9.0) ** 2 <= 1
        lbl = ellipse.astype(np.int32)
        props = measure_labels(lbl, max_cells=4)
        expected = ref.region_moments(ellipse)
        assert trimmed(props, "axis_major_length")[0] == pytest.approx(
            expected["axis_major_length"], rel=1e-4
        )
        assert trimmed(props, "axis_minor_length")[0] == pytest.approx(
            expected["axis_minor_length"], rel=1e-4
        )
        assert trimmed(props, "eccentricity")[0] == pytest.approx(
            expected["eccentricity"], rel=1e-4
        )
        assert trimmed(props, "orientation")[0] == pytest.approx(
            expected["orientation"], abs=1e-4
        )
        # analytic: major/minor ratio ~2, eccentricity ~ sqrt(1 - 1/4)
        ratio = (
            trimmed(props, "axis_major_length")[0] / trimmed(props, "axis_minor_length")[0]
        )
        assert ratio == pytest.approx(2.0, rel=0.03)

    def test_rotated_ellipse_orientation(self):
        yy, xx = np.mgrid[0:100, 0:100]
        theta = np.deg2rad(30)
        yr = (yy - 50) * np.cos(theta) - (xx - 50) * np.sin(theta)
        xr = (yy - 50) * np.sin(theta) + (xx - 50) * np.cos(theta)
        ellipse = (yr / 20.0) ** 2 + (xr / 8.0) ** 2 <= 1
        props = measure_labels(ellipse.astype(np.int32), max_cells=4)
        expected = ref.region_moments(ellipse)
        assert trimmed(props, "orientation")[0] == pytest.approx(
            expected["orientation"], abs=1e-3
        )

    def test_bbox(self):
        lbl = make_label_image(cells=[(20, 24, 5)])
        props = measure_labels(lbl, max_cells=4)
        assert trimmed(props, "bbox_min_row")[0] == 15
        assert trimmed(props, "bbox_max_row")[0] == 26
        assert trimmed(props, "bbox_min_col")[0] == 19
        assert trimmed(props, "bbox_max_col")[0] == 30

    def test_valid_mask_padding(self):
        lbl = make_label_image(cells=[(20, 24, 5)])
        props = measure_labels(lbl, max_cells=16)
        valid = np.asarray(props["valid"])
        assert valid.sum() == 1
        assert valid[0]
        assert not valid[1:].any()


class TestIntensityProps:
    def test_constant_region(self):
        lbl = make_label_image(cells=[(32, 32, 6)])
        img = np.where(lbl > 0, 500, 10).astype(np.uint16)
        props = measure_intensity(lbl, img, max_cells=4)
        assert np.asarray(props["intensity_mean"])[0] == 500
        assert np.asarray(props["intensity_max"])[0] == 500
        assert np.asarray(props["intensity_min"])[0] == 500
        assert np.asarray(props["intensity_std"])[0] == 0

    def test_matches_numpy(self, rng):
        lbl = make_label_image(cells=[(20, 20, 7), (45, 45, 9)])
        img = (rng.random((64, 64)) * 1000).astype(np.uint16)
        props = measure_intensity(lbl, img, max_cells=8)
        for k in (1, 2):
            vals = img[lbl == k].astype(np.float64)
            assert np.asarray(props["intensity_mean"])[k - 1] == pytest.approx(
                vals.mean(), rel=1e-5
            )
            assert np.asarray(props["intensity_max"])[k - 1] == vals.max()
            assert np.asarray(props["intensity_min"])[k - 1] == vals.min()
            assert np.asarray(props["intensity_std"])[k - 1] == pytest.approx(
                vals.std(), rel=1e-4
            )


class TestIntensityStdPrecision:
    """Uniform regions at uint16-scale intensities must read std ~= 0.

    Raw sum-of-squares accumulation loses ~16 bits through the bf16 split
    and the E[x^2] - E[x]^2 cancellation then amplifies the rounding into a
    phantom standard deviation of ~100 counts; the centered second pass
    keeps it at numerical zero.
    """

    def test_uniform_bright_region_zero_std(self):
        lbl = np.zeros((64, 64), np.int32)
        lbl[8:40, 8:40] = 1
        img = np.where(lbl > 0, 50000, 120).astype(np.uint16)
        stats = measure_intensity(lbl, img, max_cells=4)
        assert float(stats["intensity_mean"][0]) == 50000.0
        assert float(stats["intensity_std"][0]) < 1.0

    def test_uniform_bright_region_compacted_path(self):
        import jax.numpy as jnp

        from arcadia_microscopy_tools_tpu.ops.compaction import compact_by_root
        from arcadia_microscopy_tools_tpu.ops.labeling import component_roots
        from arcadia_microscopy_tools_tpu.ops.regionprops import measure_compacted

        mask = np.zeros((128, 128), bool)
        mask[16:80, 16:80] = True
        roots, _ = component_roots(jnp.asarray(mask))
        comp = compact_by_root(roots, 8192)
        stack = np.where(mask, 60000, 50)[None].astype(np.uint16)
        props, intensity = measure_compacted(
            comp.seg, comp.idx, roots, jnp.asarray(stack), 16, 128
        )
        assert float(np.asarray(intensity[0]["intensity_mean"])[0]) == 60000.0
        assert float(np.asarray(intensity[0]["intensity_std"])[0]) < 1.0

    def test_true_std_still_correct(self, rng=np.random.default_rng(5)):
        lbl = np.zeros((64, 64), np.int32)
        lbl[4:60, 4:60] = 1
        noise = rng.normal(30000, 500, (64, 64))
        img = np.clip(noise, 0, 65535).astype(np.uint16)
        stats = measure_intensity(lbl, img, max_cells=4)
        region = img[lbl > 0].astype(np.float64)
        np.testing.assert_allclose(
            float(stats["intensity_std"][0]), region.std(), rtol=2e-3
        )


class TestTableLookupMatmul:
    """ops/segment_reduce.table_lookup_matmul: the MXU one-hot lookup must be
    bit-exact against the plain gather for every 32-bit payload class."""

    def test_f32_bit_exact_incl_nonfinite(self):
        from arcadia_microscopy_tools_tpu.ops.segment_reduce import table_lookup_matmul

        rng = np.random.default_rng(0)
        tab = (rng.standard_normal(1025) * 1e6).astype(np.float32)
        tab[3] = np.inf
        tab[5] = -np.inf
        tab[7] = np.nan
        tab[9] = -0.0
        ids = rng.integers(0, 1025, 200_003).astype(np.int32)
        got = np.asarray(table_lookup_matmul(jnp.asarray(tab), jnp.asarray(ids)))
        np.testing.assert_array_equal(
            got.view(np.uint32), tab[ids].view(np.uint32)
        )

    def test_multi_table_int32(self):
        from arcadia_microscopy_tools_tpu.ops.segment_reduce import table_lookup_matmul

        rng = np.random.default_rng(1)
        tabs = rng.integers(-(2**31), 2**31 - 1, (3, 517), dtype=np.int32)
        ids = rng.integers(0, 517, 10_001).astype(np.int32)
        got = np.asarray(table_lookup_matmul(jnp.asarray(tabs), jnp.asarray(ids)))
        np.testing.assert_array_equal(got, tabs[:, ids])

    def test_out_of_range_ids_zero(self):
        from arcadia_microscopy_tools_tpu.ops.segment_reduce import table_lookup_matmul

        tab = jnp.asarray(np.arange(1, 9, dtype=np.int32))
        ids = jnp.asarray(np.array([0, 7, 8, 100], np.int32))
        got = np.asarray(table_lookup_matmul(tab, ids))
        np.testing.assert_array_equal(got, [1, 8, 0, 0])
