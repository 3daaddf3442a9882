"""Native C++ geometry kernels vs their Python fallbacks."""

import numpy as np
import pytest

import reference_impl as ref
from arcadia_microscopy_tools_tpu import _native


def make_labels(rng, shape=(96, 96), n=6):
    from scipy import ndimage as ndi

    noise = ndi.gaussian_filter(rng.random(shape), 3)
    mask = noise > np.quantile(noise, 0.72)
    lbl, _ = ndi.label(mask, structure=np.ones((3, 3)))
    return lbl.astype(np.int64)


needs_native = pytest.mark.skipif(not _native.available(), reason="native lib not built")


@needs_native
class TestNativeConvex:
    def test_matches_reference(self, rng):
        lbl = make_labels(rng)
        got = _native.convex_areas(lbl)
        assert got is not None
        for k in range(1, int(lbl.max()) + 1):
            expected = ref.convex_area(lbl == k)
            area = (lbl == k).sum()
            assert got[k - 1] >= area - 1  # hull contains the region
            assert abs(got[k - 1] - expected) <= 0.05 * expected + 5

    def test_disk_exact(self):
        lbl = ref.disk_mask((40, 40), 20, 20, 9).astype(np.int64)
        got = _native.convex_areas(lbl)
        # a disk is convex: hull pixel count equals the disk area
        assert got[0] == lbl.sum()


@needs_native
class TestNativeOutlines:
    def test_trace_count_and_membership(self, rng):
        lbl = make_labels(rng)
        outlines = _native.trace_outlines(lbl)
        assert outlines is not None
        assert len(outlines) == int(lbl.max())
        for k, outline in enumerate(outlines, start=1):
            if len(outline) == 0:
                continue
            ys = outline[:, 0].astype(int)
            xs = outline[:, 1].astype(int)
            # every traced pixel belongs to its label
            assert (lbl[ys, xs] == k).all()

    def test_closed_loop_on_disk(self):
        lbl = ref.disk_mask((40, 40), 20, 20, 8).astype(np.int64)
        outline = _native.trace_outlines(lbl)[0]
        d = np.hypot(outline[:, 0] - 20, outline[:, 1] - 20)
        assert abs(d.mean() - 8) < 1.2

    def test_used_by_segmentation_mask(self, rng):
        from arcadia_microscopy_tools_tpu.masks import SegmentationMask

        lbl = make_labels(rng)
        if lbl.max() == 0:
            pytest.skip("no labels")
        sm = SegmentationMask(mask_image=lbl, remove_edge_cells=False)
        outlines = sm.cell_outlines
        assert len(outlines) == sm.num_cells


class TestDeinterleave:
    def test_matches_numpy_transpose(self, rng):
        from arcadia_microscopy_tools_tpu import _native

        if not _native.available():
            pytest.skip("native library not built")
        for c in (2, 3, 4, 5):
            frame = (rng.random((37, 53, c)) * 60000).astype(np.uint16)
            src = np.ascontiguousarray(frame).reshape(-1)
            dst = np.empty(c * 37 * 53, dtype=np.uint16)
            assert _native.deinterleave_u16(src, 37 * 53, c, dst)
            expected = frame.transpose(2, 0, 1).reshape(-1)
            np.testing.assert_array_equal(dst, expected)
