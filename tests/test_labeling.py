"""Connected-components labeling parity vs scipy.ndimage (8-connectivity,
scan-order label numbering) plus clear_border / relabel semantics."""

import numpy as np
import pytest

import reference_impl as ref
from arcadia_microscopy_tools_tpu.ops import clear_border, label, relabel_sequential


def random_blobs(rng, shape=(96, 96), density=0.35, smooth=2):
    from scipy import ndimage as ndi

    noise = rng.random(shape)
    smoothed = ndi.gaussian_filter(noise, smooth)
    return smoothed > np.quantile(smoothed, 1 - density)


class TestLabel:
    def test_single_blob(self):
        mask = np.zeros((16, 16), dtype=bool)
        mask[4:8, 4:8] = True
        lbl = np.asarray(label(mask))
        assert lbl.max() == 1
        np.testing.assert_array_equal(lbl > 0, mask)

    def test_two_blobs_scan_order(self):
        mask = np.zeros((16, 16), dtype=bool)
        mask[10:12, 2:4] = True  # later in scan order
        mask[2:4, 10:12] = True  # earlier in scan order
        lbl = np.asarray(label(mask))
        assert lbl[2, 10] == 1
        assert lbl[10, 2] == 2

    def test_diagonal_connectivity_8(self):
        mask = np.zeros((8, 8), dtype=bool)
        mask[2, 2] = True
        mask[3, 3] = True
        lbl8 = np.asarray(label(mask, connectivity=2))
        assert lbl8.max() == 1
        lbl4 = np.asarray(label(mask, connectivity=1))
        assert lbl4.max() == 2

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_scipy_random_blobs(self, seed):
        rng = np.random.default_rng(seed)
        mask = random_blobs(rng)
        ours = np.asarray(label(mask))
        theirs = ref.label(mask, connectivity=2)
        assert ours.max() == theirs.max()
        # identical partition: component memberships agree pixel-for-pixel
        np.testing.assert_array_equal(ours > 0, theirs > 0)
        # bijective label mapping
        pairs = set(zip(ours.ravel().tolist(), theirs.ravel().tolist()))
        ours_to_theirs = {}
        for a, b in pairs:
            assert ours_to_theirs.setdefault(a, b) == b

    @pytest.mark.parametrize("seed", [0, 1])
    def test_unchecked_fast_path_matches_scipy_on_blobs(self, seed):
        """checked=False must be exact for cell-like components (the plate
        hot path relies on it)."""
        rng = np.random.default_rng(seed)
        mask = random_blobs(rng, shape=(160, 160), density=0.3, smooth=3)
        ours = np.asarray(label(mask, checked=False))
        theirs = ref.label(mask, connectivity=2)
        assert ours.max() == theirs.max()
        np.testing.assert_array_equal(ours > 0, theirs > 0)
        pairs = set(zip(ours.ravel().tolist(), theirs.ravel().tolist()))
        mapping = {}
        for a, b in pairs:
            assert mapping.setdefault(a, b) == b

    def test_spiral_long_component(self):
        # Worst case for naive propagation: one long snaking component.
        mask = np.zeros((64, 64), dtype=bool)
        for i in range(0, 64, 4):
            mask[i, :] = True
            if (i // 4) % 2 == 0:
                mask[i : i + 4, -1] = True
            else:
                mask[i : i + 4, 0] = True
        ours = np.asarray(label(mask))
        assert ours.max() == 1

    def test_empty_mask(self):
        lbl = np.asarray(label(np.zeros((8, 8), dtype=bool)))
        assert lbl.max() == 0


class TestClearBorder:
    def test_removes_border_touching(self):
        mask = np.zeros((16, 16), dtype=bool)
        mask[0:3, 0:3] = True  # touches border
        mask[8:11, 8:11] = True  # interior
        lbl = np.asarray(label(mask))
        cleared = np.asarray(clear_border(lbl))
        assert cleared[1, 1] == 0
        assert cleared[9, 9] > 0

    def test_interior_untouched(self):
        mask = np.zeros((16, 16), dtype=bool)
        mask[5:8, 5:8] = True
        lbl = np.asarray(label(mask))
        np.testing.assert_array_equal(np.asarray(clear_border(lbl)), lbl)


class TestRelabelSequential:
    def test_gaps_compacted(self):
        lbl = np.zeros((8, 8), dtype=np.int64)
        lbl[1, 1] = 5
        lbl[4, 4] = 9
        lbl[6, 6] = 2
        out = np.asarray(relabel_sequential(lbl))
        assert out[6, 6] == 1  # smallest original label -> 1
        assert out[1, 1] == 2
        assert out[4, 4] == 3

    def test_already_sequential(self):
        lbl = np.zeros((8, 8), dtype=np.int64)
        lbl[1, 1] = 1
        lbl[4, 4] = 2
        np.testing.assert_array_equal(np.asarray(relabel_sequential(lbl)), lbl)

    def test_labels_far_above_pixel_count(self):
        """Arbitrary label magnitudes (e.g. global tracking ids) relabel
        exactly - they must not clamp into one cell (round-1 advisory)."""
        lbl = np.zeros((64, 64), dtype=np.int64)
        lbl[2:6, 2:6] = 5000
        lbl[20:24, 20:24] = 6000
        lbl[40:44, 40:44] = 2**30  # far beyond any pixel-count table
        out = np.asarray(relabel_sequential(lbl))
        assert out[3, 3] == 1
        assert out[21, 21] == 2
        assert out[41, 41] == 3
        assert out.max() == 3
        assert (out[lbl == 0] == 0).all()


class TestLongComponents:
    def test_full_width_line_unchecked(self):
        """A structure spanning many CC blocks converges within the merge
        cap even with checked=False (the 1-hop-per-iteration merge needs
        ~the component's block-graph diameter; regression for the old
        10-iteration cap)."""
        h = w = 1024
        mask = np.zeros((h, w), bool)
        mask[100, :] = True  # spans every block column
        lbl = np.asarray(label(mask, checked=False))
        assert lbl.max() == 1
        assert (lbl[100, :] == 1).all()

    def test_serpentine_matches_scipy_unchecked(self):
        """A connected snake threading up and down across block rows: one
        component, found without the checked fixpoint pass."""
        from scipy import ndimage as ndi

        h = w = 512
        mask = np.zeros((h, w), bool)
        for k, col in enumerate(range(8, w - 8, 16)):
            mask[8 : h - 8, col] = True  # vertical stroke
            # connector joining this stroke to the next, alternating ends
            row = h - 9 if k % 2 == 0 else 8
            mask[row, col : min(col + 17, w)] = True
        _, n_ref = ndi.label(mask, structure=np.ones((3, 3)))
        assert n_ref == 1  # geometry sanity: it really is one snake
        lbl = np.asarray(label(mask, checked=False))
        assert lbl.max() == 1
