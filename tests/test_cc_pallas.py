"""Pallas block-local CC kernel vs the XLA sweep path (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arcadia_microscopy_tools_tpu.ops.cc_pallas import PALLAS_CC_BLOCK, local_cc_pallas


def xla_local_fixpoint(mask: np.ndarray, block: int) -> np.ndarray:
    """Reference: in-block min-label fixpoint in plain numpy."""
    h, w = mask.shape
    sentinel = 1 << 30
    lbl = np.where(mask, np.arange(h * w).reshape(h, w), sentinel)
    changed = True
    while changed:
        new = lbl.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                src_y = slice(max(dy, 0), h + min(dy, 0))
                src_x = slice(max(dx, 0), w + min(dx, 0))
                dst_y = slice(max(-dy, 0), h + min(-dy, 0))
                dst_x = slice(max(-dx, 0), w + min(-dx, 0))
                cand = np.full((h, w), sentinel, dtype=np.int64)
                cand[dst_y, dst_x] = lbl[src_y, src_x]
                # block mask: the neighbor (at yy+dy, xx+dx) must lie in the
                # same block as the receiving pixel
                yy, xx = np.mgrid[0:h, 0:w]
                same_block = ((yy // block) == ((yy + dy).clip(0, h - 1) // block)) & (
                    (xx // block) == ((xx + dx).clip(0, w - 1) // block)
                )
                cand = np.where(same_block, cand, sentinel)
                new = np.minimum(new, cand)
        new = np.where(mask, new, sentinel)
        changed = bool((new != lbl).any())
        lbl = new
    return lbl


@pytest.fixture
def blob_mask(rng):
    from scipy import ndimage as ndi

    size = PALLAS_CC_BLOCK * 2
    noise = ndi.gaussian_filter(rng.random((size, size)), 4)
    return noise > np.quantile(noise, 0.8)


class TestPallasLocalCC:
    def test_matches_reference_fixpoint(self, blob_mask):
        out = np.asarray(
            local_cc_pallas(jnp.asarray(blob_mask), connectivity=2, interpret=True)
        )
        expected = xla_local_fixpoint(blob_mask, PALLAS_CC_BLOCK)
        np.testing.assert_array_equal(
            np.where(blob_mask, out, -1), np.where(blob_mask, expected, -1)
        )

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="multiple of"):
            local_cc_pallas(jnp.zeros((100, 100), bool), interpret=True)

    def test_full_label_with_pallas_flag(self, blob_mask):
        """End-to-end label() with the Pallas flag set falls back cleanly on
        CPU (kernel requires a non-CPU backend) and stays correct."""
        import reference_impl as ref
        from arcadia_microscopy_tools_tpu.ops import labeling

        labeling.use_pallas_local(True)
        try:
            ours = np.asarray(labeling.label(jnp.asarray(blob_mask)))
        finally:
            labeling.use_pallas_local(False)
        theirs = ref.label(blob_mask, connectivity=2)
        assert ours.max() == theirs.max()
        np.testing.assert_array_equal(ours > 0, theirs > 0)
