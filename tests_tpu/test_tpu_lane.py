"""Compiled-on-chip regression subset (round-2 VERDICT item 5).

Each test compiles and runs the real kernels on the attached TPU and checks
results against the CPU/NumPy oracles used by the main suite - the Pallas
kernels run through the actual Mosaic lowering here, not interpreter mode.
Shapes are kept small-but-realistic so the lane stays fast once the
persistent compile cache is warm.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _blobs(rng, h=256, w=256, n=12, amp=3000.0):
    img = rng.normal(200, 20, (h, w))
    yy, xx = np.mgrid[-12:13, -12:13]
    blob = amp * np.exp(-(yy**2 + xx**2) / (2 * 5.0**2))
    centers = []
    while len(centers) < n:
        cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
        if all((cy - y) ** 2 + (cx - x) ** 2 > 40**2 for y, x in centers):
            centers.append((cy, cx))
    for cy, cx in centers:
        img[cy - 12 : cy + 13, cx - 12 : cx + 13] += blob
    return np.clip(img, 0, 65535).astype(np.uint16), centers


class TestPallasCCCompiled:
    @pytest.mark.tpu_smoke
    def test_compiled_kernel_matches_xla_path(self, rng):
        """The Pallas block-local CC kernel, compiled by Mosaic on the chip,
        must produce the same labels as the pure-XLA sweep path."""
        from arcadia_microscopy_tools_tpu.ops.labeling import (
            _component_roots_impl,
            label,
        )

        mask = np.zeros((256, 256), bool)
        img, centers = _blobs(rng)
        mask = img > 2000
        # long serpentine component exercises the boundary merge
        mask[10, 10:200] = True
        mask[10:60, 199] = True
        mask[59, 40:200] = True

        fg = jnp.asarray(mask)
        roots_pallas, conv_p = _component_roots_impl(fg, 2, None, True)
        roots_xla, conv_x = _component_roots_impl(fg, 2, None, False)
        assert bool(conv_p) and bool(conv_x)
        np.testing.assert_array_equal(np.asarray(roots_pallas), np.asarray(roots_xla))

        lbl = np.asarray(label(mask))
        assert lbl.max() >= len(centers)

    def test_compiled_kernel_full_width_line(self):
        from arcadia_microscopy_tools_tpu.ops.labeling import label

        mask = np.zeros((128, 512), bool)
        mask[64, :] = True
        lbl = np.asarray(label(mask))
        assert lbl.max() == 1
        assert (lbl[64] == 1).all()


class TestPallasRankCompiled:
    @pytest.mark.tpu_smoke
    @pytest.mark.parametrize("window", [11, 15])
    def test_median_matches_scipy(self, rng, window):
        from scipy import ndimage as ndi

        from arcadia_microscopy_tools_tpu.ops.filters import median_filter

        img = (rng.random((256, 256)) * 4000).astype(np.float32)
        img[40:60, 40:90] -= 5000.0  # negatives exercise the key mapping
        ours = np.asarray(median_filter(jnp.asarray(img), window))
        ref = ndi.median_filter(img, size=window, mode="reflect")
        np.testing.assert_array_equal(ours, ref)


class TestFusedFrontendCompiled:
    @pytest.mark.tpu_smoke
    def test_fused_mask_equals_reference_chain(self, rng):
        """fused_classical_mask on-chip vs the oracle chain (DoG -> rescale
        -> otsu) from the test reference implementations."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))
        import reference_impl as ref

        from arcadia_microscopy_tools_tpu.ops.fused import fused_classical_mask

        img, _ = _blobs(rng)
        ours = np.asarray(fused_classical_mask(jnp.asarray(img)))

        dog = ref.difference_of_gaussians(img, 1.0, 16.0)
        p1, p2 = np.percentile(dog, (0.5, 99.9))
        resc = ref.rescale_intensity(dog, (p1, p2), (0.0, 1.0))
        q = (resc * 65535.0).astype(np.uint16)
        theirs = q > ref.threshold_otsu(q)
        agree = (ours == theirs).mean()
        assert agree > 0.9995, agree


class TestRegionpropsCompiled:
    def test_measure_labels_on_chip(self, rng):
        from arcadia_microscopy_tools_tpu.ops.labeling import label
        from arcadia_microscopy_tools_tpu.ops.regionprops import measure_labels

        img, centers = _blobs(rng)
        lbl = label(img > 2000)
        props = measure_labels(np.asarray(lbl), max_cells=64)
        areas = np.asarray(props["area"])
        valid = areas > 0
        assert valid.sum() == len(centers)
        # every blob core at this threshold is the disk where
        # 3000*exp(-d^2/(2*5^2)) > 1800, i.e. r ~ 5 px -> ~80 px area
        assert 50 < np.median(areas[valid]) < 150
        cys = np.asarray(props["centroid_y"])[valid]
        cxs = np.asarray(props["centroid_x"])[valid]
        found = {
            (int(round(y)), int(round(x))) for y, x in zip(cys, cxs)
        }
        for cy, cx in centers:
            assert any(abs(fy - cy) <= 2 and abs(fx - cx) <= 2 for fy, fx in found)


class TestPlateBatchCompiled:
    @pytest.mark.tpu_smoke
    def test_one_plate_batch_on_chip(self, rng):
        from arcadia_microscopy_tools_tpu.core.microplate import (
            MicroplateLayout,
            Well,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            PlateRunner,
        )

        wells = {}
        expected = {}
        for wid in ("A01", "A02"):
            img, centers = _blobs(rng)
            wells[wid] = np.stack([img, img])
            expected[wid] = len(centers)
        layout = MicroplateLayout([Well(id=w) for w in wells])
        runner = PlateRunner(PlateRunConfig(max_cells=64, min_size=20, batch_size=2))
        results = runner.run(layout, wells)
        assert not results.failed_wells
        for wid in wells:
            assert len(results.tables[wid]) == expected[wid]

    def test_unet_plate_batch_on_chip(self, rng):
        """The full deep well program (normalize -> S2D U-Net forward ->
        sparse flow tracking -> Pallas-diffusion QC -> compact measurement)
        through real Mosaic/XLA lowering on the chip."""
        import pathlib

        from arcadia_microscopy_tools_tpu.core.microplate import (
            MicroplateLayout,
            Well,
        )
        from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            PlateRunner,
        )

        ckpt = pathlib.Path(__file__).parents[1] / "checkpoints" / "unet"
        if not ckpt.exists():
            import pytest

            pytest.skip("trained checkpoint not present")
        from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells

        wells = {}
        for seed, wid in enumerate(("A01", "A02")):
            img, _ = synthesize_cells(
                np.random.default_rng(seed), (512, 512),
                n_cells=20, separation=0.95,
            )
            u16 = (img * 60000).astype(np.uint16)
            wells[wid] = np.stack([u16, u16])
        layout = MicroplateLayout([Well(id=w) for w in wells])
        runner = PlateRunner(
            PlateRunConfig(
                method="unet", max_cells=128, min_size=15,
                niter=200, flow_threshold=0.4, batch_size=2,
            ),
            unet_params=load_checkpoint(ckpt),
        )
        results = runner.run(layout, wells)
        assert not results.failed_wells
        for wid in wells:
            assert results.tables[wid] is not None
            assert len(results.tables[wid]) >= 10


class TestDiffusePallasCompiled:
    """flows_pallas.diffuse_pallas through real Mosaic lowering: the
    temporally-blocked stencil must be exactly equal to the dense XLA loop
    (same check as tests/test_models.py runs in interpreter mode)."""

    @pytest.mark.tpu_smoke
    def test_diffusion_parity_on_chip(self, rng):
        import jax.numpy as jnp

        from arcadia_microscopy_tools_tpu.models.flows_pallas import (
            diffuse_pallas,
            diffuse_xla,
        )

        H = 512
        yy, xx = np.mgrid[0:H, 0:H]
        lbl = np.zeros((H, H), np.int32)
        for k in range(1, 25):
            cy, cx = rng.integers(16, H - 16, 2)
            r = int(rng.integers(5, 15))
            lbl[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = k
        src = np.zeros((H, H), np.float32)
        for k in range(1, 25):
            ys, xs = np.where(lbl == k)
            if len(ys):
                src[ys[len(ys) // 2], xs[len(xs) // 2]] = 1.0
        a = np.asarray(diffuse_xla(jnp.asarray(lbl), jnp.asarray(src), 40))
        b = np.asarray(
            diffuse_pallas(jnp.asarray(lbl), jnp.asarray(src), 40, ts=256)
        )
        np.testing.assert_array_equal(a, b)

    def test_masks_to_flows_routes_through_kernel(self, rng):
        """masks_to_flows with the (opt-in) Pallas kernel forced on must
        produce the same flows as the default dense-XLA path."""
        import jax.numpy as jnp

        from arcadia_microscopy_tools_tpu.models import flows as F

        H = 256
        yy, xx = np.mgrid[0:H, 0:H]
        lbl = np.zeros((H, H), np.int32)
        for k, (cy, cx) in enumerate([(60, 60), (128, 128), (200, 100)], 1):
            lbl[(yy - cy) ** 2 + (xx - cx) ** 2 < 144] = k
        fl_a, _ = F.masks_to_flows(jnp.asarray(lbl), max_cells=8, n_iter=32)
        old = F._USE_PALLAS_DIFFUSE
        F._USE_PALLAS_DIFFUSE = True
        try:
            fl_b, _ = F.masks_to_flows(
                jnp.asarray(lbl), max_cells=8, n_iter=32
            )
        finally:
            F._USE_PALLAS_DIFFUSE = old
        np.testing.assert_allclose(
            np.asarray(fl_a), np.asarray(fl_b), atol=1e-6
        )
