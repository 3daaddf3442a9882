"""On-chip lane, part 2 (round-3 VERDICT item 7).

Full-size (2048^2) threshold and regionprops parity against the clean-room
NumPy reference implementations, capacity-escalation through the real plate
runner, sparse-vs-dense compute_masks equivalence through Mosaic/XLA
lowering, the multi-host mesh program compiled on the real chip (1-host
degenerate case), S2D forward parity at production dtype, and the pinned
golden-fixture classical masks recomputed on the chip.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))
sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))

import reference_impl as ref  # noqa: E402

REPO = Path(__file__).parents[1]


def _cells_2048(rng, n=300, h=2048):
    img = rng.normal(150, 15, (h, h)).clip(0, None)
    yy, xx = np.mgrid[0:48, 0:48]
    blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
    for _ in range(n):
        cy, cx = rng.integers(24, h - 24, 2)
        img[cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
    return img.astype(np.uint16)


class TestThresholdParity2048:
    """Histogram thresholds at the production 2048^2 size, compiled on the
    chip, vs the NumPy float64 reference.

    Tolerance note (measured on v5e): the criterion maximization runs in
    f32 on TPU (no f64), and at 4.2M pixels the bin-weighted moment sums
    reach ~2.7e11 - beyond f32's 24-bit exactness - so a knife-edge argmax
    can land one bin away from the f64 reference (Otsu measured 991 vs
    992/65535 on this image). One 16-bit bin flips only the handful of
    pixels in that bin; the gate is <= 1 bin for bin-valued methods and
    1e-4 relative for the iterative/float ones."""

    @pytest.mark.parametrize("method", ["otsu", "li", "yen", "triangle", "mean"])
    def test_global_methods(self, rng, method):
        from arcadia_microscopy_tools_tpu.ops.threshold import _GLOBAL_METHODS

        img = _cells_2048(rng)
        ours = float(_GLOBAL_METHODS[method](jnp.asarray(img)))
        theirs = float(getattr(ref, f"threshold_{method}")(img))
        if method in ("otsu", "yen", "triangle", "minimum", "isodata"):
            assert abs(ours - theirs) <= 1.0, (method, ours, theirs)
        else:
            assert ours == pytest.approx(theirs, rel=1e-4), (method, ours, theirs)

    def test_niblack_sauvola_1024(self, rng):
        """Windowed thresholds vs the f64 reference at 1024^2. This test
        caught a real conditioning bug in round 4: the one-pass 2-D
        integral image lost up to 19% of the variance in f32 (see
        `filters._box_sum_last2`); the per-axis sliding form keeps the
        error at ~1e-4 of the threshold value."""
        from arcadia_microscopy_tools_tpu.ops.threshold import (
            threshold_niblack,
            threshold_sauvola,
        )

        img = _cells_2048(rng, n=80, h=1024).astype(np.float64)
        for ours_fn, ref_fn, rtol in (
            # measured post-fix on v5e: niblack 9e-5 rel; sauvola 3.7e-3 -
            # its threshold scales with std/r (r=1 for float images), and
            # the one-pass f32 variance cancels E[x^2]-mean^2 where
            # mean >> std (inside bright cells). skimage computes in f64;
            # an f32 device pays this irreducibly.
            (threshold_niblack, ref.threshold_niblack, 1e-3),
            (threshold_sauvola, ref.threshold_sauvola, 1e-2),
        ):
            ours = np.asarray(ours_fn(jnp.asarray(img), window_size=15))
            theirs = ref_fn(img, window_size=15)
            np.testing.assert_allclose(ours, theirs, rtol=rtol, atol=0.2)


class TestRegionpropsParity2048:
    def test_measure_labels_vs_reference(self, rng):
        """Morphology at 2048^2 on the chip vs the NumPy reference: area and
        centroid exact, perimeter/eccentricity within documented tolerance."""
        from arcadia_microscopy_tools_tpu.ops.labeling import label
        from arcadia_microscopy_tools_tpu.ops.regionprops import measure_labels

        img = _cells_2048(rng, n=120)
        mask = img > 2000
        lbl = np.asarray(label(mask, checked=False))
        props = measure_labels(lbl, max_cells=512)
        areas = np.asarray(props["area"])
        valid = areas > 0
        k = int(valid.sum())
        assert k >= 100
        # NumPy oracle per label (vectorized bincount moments)
        flat = lbl.ravel()
        counts = np.bincount(flat, minlength=k + 1)
        ys, xs = np.mgrid[0 : lbl.shape[0], 0 : lbl.shape[1]]
        sy = np.bincount(flat, weights=ys.ravel(), minlength=k + 1)
        sx = np.bincount(flat, weights=xs.ravel(), minlength=k + 1)
        np.testing.assert_array_equal(areas[valid], counts[1 : k + 1])
        np.testing.assert_allclose(
            np.asarray(props["centroid_y"])[valid], sy[1 : k + 1] / counts[1 : k + 1],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(props["centroid_x"])[valid], sx[1 : k + 1] / counts[1 : k + 1],
            rtol=1e-5,
        )
        # spot-check perimeter against the reference Crofton implementation
        for lab in (1, k // 2, k):
            binary = lbl == lab
            expect = ref.perimeter(binary)
            got = float(np.asarray(props["perimeter"])[lab - 1])
            assert got == pytest.approx(expect, rel=1e-3), lab


class TestCapacityEscalationOnChip:
    def test_plate_escalates_dense_well(self, rng):
        """A well denser than the configured max_cells must transparently
        re-dispatch at escalated capacity and come back complete."""
        from arcadia_microscopy_tools_tpu.core.microplate import (
            MicroplateLayout,
            Well,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            PlateRunner,
        )

        img = _cells_2048(rng, n=60, h=512)
        wells = {"A01": np.stack([img, img])}
        layout = MicroplateLayout([Well(id="A01")])
        # max_cells=16 < ~60 blobs: first dispatch reports capacity overflow,
        # the runner escalates 4x (64) and succeeds
        runner = PlateRunner(
            PlateRunConfig(max_cells=16, min_size=20, batch_size=1)
        )
        results = runner.run(layout, wells)
        assert not results.failed_wells
        assert len(results.tables["A01"]) > 16


class TestSparseDenseEquivalenceOnChip:
    def test_compute_masks_sparse_equals_dense(self, rng):
        """The compact-domain flow path (production) vs the dense reference
        path, both compiled on the chip, must agree exactly."""
        from arcadia_microscopy_tools_tpu.models import flows as F

        h = w = 512
        yy, xx = np.mgrid[0:h, 0:w]
        out = np.zeros((h, w, 3), np.float32)
        out[..., 2] = -4.0
        for cy, cx in [(100, 100), (160, 130), (300, 300), (420, 90), (256, 400)]:
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            inside = d2 < 900
            out[..., 0] = np.where(inside, np.clip((cy - yy) / 6.0, -5, 5) * 5, out[..., 0])
            out[..., 1] = np.where(inside, np.clip((cx - xx) / 6.0, -5, 5) * 5, out[..., 1])
            out[..., 2] = np.where(inside, 4.0, out[..., 2])
        o = jnp.asarray(out)
        dense = np.asarray(
            F.compute_masks(o, flow_threshold=0.4, niter=100, max_cells=64)
        )
        cm = F.compute_masks_sparse_compact(
            o, cap=65536, flow_threshold=0.4, niter=100, max_cells=64, min_size=15
        )
        np.testing.assert_array_equal(dense, np.asarray(cm.labels))


class TestMultihostMeshOnChip:
    def test_one_host_degenerate_mesh_program(self, rng):
        """The (hosts, wells, space) multi-host mesh program compiled on the
        real chip - 1x1x1 degenerate topology - must execute and match the
        flat-mesh program exactly."""
        from jax.sharding import NamedSharding, PartitionSpec

        from arcadia_microscopy_tools_tpu.parallel.mesh import (
            MeshConfig,
            create_mesh,
            create_multihost_mesh,
            plate_sharding_multihost,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            _build_well_program,
        )

        cfg = PlateRunConfig(max_cells=64, min_size=4)
        well_fn = _build_well_program(cfg, n_channels=2)
        wells = jnp.asarray(
            (rng.random((2, 2, 256, 256)) * 4000).astype(np.uint16)
        )

        mh = create_multihost_mesh(1, MeshConfig(n_devices=1))
        mh_prog = jax.jit(
            jax.vmap(well_fn), in_shardings=(plate_sharding_multihost(mh),)
        )
        packed_mh, health_mh = mh_prog(
            jax.device_put(wells, plate_sharding_multihost(mh))
        )

        flat = create_mesh(MeshConfig(n_devices=1))
        flat_prog = jax.jit(
            jax.vmap(well_fn),
            in_shardings=(NamedSharding(flat, PartitionSpec("wells")),),
        )
        packed_f, health_f = flat_prog(wells)
        np.testing.assert_array_equal(np.asarray(packed_mh), np.asarray(packed_f))
        np.testing.assert_array_equal(np.asarray(health_mh), np.asarray(health_f))


class TestS2DForwardOnChip:
    def test_s2d_matches_plain_at_bf16(self, rng):
        """apply_unet_s2d (stem convs + split decoder kernels + transposed-
        conv depth-to-space) vs apply_unet through real XLA:TPU lowering."""
        from arcadia_microscopy_tools_tpu.models.unet import (
            UNetConfig,
            apply_unet,
            init_unet,
        )
        from arcadia_microscopy_tools_tpu.models.unet_s2d import (
            apply_unet_s2d,
            s2d_params,
        )

        params = init_unet(jax.random.PRNGKey(0), UNetConfig())
        sp = s2d_params(params)
        x = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
        a = np.asarray(apply_unet(params, x))
        b = np.asarray(apply_unet_s2d(sp, x))
        # atol calibrated on-chip: TPU bf16 rounding leaves a handful of
        # elements (2/49k measured) between 0.1 and 0.15
        np.testing.assert_allclose(a, b, atol=0.2, rtol=0.05)
        decided = np.abs(a[..., 2]) > 0.25
        assert ((a[..., 2] > 0) == (b[..., 2] > 0))[decided].all()

    @pytest.mark.tpu_smoke
    def test_pallas_gn_matches_xla_gn_on_chip(self, rng):
        """group_norm_pallas through real Mosaic lowering (including the
        revisited-output accumulation and the sequential_vmap rule under
        jax.vmap, the plate path's mapping) vs the XLA GroupNorm."""
        from arcadia_microscopy_tools_tpu.models.gn_pallas import (
            gn_pallas_viable,
            group_norm_pallas,
        )
        from arcadia_microscopy_tools_tpu.models.unet import _group_norm

        assert gn_pallas_viable((2, 64, 64, 128))
        x = jnp.asarray(
            rng.normal(1.0, 2.0, (2, 64, 64, 128)).astype(np.float32)
        )
        scale = jnp.asarray(rng.random(128).astype(np.float32) + 0.5)
        bias = jnp.asarray(rng.random(128).astype(np.float32))
        for dt, rtol, atol in ((jnp.float32, 2e-5, 2e-5), (jnp.bfloat16, 1e-2, 0.04)):
            xd = x.astype(dt)
            a = np.asarray(_group_norm(xd, scale, bias, 8), np.float32)
            b = np.asarray(group_norm_pallas(xd, scale, bias, 8), np.float32)
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        # vmapped (sequential_vmap) path
        a = np.asarray(
            jax.jit(jax.vmap(lambda v: _group_norm(v[None], scale, bias, 8)[0]))(x)
        )
        b = np.asarray(
            jax.jit(
                jax.vmap(lambda v: group_norm_pallas(v[None], scale, bias, 8)[0])
            )(x)
        )
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    def test_s2d_forward_pallas_gn_parity_on_chip(self, rng):
        """The full S2D forward with the Pallas GroupNorm (the production
        plate configuration) vs the same forward with XLA GroupNorm."""
        from arcadia_microscopy_tools_tpu.models.unet import UNetConfig, init_unet
        from arcadia_microscopy_tools_tpu.models.unet_s2d import (
            apply_unet_s2d,
            s2d_params,
        )

        params = init_unet(jax.random.PRNGKey(0), UNetConfig())
        sp = s2d_params(params)
        x = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
        a = np.asarray(apply_unet_s2d(sp, x, pallas_gn=False))
        b = np.asarray(apply_unet_s2d(sp, x, pallas_gn=True))
        np.testing.assert_allclose(a, b, atol=0.2, rtol=0.05)
        decided = np.abs(a[..., 2]) > 0.25
        assert ((a[..., 2] > 0) == (b[..., 2] > 0))[decided].all()


class TestGoldenFixtureOnChip:
    @pytest.mark.tpu_smoke
    def test_classical_golden_masks_match_on_chip(self):
        """The pinned golden classical masks (tests/data/golden_masks/*,
        generated on CPU) recomputed through the TPU compile path.

        Gate is 0.98 fg-IoU, not pixel-exact: the Otsu criterion runs in
        f32 on TPU and a knife-edge argmax can land one 16-bit bin from the
        CPU/f64 result, flipping the few pixels in that bin (measured
        fg-IoU 0.991 on the 64^2 timelapse fixture). Cell counts must still
        match exactly."""
        from pin_golden_masks import segment_fixture

        golden_dir = REPO / "tests" / "data" / "golden_masks"
        for stem in ("example-multichannel", "example-timelapse"):
            golden = np.load(golden_dir / f"{stem}.npz")["classical"]
            classical, _ = segment_fixture(REPO / "tests" / "data" / f"{stem}.nd2")
            a, b = golden > 0, classical > 0
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou >= 0.98, (stem, iou)
            assert int(classical.max()) == int(golden.max())


class TestNormalizePercentilesOnChip:
    def test_histogram_percentiles_match_numpy(self, rng):
        """The deep path's histogram-based percentile normalization must
        reproduce np.percentile exactly on uint16 data at 2048^2."""
        from arcadia_microscopy_tools_tpu.ops.fused import _percentile_from_cum
        from arcadia_microscopy_tools_tpu.ops.stats import histogram_int

        img = _cells_2048(rng)
        x = jnp.asarray(img)
        counts, _ = histogram_int(x, 65536)
        cum = jnp.cumsum(counts.astype(jnp.float32))
        for q in (1.0, 50.0, 99.0):
            ours = float(_percentile_from_cum(cum, q, img.size))
            theirs = float(np.percentile(img, q))
            assert ours == pytest.approx(theirs, abs=1e-3), q
