"""Mesh/sharding tests on the 8-virtual-device CPU mesh: halo exchange and
sharded reductions must equal their single-chip counterparts exactly, and the
plate runner must shard, isolate failures, and resume from checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

import reference_impl as ref
from arcadia_microscopy_tools_tpu.core.microplate import MicroplateLayout, Well
from arcadia_microscopy_tools_tpu.exceptions import SegmentationWarning
from arcadia_microscopy_tools_tpu.parallel import (
    MeshConfig,
    PlateRunConfig,
    PlateRunner,
    create_mesh,
    halo_exchange,
    sharded_gaussian_filter,
    sharded_otsu_threshold,
)
from arcadia_microscopy_tools_tpu.parallel.mesh import SPACE_AXIS, WELL_AXIS


def synth_well(rng, n_channels=2, size=128, n_cells=8):
    yy, xx = np.mgrid[0:size, 0:size]
    img = rng.normal(150, 15, (n_channels, size, size)).clip(0, None)
    centers: list[tuple[int, int]] = []
    while len(centers) < n_cells:
        cy, cx = rng.integers(16, size - 16, 2)
        # keep blobs separated so the expected cell count is deterministic
        if all((cy - oy) ** 2 + (cx - ox) ** 2 > 24**2 for oy, ox in centers):
            centers.append((int(cy), int(cx)))
    for cy, cx in centers:
        blob = 2500 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 30.0)
        img[0] += blob
        img[1] += blob * rng.uniform(0.2, 1.0)
    return img.astype(np.uint16)


class TestMesh:
    def test_create_mesh_all_devices(self):
        mesh = create_mesh()
        assert mesh.shape[WELL_AXIS] == 8
        assert mesh.shape[SPACE_AXIS] == 1

    def test_space_parallelism(self):
        mesh = create_mesh(MeshConfig(space_parallelism=4))
        assert mesh.shape[WELL_AXIS] == 2
        assert mesh.shape[SPACE_AXIS] == 4

    def test_bad_space_parallelism(self):
        with pytest.raises(ValueError, match="must divide"):
            create_mesh(MeshConfig(space_parallelism=3))

    def test_multihost_mesh_axes(self):
        from arcadia_microscopy_tools_tpu.parallel.mesh import (
            HOST_AXIS,
            create_multihost_mesh,
        )

        mesh = create_multihost_mesh(2)
        assert mesh.shape[HOST_AXIS] == 2
        assert mesh.shape[WELL_AXIS] == 4
        assert mesh.shape[SPACE_AXIS] == 1
        with pytest.raises(ValueError, match="must divide"):
            create_multihost_mesh(3)

    def test_multihost_spatial_sharding_matches(self, rng):
        """(hosts=2, wells=2, space=2): the fully-composed layout still
        reproduces the plain run bit-for-bit."""
        import jax

        from arcadia_microscopy_tools_tpu.parallel.mesh import (
            create_multihost_mesh,
            plate_sharding_multihost,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            _build_well_program,
        )

        config = PlateRunConfig(max_cells=32, min_size=4)
        wells = jnp.asarray((rng.random((4, 2, 64, 64)) * 4000).astype(np.uint16))

        plain = jax.jit(jax.vmap(_build_well_program(config, n_channels=2)))
        a_packed, a_health = plain(wells)

        mesh = create_multihost_mesh(2, MeshConfig(space_parallelism=2))
        sh = plate_sharding_multihost(mesh, spatial=True)
        sp_fn = _build_well_program(config, n_channels=2, spatial=True)
        prog = jax.jit(jax.vmap(sp_fn), in_shardings=(sh,))
        b_packed, b_health = prog(jax.device_put(wells, sh))

        np.testing.assert_array_equal(np.asarray(a_packed), np.asarray(b_packed))
        np.testing.assert_array_equal(np.asarray(a_health), np.asarray(b_health))

    def test_multihost_plate_program_matches_single_axis(self, rng):
        """A (hosts, wells) mesh run of the fused well program must be
        bit-identical to the plain wells-axis run - the DCN axis is a layout
        choice, never a semantics change."""
        import jax

        from arcadia_microscopy_tools_tpu.parallel.mesh import (
            create_multihost_mesh,
            plate_sharding_multihost,
            well_sharding,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            _build_well_program,
        )

        config = PlateRunConfig(max_cells=32, min_size=4)
        well_fn = _build_well_program(config, n_channels=2)
        wells = jnp.asarray((rng.random((8, 2, 64, 64)) * 4000).astype(np.uint16))

        mesh1 = create_mesh()
        p1 = jax.jit(jax.vmap(well_fn), in_shardings=(well_sharding(mesh1),))
        a_packed, a_health = p1(jax.device_put(wells, well_sharding(mesh1)))

        mesh2 = create_multihost_mesh(2)
        sh2 = plate_sharding_multihost(mesh2)
        p2 = jax.jit(jax.vmap(well_fn), in_shardings=(sh2,))
        b_packed, b_health = p2(jax.device_put(wells, sh2))

        np.testing.assert_array_equal(np.asarray(a_packed), np.asarray(b_packed))
        np.testing.assert_array_equal(np.asarray(a_health), np.asarray(b_health))


class TestCollectives:
    def test_halo_exchange_matches_edge_padding(self, rng):
        from jax.experimental.shard_map import shard_map

        mesh = create_mesh(MeshConfig(space_parallelism=8))
        x = jnp.asarray(rng.random((64, 32)).astype(np.float32))

        fn = shard_map(
            lambda xl: halo_exchange(xl, 2, SPACE_AXIS),
            mesh=mesh,
            in_specs=(PartitionSpec(SPACE_AXIS, None),),
            out_specs=PartitionSpec(SPACE_AXIS, None),
        )
        out = np.asarray(jax.jit(fn)(x))
        # each 8-row shard becomes 12 rows: verify the middle shard's halos
        shard = out[12 * 3 : 12 * 4]
        np.testing.assert_allclose(shard[2:-2], np.asarray(x)[24:32])
        np.testing.assert_allclose(shard[:2], np.asarray(x)[22:24])  # true neighbor rows
        np.testing.assert_allclose(shard[-2:], np.asarray(x)[32:34])
        # first shard top halo = replicated edge
        np.testing.assert_allclose(out[0], np.asarray(x)[0])

    def test_sharded_otsu_equals_global(self, rng):
        from jax.experimental.shard_map import shard_map

        from arcadia_microscopy_tools_tpu.ops.threshold import threshold_otsu

        mesh = create_mesh(MeshConfig(space_parallelism=8))
        img = (rng.random((64, 64)) * 3000).astype(np.uint16)
        img[20:40] += 20000

        fn = shard_map(
            lambda xl: sharded_otsu_threshold(xl, SPACE_AXIS),
            mesh=mesh,
            in_specs=(PartitionSpec(SPACE_AXIS, None),),
            out_specs=PartitionSpec(),
        )
        sharded = float(jax.jit(fn)(jnp.asarray(img)))
        single = float(threshold_otsu(img))
        assert sharded == single == ref.threshold_otsu(img)

    def test_sharded_gaussian_equals_single_chip(self, rng):
        from jax.experimental.shard_map import shard_map

        from arcadia_microscopy_tools_tpu.ops.filters import gaussian_filter

        mesh = create_mesh(MeshConfig(space_parallelism=8))
        img = rng.random((64, 48)).astype(np.float32)

        fn = shard_map(
            lambda xl: sharded_gaussian_filter(xl, 2.0, SPACE_AXIS),
            mesh=mesh,
            in_specs=(PartitionSpec(SPACE_AXIS, None),),
            out_specs=PartitionSpec(SPACE_AXIS, None),
        )
        sharded = np.asarray(jax.jit(fn)(jnp.asarray(img)))
        single = np.asarray(gaussian_filter(jnp.asarray(img), 2.0))
        np.testing.assert_allclose(sharded, single, atol=1e-5)


class TestPlateRunner:
    def _layout(self, n=8):
        ids = [f"{chr(65 + i // 12)}{(i % 12) + 1:02d}" for i in range(n)]
        return MicroplateLayout([Well(id=i) for i in ids])

    def test_classical_plate_run(self, rng):
        layout = self._layout(8)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        runner = PlateRunner(PlateRunConfig(max_cells=64, min_size=20))
        results = runner.run(layout, wells)
        assert not results.failed_wells
        df = results.to_dataframe()
        assert len(df) > 0
        assert {"well_id", "area", "circularity", "intensity_mean_ch0"} <= set(df.columns)
        # every well found its ~8 blobs
        summary = results.summary()
        assert (summary["num_cells"] >= 5).all()

    def test_multihost_runner_matches_single_axis(self, rng):
        """PlateRunner on a 2-host mesh produces the same tables as the
        default wells-only mesh."""
        from arcadia_microscopy_tools_tpu.parallel.mesh import create_multihost_mesh

        layout = self._layout(8)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        cfg = PlateRunConfig(max_cells=64, min_size=20)
        ref_results = PlateRunner(cfg).run(layout, wells)
        mh_results = PlateRunner(cfg, mesh=create_multihost_mesh(2)).run(
            layout, wells
        )
        assert not mh_results.failed_wells
        for wid in layout.well_ids:
            pd_a = ref_results.tables[wid].reset_index(drop=True)
            pd_b = mh_results.tables[wid].reset_index(drop=True)
            np.testing.assert_allclose(
                pd_a.to_numpy(float), pd_b.to_numpy(float)
            )

    def test_matches_single_image_path(self, rng):
        """Plate measurements equal the SegmentationMask path for one well."""
        from arcadia_microscopy_tools_tpu.masks import SegmentationMask
        from arcadia_microscopy_tools_tpu.operations import (
            apply_threshold,
            rescale_by_percentile,
            subtract_background_dog,
        )

        layout = self._layout(8)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        runner = PlateRunner(PlateRunConfig(max_cells=64, min_size=20))
        results = runner.run(layout, wells)

        wid = layout.well_ids[0]
        img = wells[wid][0]
        x = subtract_background_dog(img, 1.0, 16.0)
        x = rescale_by_percentile(x, (0.5, 99.9))
        q = (np.asarray(x) * 65535).astype(np.uint16)
        mask = np.asarray(apply_threshold(q, "otsu"))
        sm = SegmentationMask(
            mask_image=mask, remove_edge_cells=False, property_names=["label", "area", "centroid"]
        )
        sm_filtered_areas = sorted(a for a in sm.cell_properties["area"] if a >= 20)
        plate_areas = sorted(results.tables[wid]["area"])
        np.testing.assert_allclose(plate_areas, sm_filtered_areas)

    def test_failure_isolation(self, rng):
        layout = self._layout(4)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        bad = layout.well_ids[1]

        def source(well_id):
            if well_id == bad:
                raise IOError("corrupt file")
            return wells[well_id]

        runner = PlateRunner(PlateRunConfig(max_cells=64))
        with pytest.warns(SegmentationWarning, match="corrupt file"):
            results = runner.run(layout, source)
        assert results.failed_wells == [bad]
        assert all(results.tables[w] is not None for w in layout.well_ids if w != bad)

    def test_checkpoint_resume(self, rng, tmp_path):
        layout = self._layout(4)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        runner = PlateRunner(PlateRunConfig(max_cells=64), checkpoint_dir=tmp_path)
        results1 = runner.run(layout, wells)
        assert (tmp_path / "manifest.json").exists()

        # resume: a source that explodes proves wells come from the checkpoint
        def explode(well_id):
            raise AssertionError("should not be called on resume")

        runner2 = PlateRunner(PlateRunConfig(max_cells=64), checkpoint_dir=tmp_path)
        results2 = runner2.run(layout, explode)
        for w in layout.well_ids:
            pd1 = results1.tables[w].reset_index(drop=True)
            pd2 = results2.tables[w].reset_index(drop=True)
            np.testing.assert_allclose(pd1["area"], pd2["area"])

    def test_capacity_autoretry(self, rng):
        """Wells denser than max_cells / fg_cap_fraction are re-dispatched
        with escalated capacities instead of silently corrupting the last
        measurement slot (round-1 advisor finding)."""
        layout = self._layout(2)
        wells = {w: synth_well(rng, n_cells=12) for w in layout.well_ids}
        runner = PlateRunner(
            PlateRunConfig(max_cells=4, min_size=20, fg_cap_fraction=0.0002)
        )
        results = runner.run(layout, wells)
        assert not results.failed_wells
        for w in layout.well_ids:
            assert len(results.tables[w]) >= 10  # all 12 blobs measured
            # no slot absorbed several cells' pixels
            assert results.tables[w]["area"].max() < 2000

    def test_capacity_exhausted_warns(self, rng):
        """A well denser than the final escalation fails loudly."""
        layout = self._layout(1)
        wells = {w: synth_well(rng, size=256, n_cells=20) for w in layout.well_ids}
        # 20 components > max_cells 1 even after 4x and 16x escalation
        runner = PlateRunner(PlateRunConfig(max_cells=1, min_size=20))
        with pytest.warns(SegmentationWarning, match="exceed max_cells"):
            results = runner.run(layout, wells)
        assert results.failed_wells == list(layout.well_ids)

    def test_pair_cap_autoretry(self, rng):
        """An undersized boundary-edge capacity fails the CC convergence
        certificate; the well must be re-dispatched with escalated capacities
        (pair_cap scales with the other static caps) and still measure every
        cell, not fail or corrupt."""
        layout = self._layout(1)
        wells = {w: synth_well(rng, n_cells=12) for w in layout.well_ids}
        runner = PlateRunner(PlateRunConfig(max_cells=64, min_size=20, pair_cap=2))
        results = runner.run(layout, wells)
        assert not results.failed_wells
        for w in layout.well_ids:
            assert len(results.tables[w]) >= 10

    def test_spatial_sharding_matches_single_chip(self, rng):
        """space_parallelism > 1 routes frames through row sharding; the
        results must equal the wells-only run exactly (XLA's partitioner is
        semantics-preserving; this pins the wiring, which round 1 left
        dead)."""
        layout = self._layout(2)
        wells = {w: synth_well(rng, size=256, n_cells=10) for w in layout.well_ids}
        cfg = PlateRunConfig(max_cells=64, min_size=20)

        plain = PlateRunner(cfg, MeshConfig(space_parallelism=1)).run(layout, wells)
        sharded = PlateRunner(cfg, MeshConfig(space_parallelism=4)).run(layout, wells)

        assert not sharded.failed_wells
        for w in layout.well_ids:
            a = plain.tables[w].reset_index(drop=True)
            b = sharded.tables[w].reset_index(drop=True)
            assert list(a.columns) == list(b.columns)
            for col in a.columns:
                np.testing.assert_allclose(
                    a[col].to_numpy(), b[col].to_numpy(), rtol=1e-5, atol=1e-5,
                    err_msg=col,
                )

    def test_partial_batch_padding(self, rng):
        # 5 wells with an 8-wide mesh: final batch is padded internally
        layout = self._layout(5)
        wells = {w: synth_well(rng) for w in layout.well_ids}
        runner = PlateRunner(PlateRunConfig(max_cells=64))
        results = runner.run(layout, wells)
        assert set(results.tables) == set(layout.well_ids)
        assert not results.failed_wells


class TestUnetPlatePath:
    def test_unet_method_end_to_end(self, rng):
        """PlateRunner(method='unet') runs the full deep path (forward ->
        flow tracking -> QC -> measurement) through the sharded program and
        yields per-cell tables on cells the trained checkpoint can see."""
        import pathlib

        from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells
        from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint

        ckpt = pathlib.Path(__file__).parents[1] / "checkpoints" / "unet"
        if not ckpt.exists():
            pytest.skip("trained checkpoint not present")
        params = load_checkpoint(ckpt)

        wells = {}
        for well_id in ("A01", "A02"):
            img, _ = synthesize_cells(rng, (256, 256), n_cells=10, separation=0.95)
            u16 = (img * 60000).astype(np.uint16)
            wells[well_id] = np.stack([u16, u16])
        layout = MicroplateLayout([Well(id=w) for w in wells])

        runner = PlateRunner(
            PlateRunConfig(
                method="unet", max_cells=64, min_size=15,
                niter=100, flow_threshold=0.4,
            ),
            unet_params=params,
        )
        results = runner.run(layout, wells)
        assert not results.failed_wells
        for w in wells:
            table = results.tables[w]
            assert table is not None and len(table) >= 5
            assert "intensity_mean_ch0" in table.columns or any(
                c.startswith("intensity_mean") for c in table.columns
            )

    def test_unet_method_odd_shape_fallback(self, rng):
        """Wells whose side is not a multiple of 8 (the U-Net's pooling
        requirement) are edge-padded up and cropped back inside the well
        program; the deep path must still run end-to-end and find cells.
        (Before the padding, such wells always failed: the forward pass
        cannot pool a 25-row level.)"""
        import pathlib

        from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells
        from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint

        ckpt = pathlib.Path(__file__).parents[1] / "checkpoints" / "unet"
        if not ckpt.exists():
            pytest.skip("trained checkpoint not present")
        params = load_checkpoint(ckpt)

        img, _ = synthesize_cells(rng, (100, 100), n_cells=4, separation=0.95)
        u16 = (img * 60000).astype(np.uint16)  # 100 % 8 == 4
        wells = {"A01": np.stack([u16, u16])}
        layout = MicroplateLayout([Well(id="A01")])
        runner = PlateRunner(
            PlateRunConfig(
                method="unet", max_cells=64, min_size=10,
                niter=100, flow_threshold=0.4,
            ),
            unet_params=params,
        )
        results = runner.run(layout, wells)
        assert not results.failed_wells
        assert results.tables["A01"] is not None
        assert len(results.tables["A01"]) >= 1


class TestSpatialPartitioning:
    def test_gspmd_collectives_are_sane(self):
        """Audit the optimized HLO of the spatially-sharded well program
        (docs/spatial_sharding.md): GSPMD must implement the stencil/CC
        stages with thin halo collective-permutes and bounded all-gathers,
        not per-sweep full-image replication. Guards against a partitioning
        regression shipping silently."""
        import re
        from collections import Counter

        from arcadia_microscopy_tools_tpu.parallel.plate import (
            PlateRunConfig,
            _build_well_program,
        )
        from arcadia_microscopy_tools_tpu.parallel.mesh import well_sharding

        mesh = create_mesh(MeshConfig(space_parallelism=4))
        cfg = PlateRunConfig(max_cells=32, min_size=4)
        fn = _build_well_program(cfg, n_channels=2, spatial=True)
        sh = well_sharding(mesh, spatial=True)
        prog = jax.jit(jax.vmap(fn), in_shardings=(sh,))
        x = jax.device_put(jnp.zeros((2, 2, 128, 128), jnp.uint16), sh)
        txt = prog.lower(x).compile().as_text()

        ops = Counter(
            m.group(1)
            for m in re.finditer(
                r"(collective-permute|all-reduce|all-gather)(?:-start)?\(", txt
            )
        )
        # halo exchange must exist (the CC sweeps shift rows across shards)
        assert ops["collective-permute"] > 0, ops
        # histogram merges must exist
        assert ops["all-reduce"] > 0, ops

        # every all-gather stays bounded by the largest legitimate gather:
        # the DoG's halo-padded intermediate, (H + 2*truncate*high_sigma)^2
        # f32 = (128+128)^2 here (shrinks to ~1.1 image-equivalents at the
        # production 2048^2). Sort/compaction stages centralize smaller
        # arrays; a per-sweep full replication would blow far past this.
        image_bytes = (128 + 2 * 64) ** 2 * 4
        gather_bytes = []
        for shape in re.findall(r"= ([a-z0-9]+\[[0-9,]*\])[^ ]* all-gather", txt):
            dtype, dims = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape).groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            itemsize = 1 if dtype == "pred" else 4
            gather_bytes.append(n * itemsize)
        assert gather_bytes, "expected some all-gathers (sort centralization)"
        assert max(gather_bytes) <= image_bytes, max(gather_bytes)

        # halo permutes are thin: row-strip shaped, not image shaped
        strip_rows = [
            int(m.group(1))
            for m in re.finditer(
                r"= [a-z0-9]+\[1,(\d+),\d+\]\{[0-9,]+\} collective-permute", txt
            )
        ]
        assert strip_rows and max(strip_rows) <= 8, strip_rows[:10]


class TestUnetCompactMeasurement:
    def test_unet_program_matches_full_image_measurement(self, rng):
        """The unet well program's packed per-cell columns (compact-domain
        measure_compacted) must match measure_labels +
        measure_intensity_stack run on the very same label image."""
        import pathlib

        from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells
        from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint
        from arcadia_microscopy_tools_tpu.ops.regionprops import (
            measure_intensity_stack,
            measure_labels,
        )
        from arcadia_microscopy_tools_tpu.parallel.plate import (
            _INTENSITY_STATS,
            _PROP_COLUMNS,
            PlateRunConfig,
            _build_well_program,
        )

        ckpt = pathlib.Path(__file__).parents[1] / "checkpoints" / "unet"
        if not ckpt.exists():
            pytest.skip("trained checkpoint not present")
        params = load_checkpoint(ckpt)
        config = PlateRunConfig(
            method="unet", max_cells=64, min_size=15, niter=100,
            flow_threshold=0.4, remove_edge_cells=True,
        )
        img, _ = synthesize_cells(rng, (256, 256), n_cells=10, separation=0.95)
        u16 = (img * 60000).astype(np.uint16)
        well = jnp.asarray(np.stack([u16, u16]))

        # debug_labels exposes the program's OWN label image, so this test
        # pins the measurement path against the exact labels it measured
        # (reproducing the forward independently is fragile: float
        # reassociation across jit fusion contexts can flip a
        # threshold-boundary pixel and shift a cell's area by one)
        well_fn = _build_well_program(
            config, n_channels=2, unet_params=params, debug_labels=True
        )
        packed, health, lbl = jax.jit(well_fn)(well)
        packed = np.asarray(packed)

        props = measure_labels(lbl, max_cells=64)
        stats = measure_intensity_stack(lbl, well, max_cells=64)

        assert packed.shape == (64, len(_PROP_COLUMNS) + 2 * len(_INTENSITY_STATS))
        cols = {name: packed[:, i] for i, name in enumerate(_PROP_COLUMNS)}
        k = len(_PROP_COLUMNS)
        for ci in range(2):
            for stat in _INTENSITY_STATS:
                cols[f"{stat}_ch{ci}"] = packed[:, k]
                k += 1

        valid = np.asarray(props["valid"])
        assert valid.any()  # the parity claim must be exercised on real cells
        for name in _PROP_COLUMNS:
            if name in ("label",):
                continue
            want = np.asarray(props[name]).astype(np.float32)
            got = cols[name]
            np.testing.assert_allclose(
                got[valid], want[valid], rtol=1e-4, atol=1e-3, err_msg=name
            )
        for ci in range(2):
            for stat in _INTENSITY_STATS:
                want = np.asarray(stats[ci][stat]).astype(np.float32)
                got = cols[f"{stat}_ch{ci}"]
                np.testing.assert_allclose(
                    got[valid], want[valid], rtol=1e-3, atol=1e-2,
                    err_msg=f"{stat}_ch{ci}",
                )
