"""Sharded end-to-end HCS plate pipeline.

The BASELINE config-5 path: well images -> preprocess -> segment -> per-cell
morphology + fluorescence quantification, for a whole microplate. The
reference processes one image at a time through Python loops
(`src/arcadia_microscopy_tools/model.py:276-288` is a serial loop even on
GPU); here a batch of wells is one jitted, vmapped program sharded over the
`wells` mesh axis, so every chip processes its shard of the plate with zero
host round-trips inside a batch.

Aux subsystems the reference lacks (SURVEY.md section 5), provided here:
- per-well failure isolation with the same SegmentationWarning semantics
  (a failed well yields None and the run continues);
- checkpoint/resume: per-well results are written under `checkpoint_dir`
  with a manifest; a re-run skips completed wells;
- timing metrics per stage.
"""

from __future__ import annotations

import json
import logging
import time
import warnings
from dataclasses import dataclass

from pathlib import Path
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
import pandas as pd

from ..core.channels import Channel
from ..core.microplate import MicroplateLayout
from ..exceptions import SegmentationWarning
from ..ops.basic import rescale_by_percentile, subtract_background_dog
from ..ops.compaction import compact_by_root
from ..ops.fused import HIST_THRESHOLD_METHODS, fused_classical_mask
from ..ops.labeling import component_roots
from ..ops.morphology import binary_opening, disk
from ..ops.regionprops import measure_compacted
from ..ops.threshold import _GLOBAL_METHODS
from .mesh import SPACE_AXIS, MeshConfig, create_mesh, well_sharding

logger = logging.getLogger(__name__)

__all__ = ["PlateRunConfig", "PlateRunner", "PlateResults"]

# column order of the packed per-cell output tensor (see _build_well_program)
_PROP_COLUMNS = [
    "label",
    "valid",
    "area",
    "centroid_y",
    "centroid_x",
    "perimeter",
    "eccentricity",
    "axis_major_length",
    "axis_minor_length",
    "orientation",
    "bbox_min_row",
    "bbox_min_col",
    "bbox_max_row",
    "bbox_max_col",
    "extent",
]
_INTENSITY_STATS = [
    "intensity_mean",
    "intensity_max",
    "intensity_min",
    "intensity_std",
]


@dataclass(frozen=True)
class PlateRunConfig:
    """Configuration for a plate run (constructor-args-with-defaults style).

    Attributes:
        seg_channel_index: Index of the channel used for segmentation
            (e.g. the DAPI channel).
        method: "classical" (DoG -> rescale -> threshold -> morphology -> CC)
            or "unet" (U-Net + flow tracking).
        threshold_method: Global threshold for the classical path.
        low_sigma / high_sigma: DoG sigmas for background subtraction.
        opening_radius: Binary opening radius for mask cleanup (0 = off).
        remove_edge_cells: Drop cells touching image borders.
        max_cells: Static per-well cell capacity (padded measurements).
        batch_size: Wells per device dispatch (None = one per device).
        measure_channel_indices: Channels to quantify per cell (None = all).
        min_size: Minimum object size in pixels (classical path cleanup and
            unet mask filter).
        fg_cap_fraction: Static foreground-pixel capacity for the compacted
            measurement path, as a fraction of the image area. Typical
            fluorescence masks cover a few percent; wells that exceed the
            capacity (or max_cells) are automatically re-dispatched with 4x
            the capacity, up to 2 escalations, before being failed.
        pair_cap: Static capacity for connected-components boundary-merge
            edges. Cell-like images produce a few thousand edges; overflow
            fails the convergence certificate, which re-dispatches the well
            with 4x capacities like the other static caps.
    """

    seg_channel_index: int = 0
    method: str = "classical"
    threshold_method: str = "otsu"
    low_sigma: float = 1.0
    high_sigma: float = 16.0
    opening_radius: int = 0
    remove_edge_cells: bool = False
    max_cells: int = 1024
    batch_size: int | None = None
    measure_channel_indices: tuple[int, ...] | None = None
    min_size: int = 15
    cellprob_threshold: float = 0.0
    flow_threshold: float = 0.4
    niter: int = 200
    fg_cap_fraction: float = 0.0625
    pair_cap: int = 16384


class PlateResults:
    """Per-well measurement tables plus run metadata."""

    def __init__(self, tables: dict[str, pd.DataFrame | None], timings: dict[str, float]):
        self.tables = tables
        self.timings = timings

    @property
    def failed_wells(self) -> list[str]:
        return [w for w, t in self.tables.items() if t is None]

    def to_dataframe(self) -> pd.DataFrame:
        """All wells concatenated with a well_id column."""
        frames = []
        for well_id, table in self.tables.items():
            if table is None or table.empty:
                continue
            t = table.copy()
            t.insert(0, "well_id", well_id)
            frames.append(t)
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    def summary(self) -> pd.DataFrame:
        """Per-well cell counts and mean morphology."""
        rows = []
        for well_id, table in self.tables.items():
            if table is None:
                rows.append({"well_id": well_id, "num_cells": -1})
                continue
            row = {"well_id": well_id, "num_cells": len(table)}
            for col in ("area", "circularity"):
                if col in table:
                    row[f"mean_{col}"] = float(table[col].mean()) if len(table) else np.nan
            rows.append(row)
        return pd.DataFrame(rows)


def _plate_pallas_conv(spatial: bool) -> bool:
    """Fused-conv choice for the plate program: OFF by default (measured
    composed regression, see the call-site note), never on when spatially
    sharded (Mosaic calls cannot be partitioned along a sharded axis)."""
    import os

    return (not spatial) and os.environ.get("AMT_PALLAS_CONV_PLATE", "0") == "1"


def _build_well_program(
    config: PlateRunConfig, n_channels: int, unet_params=None, spatial: bool = False,
    debug_labels: bool = False,
):
    """Trace-time construction of the fused single-well program; the caller
    vmaps it over the batch and shards the batch over the mesh.

    The classical path is fully gather-free: fused histogram frontend
    (ops/fused.py), two-phase CC with boundary seeding (ops/labeling.py),
    one foreground-compaction sort, then all measurements as MXU reductions
    over the compact pixel set (ops/regionprops.measure_compacted). The
    program also emits per-well health scalars - component count, foreground
    overflow, CC convergence certificate - which the host turns into
    SegmentationWarnings instead of silently corrupted tables.
    """
    seg_idx = config.seg_channel_index
    measure_idx = (
        config.measure_channel_indices
        if config.measure_channel_indices is not None
        else tuple(range(n_channels))
    )

    def classical_mask(seg_img):
        if (
            config.threshold_method in HIST_THRESHOLD_METHODS
            and config.opening_radius == 0
        ):
            return fused_classical_mask(
                seg_img,
                low_sigma=config.low_sigma,
                high_sigma=config.high_sigma,
                percentile_range=(0.5, 99.9),
                method=config.threshold_method,
            )
        threshold_fn = _GLOBAL_METHODS[config.threshold_method]
        x = subtract_background_dog(
            seg_img, low_sigma=config.low_sigma, high_sigma=config.high_sigma
        )
        x = rescale_by_percentile(x, (0.5, 99.9))
        # quantize the normalized image so the integer-exact histogram
        # thresholds apply; 16-bit quantization is far below noise level
        q = (x * 65535.0).astype(jnp.uint16)
        mask = q.astype(jnp.float32) > threshold_fn(q)
        if config.opening_radius > 0:
            mask = binary_opening(mask, disk(config.opening_radius))
        return mask

    def unet_mask(seg_img):
        """U-Net compact mask result for one well's segmentation frame.

        Flow integration runs on the active-pixel-compacted graph
        (models/flows.compute_masks_sparse_compact) - the dense doubling's
        full-image gathers were the 2048^2 deep-path bottleneck. A well
        whose foreground exceeds the cap reports ok=False, which the runner
        maps to the same capacity-escalation redispatch as the classical
        path's compaction overflow.

        Normalization percentiles come from the exact integer-histogram
        order statistics (ops/fused.py machinery) instead of a 4M-element
        sort: seg_img is uint16, so the histogram reproduces np.percentile
        bit-exactly at ~1/10 the cost.
        """
        from ..models.flows import (
            compute_masks_sparse_compact,
            compute_masks_sparse_compact_s2d,
        )
        from ..models.unet import apply_unet
        from ..models.unet_s2d import apply_unet_s2d, s2d_params, s2d_supported
        from ..ops.fused import _percentile_from_cum
        from ..ops.stats import histogram_int

        h, w = seg_img.shape
        counts, _ = histogram_int(seg_img, 65536)
        cum = jnp.cumsum(counts.astype(jnp.float32))
        p1 = _percentile_from_cum(cum, 1.0, h * w)
        p99 = _percentile_from_cum(cum, 99.0, h * w)
        x = seg_img.astype(jnp.float32)
        xn = jnp.clip((x - p1) / jnp.maximum(p99 - p1, 1e-6), 0.0, 1.0)
        # the U-Net's three pooling levels need sides that are multiples of
        # 8; edge-replicate up to the next multiple (trace-time constants)
        # and crop the prediction back. Border cells are unaffected: the
        # replicated margin only feeds the outermost receptive fields, and
        # the plate path clears border-touching labels anyway.
        ph, pw = (-h) % 8, (-w) % 8
        if ph or pw:
            xn = jnp.pad(xn, ((0, ph), (0, pw)), mode="edge")
        # space-to-depth forward: the narrow high-res conv levels run
        # 4x channel-wide at quarter area - full MXU lane occupancy,
        # exact to float tolerance (models/unet_s2d.py; the plain forward
        # measured 214 ms/img at 2048^2 with those levels dominating).
        # Params are concrete at trace time, so the rewrite happens once
        # host-side and bakes into the program. Checkpoints with a
        # non-default architecture take the shape-generic plain forward.
        # The network input is replicated grayscale (Cellpose's 3-channel
        # contract over a single segmentation channel), so the S2D path
        # folds the replication into the stem kernels (gray_input) and
        # feeds the 1-channel image directly.
        # active-pixel cap for the sparse flow integration: same sizing as
        # the classical path's foreground-compaction capacity
        cap = max(1, int(h * w * config.fg_cap_fraction))
        cap = min(-(-cap // 8192) * 8192, h * w)
        mask_kwargs = dict(
            cellprob_threshold=config.cellprob_threshold,
            flow_threshold=config.flow_threshold,
            niter=config.niter,
            max_cells=config.max_cells,
            min_size=config.min_size,
            clear_border_labels=config.remove_edge_cells,
            # a Mosaic custom call cannot be partitioned along a sharded
            # image axis - the spatially-sharded program takes the pure-XLA
            # diffusion, same as the classical path's allow_pallas gate
            allow_pallas=not spatial,
        )
        if s2d_supported(unet_params):
            # pallas_gn None = auto (opt-in via AMT_PALLAS_GN; the kernel
            # measured slower composed into the forward on v5e - see
            # apply_unet_s2d). Spatial sharding forces it off: a Mosaic
            # call cannot be partitioned along a sharded image axis.
            sp = s2d_params(unet_params, gray_input=True)
            if not (ph or pw):
                # unpadded case (production 2048^2 wells): head stays on
                # the half-resolution S2D grid and the mask path reads it
                # there - the planar (H, W, 3) tensor, its depth-to-space
                # conv and its 3-minor-lane slices never materialize.
                # Bit-identical to the planar route (equivalence-tested).
                out_s2d = apply_unet_s2d(
                    sp,
                    xn[None, ..., None],
                    pallas_gn=False if spatial else None,
                    # fused Pallas convs are a measured WIN for the
                    # standalone forward (74.3 -> 61.3 ms/img at 2048^2)
                    # but a measured LOSS composed into this full plate
                    # program (6.31 -> 5.83 img/s/chip, round-5 A/B on
                    # v5e): the 12 Mosaic calls are scheduling barriers
                    # XLA cannot fuse across, and the composed program
                    # loses more around them than the kernels save.
                    # Same story as pallas_gn (round 4). Opt back in with
                    # AMT_PALLAS_CONV_PLATE=1 for hardware where the
                    # tradeoff flips.
                    pallas_conv=_plate_pallas_conv(spatial),
                    out_s2d=True,
                )[0]
                return compute_masks_sparse_compact_s2d(
                    out_s2d, cap, **mask_kwargs
                )
            out = apply_unet_s2d(
                sp,
                xn[None, ..., None],
                pallas_gn=False if spatial else None,
                pallas_conv=_plate_pallas_conv(spatial),
            )[0]
        else:
            out = apply_unet(unet_params, jnp.stack([xn, xn, xn], axis=-1)[None])[0]
        if ph or pw:
            out = out[:h, :w]
        return compute_masks_sparse_compact(out, cap, **mask_kwargs)

    def well_fn(img):  # (C, H, W) uint16
        seg_img = img[seg_idx]
        stack = jnp.stack([img[ci] for ci in measure_idx])

        if config.method == "classical":
            h, w = seg_img.shape
            cap = max(1, int(h * w * config.fg_cap_fraction))
            cap = -(-cap // 8192) * 8192  # round up to the reduction block
            cap = min(cap, h * w)
            mask = classical_mask(seg_img)
            # under spatial sharding the XLA partitioner owns the layout;
            # the Pallas block kernel assumes a single-chip image, so the
            # pure-XLA sweep path (which GSPMD partitions correctly,
            # inserting halo collectives for the shifted compares) runs
            # instead
            roots, converged = component_roots(
                mask, pair_cap=config.pair_cap, allow_pallas=not spatial
            )
            comp = compact_by_root(roots, cap)
            props, stats = measure_compacted(
                comp.seg, comp.idx, roots, stack, config.max_cells, w
            )
            health = {
                "num_components": comp.num_components,
                "fg_overflow": comp.overflow,
                "converged": converged,
            }
        elif config.method == "unet":
            cm = unet_mask(seg_img)  # border filter folded into the tail
            h, w = seg_img.shape
            n = h * w
            # segment-contiguous ordering for measure_compacted: sort the
            # compact pixel set by (label, linear index) - one cap-sized
            # 2-key sort instead of the ~390 ms full-image label scans of
            # measure_labels + measure_intensity_stack at 2048^2 x 4ch
            seg_key = jnp.where(cm.valid, cm.lab_c, 0)
            idx_key = jnp.where(cm.valid, cm.idx, n)
            # both arrays are keys and real (label, idx) pairs are distinct
            # (idx is unique); the only duplicates are (0, n) padding pairs,
            # so the sorted arrays are permutation-invariant -> unstable
            seg_s, idx_s = lax.sort(
                (seg_key, idx_key), num_keys=2, is_stable=False
            )
            roots_image = jnp.where(cm.labels > 0, cm.labels - 1, n)
            props, stats = measure_compacted(
                seg_s, idx_s, roots_image, stack, config.max_cells, w
            )
            health = {
                "num_components": jnp.max(seg_key),
                # sparse flow-integration cap exceeded -> same escalation
                # path as the classical compaction overflow
                "fg_overflow": ~cm.ok,
                "converged": jnp.bool_(True),
            }
            debug_label_image = cm.labels
        else:
            raise ValueError(f"Unknown segmentation method: {config.method!r}")

        intensity = {ci: stats[k] for k, ci in enumerate(measure_idx)}

        # pack every per-cell column into ONE f32 tensor: the host then reads
        # one buffer per batch instead of ~30 (each separate readback pays a
        # full RPC round-trip on tunneled backends). All values fit f32
        # exactly (areas < 2^24, coordinates < 2^12, stats already f32).
        columns = [props[name].astype(jnp.float32) for name in _PROP_COLUMNS]
        for ci in measure_idx:
            for stat in _INTENSITY_STATS:
                columns.append(intensity[ci][stat].astype(jnp.float32))
        packed = jnp.stack(columns, axis=-1)  # (max_cells, K)
        health_vec = jnp.stack(
            [
                jnp.asarray(health["num_components"], jnp.int32),
                health["fg_overflow"].astype(jnp.int32),
                health["converged"].astype(jnp.int32),
            ]
        )
        if debug_labels:
            # test-only introspection: expose the program's own label image
            # so measurement parity can be asserted against the EXACT labels
            # it measured (forward-pass float reassociation across jit
            # fusion contexts can flip a threshold-boundary pixel)
            if config.method != "unet":
                raise ValueError("debug_labels is only supported for method='unet'")
            return packed, health_vec, debug_label_image
        return packed, health_vec

    return well_fn


def _unpack_outputs(
    packed: np.ndarray, health: np.ndarray, measure_idx: tuple[int, ...]
) -> tuple[dict, dict, dict]:
    """Host-side inverse of the program's column packing."""
    props = {
        name: packed[..., i] for i, name in enumerate(_PROP_COLUMNS)
    }
    props["valid"] = props["valid"] > 0.5
    base = len(_PROP_COLUMNS)
    intensity = {}
    for k, ci in enumerate(measure_idx):
        intensity[ci] = {
            stat: packed[..., base + k * len(_INTENSITY_STATS) + j]
            for j, stat in enumerate(_INTENSITY_STATS)
        }
    health_dict = {
        "num_components": health[..., 0],
        "fg_overflow": health[..., 1] > 0,
        "converged": health[..., 2] > 0,
    }
    return props, intensity, health_dict


class PlateRunner:
    """Runs a plate of wells through the fused pipeline on a device mesh."""

    def __init__(
        self,
        config: PlateRunConfig | None = None,
        mesh_config: MeshConfig | None = None,
        unet_params: Any = None,
        checkpoint_dir: str | Path | None = None,
        mesh: Any = None,
    ):
        """`mesh` overrides `mesh_config` with a pre-built mesh - pass a
        `create_multihost_mesh(...)` result to spread the plate over multiple
        slices (the hosts axis shards the batch alongside wells; see
        parallel/mesh.py for the DCN layout rationale and the
        single-controller scope: on multi-process deployments the batch
        feeding here would need jax.make_array_from_process_local_data)."""
        self.config = config or PlateRunConfig()
        self.mesh = mesh if mesh is not None else create_mesh(mesh_config)
        self.unet_params = unet_params
        if self.config.method == "unet" and unet_params is None:
            from ..models.weights import seeded_params

            self.unet_params = seeded_params()
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self._compiled: dict[tuple, Callable] = {}

    # -- checkpoint / resume -------------------------------------------------------

    def _manifest_path(self) -> Path:
        assert self.checkpoint_dir is not None
        return self.checkpoint_dir / "manifest.json"

    def _load_manifest(self) -> dict[str, str]:
        if self.checkpoint_dir is None or not self._manifest_path().exists():
            return {}
        return json.loads(self._manifest_path().read_text())

    def _record_well(self, manifest: dict[str, str], well_id: str, table: pd.DataFrame) -> None:
        if self.checkpoint_dir is None:
            return
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        out = self.checkpoint_dir / f"{well_id}.csv"
        table.to_csv(out, index=False)
        manifest[well_id] = out.name
        self._manifest_path().write_text(json.dumps(manifest, indent=1))

    def _load_well(self, manifest: dict[str, str], well_id: str) -> pd.DataFrame | None:
        if self.checkpoint_dir is None or well_id not in manifest:
            return None
        path = self.checkpoint_dir / manifest[well_id]
        if not path.exists():
            return None
        return pd.read_csv(path)

    # -- execution --------------------------------------------------------------------

    def _get_compiled(
        self, n_channels: int, shape: tuple[int, int], config: PlateRunConfig | None = None
    ):
        from ..models import flows as _flows
        from ..ops import labeling as _labeling

        config = config or self.config
        key = (
            n_channels,
            shape,
            config.fg_cap_fraction,
            config.max_cells,
            config.pair_cap,
            # the Pallas module toggles (CC kernel, diffusion kernel) are
            # read at trace time inside the well program; keying on them
            # keeps this cache coherent when either flips between runs
            _labeling._USE_PALLAS_LOCAL,
            _flows._USE_PALLAS_DIFFUSE,
        )
        if key not in self._compiled:
            spatial = self.mesh.shape[SPACE_AXIS] > 1
            well_fn = _build_well_program(
                config, n_channels, self.unet_params, spatial=spatial
            )
            batched = jax.vmap(well_fn)
            self._compiled[key] = jax.jit(
                batched, in_shardings=(self._input_sharding(),)
            )
        return self._compiled[key]

    def _escalated_config(self, level: int) -> PlateRunConfig:
        """Capacity escalation for wells denser than the static defaults."""
        from dataclasses import replace

        factor = 4**level
        return replace(
            self.config,
            fg_cap_fraction=min(1.0, self.config.fg_cap_fraction * factor),
            max_cells=self.config.max_cells * factor,
            pair_cap=self.config.pair_cap * factor,
        )

    def _batch_size(self) -> int:
        if self.config.batch_size is not None:
            return self.config.batch_size
        from .mesh import HOST_AXIS

        n = self.mesh.shape["wells"]
        if HOST_AXIS in self.mesh.shape:
            n *= self.mesh.shape[HOST_AXIS]
        return n

    def _input_sharding(self):
        from .mesh import HOST_AXIS, plate_sharding_multihost

        spatial = self.mesh.shape[SPACE_AXIS] > 1
        if HOST_AXIS in self.mesh.shape:
            return plate_sharding_multihost(self.mesh, spatial=spatial)
        return well_sharding(self.mesh, spatial=spatial)

    def _results_to_table(
        self,
        props: dict[str, np.ndarray],
        intensity: dict[int, dict[str, np.ndarray]],
        channels: list[Channel] | None,
        well_index: int,
        image_shape: tuple[int, int],
    ) -> pd.DataFrame:
        valid = np.asarray(props["valid"][well_index])
        area_all = np.asarray(props["area"][well_index])
        keep = valid & (area_all >= self.config.min_size)
        if self.config.remove_edge_cells and self.config.method == "classical":
            # border cut from bboxes on host (free) instead of a device-side
            # relabel pass; matches skimage.segmentation.clear_border
            h, w = image_shape
            keep &= (
                (np.asarray(props["bbox_min_row"][well_index]) > 0)
                & (np.asarray(props["bbox_min_col"][well_index]) > 0)
                & (np.asarray(props["bbox_max_row"][well_index]) < h)
                & (np.asarray(props["bbox_max_col"][well_index]) < w)
            )
        data: dict[str, np.ndarray] = {}
        order = [
            "label",
            "area",
            "centroid_y",
            "centroid_x",
            "perimeter",
            "eccentricity",
            "axis_major_length",
            "axis_minor_length",
            "orientation",
            "extent",
        ]
        for name in order:
            data[name] = np.asarray(props[name][well_index])[keep]
        # consecutive label numbering after the host-side size cut
        data["label"] = np.arange(1, int(keep.sum()) + 1, dtype=np.int64)
        area = data["area"]
        perim = data["perimeter"]
        data["circularity"] = np.where(perim > 0, 4 * np.pi * area / perim**2, 0.0)
        a = data["axis_major_length"] / 2
        b = data["axis_minor_length"] / 2
        data["volume"] = np.where((a > 0) & (b > 0), 4 / 3 * np.pi * a * b * b, 0.0)
        for ci, stats in intensity.items():
            suffix = channels[ci].name.lower() if channels else f"ch{ci}"
            for stat_name, values in stats.items():
                data[f"{stat_name}_{suffix}"] = np.asarray(values[well_index])[keep]
        return pd.DataFrame(data)

    def _well_health_problem(
        self, health: dict[str, np.ndarray], well_index: int, config: PlateRunConfig
    ) -> tuple[str, str] | None:
        """Inspect the device-side health scalars for one well.

        Returns None when the well is trustworthy, otherwise a
        (kind, message) pair: kind "capacity" triggers an automatic
        re-dispatch with escalated static capacities; kind "fatal" fails the
        well with a SegmentationWarning (the same isolation contract as a
        decode error - no silent corruption).
        """
        n_comp = int(health["num_components"][well_index])
        if n_comp > config.max_cells:
            return (
                "capacity",
                f"{n_comp} components exceed max_cells={config.max_cells}",
            )
        if bool(health["fg_overflow"][well_index]):
            return (
                "capacity",
                "foreground pixels exceed the compaction capacity "
                f"(fg_cap_fraction={config.fg_cap_fraction})",
            )
        if not bool(health["converged"][well_index]):
            return (
                "capacity",
                "connected-components labeling did not converge (boundary-edge "
                f"capacity pair_cap={config.pair_cap} exceeded, or pathological "
                "component shapes); results would be unreliable",
            )
        return None

    def run(
        self,
        layout: MicroplateLayout,
        image_source: Mapping[str, np.ndarray] | Callable[[str], np.ndarray],
        channels: list[Channel] | None = None,
        show_progress: bool = False,
        prefetch: int | None = None,
        max_inflight: int = 4,
    ) -> PlateResults:
        """Process every well of `layout`.

        The run is a three-stage asynchronous pipeline: host decode (worker
        threads), device dispatch (async - JAX queues the batch and returns),
        and result drain (blocking host readback). Dispatches run ahead of
        drains by up to `max_inflight` batches, so a slow host<->device link
        overlaps transfers with compute and with the next batches' decode
        instead of serializing them (the reference decodes and computes
        strictly serially; here the reported decode_s and device_s timings
        can overlap and sum past the wall time).

        Args:
            layout: The plate layout (well ids drive scheduling).
            image_source: Mapping or callable well_id -> (C, H, W) uint16
                array. Host decode errors are isolated per well.
            channels: Channel identities for intensity-stat naming.
            show_progress: Display a progress bar over batches.
            prefetch: Batches decoded ahead on a worker pool (one thread per
                in-flight batch; None = one per host core). 0 disables
                decode pipelining. With prefetch > 1 the image_source is
                invoked from multiple threads concurrently and must be
                thread-safe - open a fresh file handle per call (as
                `load_nd2` / `load_lif_image` do) rather than sharing one
                seekable handle.
            max_inflight: Dispatched-but-undrained batch cap. Bounds host +
                device memory (each in-flight batch keeps its decoded images
                alive for capacity retries) while letting result readbacks
                lag behind compute.

        Returns:
            PlateResults with one table per well (None for failed wells).
        """
        import os
        from collections import deque

        if prefetch is None:
            # one decode worker per host core: more workers than cores only
            # interleave decodes on the same CPU (each batch's wall time then
            # includes the other's compute - the round-3 bench recorded 65x
            # inflated decode_s exactly this way on a 1-core host)
            prefetch = os.cpu_count() or 1
        timings = {
            "decode_s": 0.0,
            "decode_cpu_s": 0.0,
            "decode_wells": 0.0,
            "device_s": 0.0,
            "assemble_s": 0.0,
        }
        manifest = self._load_manifest()
        tables: dict[str, pd.DataFrame | None] = {}

        def fetch(well_id: str) -> np.ndarray | None:
            try:
                img = (
                    image_source(well_id)
                    if callable(image_source)
                    else image_source[well_id]
                )
                img = np.asarray(img)
                if img.ndim == 2:
                    img = img[None]
                return img
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"Failed to load image for well {well_id}: {e}",
                    SegmentationWarning,
                    stacklevel=2,
                )
                return None

        pending_ids: list[str] = []
        for well_id in layout.well_ids:
            cached = self._load_well(manifest, well_id)
            if cached is not None:
                tables[well_id] = cached
            else:
                pending_ids.append(well_id)

        batch_size = self._batch_size()
        batches = [
            pending_ids[i : i + batch_size]
            for i in range(0, len(pending_ids), batch_size)
        ]

        def dispatch_async(
            images: list[np.ndarray],
            ok_ids: list[str],
            config: PlateRunConfig,
            retryable: bool,
        ) -> dict | None:
            """Stage + enqueue one batch; returns a pending record to drain.

            JAX dispatch is asynchronous: this issues the H2D transfer and
            the program and starts the result D2H copy without waiting, so
            the device queue stays full while the host decodes ahead. The
            decoded images ride along in the record for capacity retries.
            """
            t0 = time.time()
            try:
                padded = images + [images[-1]] * (batch_size - len(images))
                staged = jax.device_put(np.stack(padded), self._input_sharding())
                n_channels = staged.shape[1]
                image_shape = tuple(staged.shape[-2:])
                program = self._get_compiled(n_channels, image_shape, config)
                packed, health_vec = program(staged)
                # start the (small) result readback immediately: the copy
                # overlaps later batches' decode/compute instead of stalling
                # the drain on a slow host<->device link
                packed.copy_to_host_async()
                health_vec.copy_to_host_async()
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"Device batch failed for wells {ok_ids}: {e}",
                    SegmentationWarning,
                    stacklevel=2,
                )
                for well_id in ok_ids:
                    tables[well_id] = None
                timings["device_s"] += time.time() - t0
                return None
            timings["device_s"] += time.time() - t0
            return {
                "images": images,
                "ok_ids": ok_ids,
                "config": config,
                "retryable": retryable,
                "packed": packed,
                "health": health_vec,
                "n_channels": n_channels,
                "image_shape": image_shape,
            }

        def drain(rec: dict | None, retry: dict[str, np.ndarray]) -> None:
            """Materialize one dispatched batch's results into `tables`."""
            if rec is None:
                return
            config: PlateRunConfig = rec["config"]
            ok_ids: list[str] = rec["ok_ids"]
            t0 = time.time()
            try:
                packed_h = np.asarray(rec["packed"])  # ONE readback, all columns
                health_raw = np.asarray(rec["health"])
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"Device batch failed for wells {ok_ids}: {e}",
                    SegmentationWarning,
                    stacklevel=2,
                )
                for well_id in ok_ids:
                    tables[well_id] = None
                return
            finally:
                timings["device_s"] += time.time() - t0

            t0 = time.time()
            measure_idx = (
                config.measure_channel_indices
                if config.measure_channel_indices is not None
                else tuple(range(rec["n_channels"]))
            )
            props_h, intensity_h, health_h = _unpack_outputs(
                packed_h, health_raw, measure_idx
            )
            for i, well_id in enumerate(ok_ids):
                problem = self._well_health_problem(health_h, i, config)
                if problem is not None:
                    kind, message = problem
                    if kind == "capacity" and rec["retryable"]:
                        retry[well_id] = rec["images"][i]
                        continue
                    warnings.warn(
                        f"Well {well_id}: {message}",
                        SegmentationWarning,
                        stacklevel=2,
                    )
                    tables[well_id] = None
                    continue
                table = self._results_to_table(
                    props_h, intensity_h, channels, i, rec["image_shape"]
                )
                tables[well_id] = table
                self._record_well(manifest, well_id, table)
            timings["assemble_s"] += time.time() - t0

        def submit_batch(
            images: list[np.ndarray],
            ok_ids: list[str],
            config: PlateRunConfig,
            retryable: bool,
            inflight: deque,
            retry: dict[str, np.ndarray],
        ) -> None:
            """Dispatch one decoded batch, grouped by image shape.

            Co-batched wells must share a shape to stack; a well whose image
            disagrees (wrong channel count / size) gets its own sub-dispatch
            instead of failing its batchmates (each sub-group still pads to
            batch_size, so no extra program shapes compile).
            """
            groups: dict[tuple, list[int]] = {}
            for i, img in enumerate(images):
                groups.setdefault(img.shape, []).append(i)
            for idxs in groups.values():
                rec = dispatch_async(
                    [images[i] for i in idxs],
                    [ok_ids[i] for i in idxs],
                    config,
                    retryable,
                )
                if rec is not None:
                    inflight.append(rec)
            while len(inflight) > max_inflight:
                drain(inflight.popleft(), retry)

        def load_batch(batch_ids: list[str]):
            """Decode one batch's images (runs on a prefetch worker).

            Workers touch no shared state - failures and decode seconds are
            returned for the main thread to record (a += on the shared
            timings dict from several workers would lose increments).

            Two decode clocks are kept per well: wall seconds around each
            fetch (includes time the worker is descheduled - on a 1-core
            host the main thread's dispatch work inflates it) and the
            worker-thread CPU seconds (the honest cost of the decode
            itself). Summed per well, not per batch, so one batch's window
            never swallows another's.
            """
            images: list[np.ndarray] = []
            ok_ids: list[str] = []
            failed: list[str] = []
            wall = cpu = 0.0
            for well_id in batch_ids:
                t0, c0 = time.time(), time.thread_time()
                img = fetch(well_id)
                wall += time.time() - t0
                cpu += time.thread_time() - c0
                if img is None:
                    failed.append(well_id)
                else:
                    images.append(img)
                    ok_ids.append(well_id)
            return images, ok_ids, failed, (wall, cpu, len(batch_ids))

        def record_batch(loaded):
            """Main-thread bookkeeping for one decoded batch."""
            images, ok_ids, failed, (wall, cpu, n) = loaded
            for well_id in failed:
                tables[well_id] = None
            timings["decode_s"] += wall
            timings["decode_cpu_s"] = timings.get("decode_cpu_s", 0.0) + cpu
            timings["decode_wells"] = timings.get("decode_wells", 0.0) + n
            return images, ok_ids

        retry: dict[str, np.ndarray] = {}
        inflight_results: deque = deque()
        if prefetch > 0:
            # decode batches k+1..k+prefetch on worker threads while the
            # device queue runs batch k: file decode is GIL-releasing (mmap
            # reads + ctypes C++ de-interleave), so decodes parallelize
            # across host cores and overlap device compute
            from concurrent.futures import ThreadPoolExecutor

            progress = None
            if show_progress:
                from ..utils import get_tqdm

                progress = get_tqdm()(total=len(batches), desc="Plate")
            with ThreadPoolExecutor(max_workers=max(1, prefetch)) as pool:
                decoding = deque(
                    pool.submit(load_batch, b) for b in batches[:prefetch]
                )
                next_idx = min(prefetch, len(batches))
                while decoding:
                    images, ok_ids = record_batch(decoding.popleft().result())
                    if next_idx < len(batches):
                        decoding.append(pool.submit(load_batch, batches[next_idx]))
                        next_idx += 1
                    if images:
                        submit_batch(
                            images, ok_ids, self.config, True, inflight_results, retry
                        )
                    if progress is not None:
                        progress.update(1)
            if progress is not None:
                progress.close()
        else:
            iterator = batches
            if show_progress:
                from ..utils import get_tqdm

                iterator = get_tqdm()(batches, desc="Plate")
            for batch_ids in iterator:
                images, ok_ids = record_batch(load_batch(batch_ids))
                if images:
                    submit_batch(
                        images, ok_ids, self.config, True, inflight_results, retry
                    )
        while inflight_results:
            drain(inflight_results.popleft(), retry)

        # capacity escalation: re-dispatch dense wells with 4x / 16x the
        # static foreground + cell capacities before giving up on them.
        # Retries are grouped by image shape - they can come from different
        # original batches, and a dispatch stacks its wells into one array.
        for level in (1, 2):
            if not retry:
                break
            esc = self._escalated_config(level)
            current, retry = retry, {}
            by_shape: dict[tuple, list[str]] = {}
            for w in current:
                by_shape.setdefault(tuple(current[w].shape), []).append(w)
            for ids in by_shape.values():
                for i in range(0, len(ids), batch_size):
                    bids = ids[i : i + batch_size]
                    drain(
                        dispatch_async(
                            [current[w] for w in bids], bids, esc, level < 2
                        ),
                        retry,
                    )

        return PlateResults(tables, timings)
