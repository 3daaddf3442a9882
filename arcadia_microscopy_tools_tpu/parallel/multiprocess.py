"""Multi-process (multi-controller) plate execution.

Real multi-host TPU deployments run ONE Python process per host; each
process addresses only its local chips and must (a) initialize the
distributed runtime, (b) build global sharded arrays from process-local
data, and (c) gather results across processes. The reference has no
distributed runtime at all (its only parallelism is a host thread pool,
`src/arcadia_microscopy_tools/pipeline.py:139-149`); this module supplies
the TPU-native one on top of `jax.distributed` +
`jax.make_array_from_process_local_data` + `multihost_utils`.

Layout: the plate batch is sharded over the combined (hosts, wells) mesh
axes (`parallel/mesh.py:plate_sharding_multihost`), so each process's
decoded wells form exactly the shards it addresses - the H2D feed is purely
local, and only the (tiny) packed per-cell result rides DCN in the final
all-gather. Validated by `tools/dryrun_multiprocess.py`: a 2-process CPU
launch is asserted bit-identical to the single-process run.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Callable, Mapping

import numpy as np

from ..exceptions import SegmentationWarning

__all__ = ["initialize_distributed", "run_plate_multiprocess"]


def initialize_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """Initialize this process's slice of the distributed runtime.

    Must run before any other JAX call initializes a backend. On TPU pods
    the three arguments are normally discovered from the environment and
    `jax.distributed.initialize()` needs no arguments; passing them
    explicitly also covers CPU dryruns (`local_device_count` virtual
    devices per process) and manual GPU-style launches.
    """
    import jax

    if local_device_count is not None:
        # strip a conflicting host-platform-device-count flag the parent may
        # have exported for its own virtual topology
        flags = os.environ.get("XLA_FLAGS", "")
        if "force_host_platform_device_count" in flags:
            os.environ["XLA_FLAGS"] = " ".join(
                f for f in flags.split() if "force_host_platform_device_count" not in f
            )
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address, num_processes=num_processes, process_id=process_id
    )


def run_plate_multiprocess(
    layout: Any,
    image_source: Mapping[str, np.ndarray] | Callable[[str], np.ndarray],
    config: Any = None,
    channels: list | None = None,
    unet_params: Any = None,
    space_parallelism: int = 1,
):
    """Process every well of `layout` across all participating processes.

    Every process calls this with the SAME layout and config (the usual
    multi-controller SPMD contract). Wells are assigned round-robin by
    global batch: batch k covers wells [k*G, (k+1)*G) of the layout order,
    G = process_count * wells_per_process_per_batch, and each process
    decodes only the contiguous block of each batch that lands on its local
    devices. Results are all-gathered, so every process returns the full
    `PlateResults`.

    Failure isolation matches `PlateRunner.run`: a well whose decode raises
    is warned (`SegmentationWarning`) and reported as None without
    disturbing its batchmates - its slot is fed zeros, which every process
    discards identically. Capacity escalation re-dispatches the whole batch
    at 4x/16x capacities (the health vector is allgathered, so all
    processes take the same branch).

    Checkpoint/resume is intentionally not wired here: per-well CSVs would
    need a shared filesystem across hosts; run one `PlateRunner` per host
    for resumable single-host plates.
    """
    import jax
    from jax.experimental import multihost_utils

    from .mesh import MeshConfig, create_multihost_mesh, plate_sharding_multihost
    from .plate import PlateRunConfig, PlateResults, PlateRunner, _unpack_outputs

    config = config or PlateRunConfig()
    n_proc = jax.process_count()
    pid = jax.process_index()
    mesh = create_multihost_mesh(
        n_proc, MeshConfig(space_parallelism=space_parallelism)
    )
    sharding = plate_sharding_multihost(mesh, spatial=space_parallelism > 1)

    # reuse PlateRunner's compile cache / table assembly / health triage on a
    # runner bound to the multihost mesh
    runner = PlateRunner(config, unet_params=unet_params, mesh=mesh)

    wells_axis = mesh.shape["wells"]
    G = (
        config.batch_size
        if config.batch_size is not None
        else mesh.shape["hosts"] * wells_axis
    )
    if G % n_proc != 0:
        raise ValueError(
            f"batch_size={G} must be divisible by process_count={n_proc}"
        )
    n_batch_devices = mesh.shape["hosts"] * wells_axis
    if G % n_batch_devices != 0:
        raise ValueError(
            f"batch_size={G} must be divisible by the mesh's batch device "
            f"count hosts*wells={n_batch_devices} "
            f"(hosts={mesh.shape['hosts']}, wells={wells_axis}); "
            "make_array_from_process_local_data requires an even split"
        )
    per_proc = G // n_proc

    ids = list(layout.well_ids)
    tables: dict[str, Any] = {}
    timings = {
        "decode_s": 0.0,
        "decode_cpu_s": 0.0,
        "decode_wells": 0.0,
        "device_s": 0.0,
        "assemble_s": 0.0,
    }

    def fetch(well_id: str) -> np.ndarray | None:
        try:
            img = (
                image_source(well_id)
                if callable(image_source)
                else image_source[well_id]
            )
            img = np.asarray(img)
            return img[None] if img.ndim == 2 else img
        except Exception as e:  # noqa: BLE001
            warnings.warn(
                f"Failed to load image for well {well_id}: {e}",
                SegmentationWarning,
                stacklevel=2,
            )
            return None

    import time

    for start in range(0, len(ids), G):
        batch_ids = ids[start : start + G]
        # this process decodes its contiguous per_proc block of the batch
        lo = pid * per_proc
        my_ids = batch_ids[lo : lo + per_proc]
        local_imgs: list[np.ndarray | None] = []
        t0, c0 = time.time(), time.process_time()
        for wid in my_ids:
            local_imgs.append(fetch(wid))
        timings["decode_s"] += time.time() - t0
        timings["decode_cpu_s"] += time.process_time() - c0
        timings["decode_wells"] += len(my_ids)

        # shape agreement: every process must stack to the same (C, H, W).
        # Use the first successful decode's shape, agreed across processes
        # via an allgather of candidate shapes (failed wells get zeros).
        shapes = [i.shape for i in local_imgs if i is not None]
        local_shape = np.array(
            shapes[0] if shapes else (0, 0, 0), dtype=np.int64
        )
        all_shapes = np.asarray(
            multihost_utils.process_allgather(local_shape, tiled=False)
        ).reshape(n_proc, 3)
        valid_shapes = all_shapes[all_shapes[:, 1] > 0]
        if len(valid_shapes) == 0:
            for wid in batch_ids:
                tables.setdefault(wid, None)
            continue
        shape = tuple(int(x) for x in valid_shapes[0])
        failed_local = np.zeros(per_proc, dtype=bool)
        block = np.zeros((per_proc,) + shape, dtype=np.uint16)
        for i, img in enumerate(local_imgs):
            if img is None or img.shape != shape:
                if img is not None:
                    warnings.warn(
                        f"Well {my_ids[i]}: image shape {img.shape} disagrees "
                        f"with the batch shape {shape}; well failed",
                        SegmentationWarning,
                        stacklevel=2,
                    )
                failed_local[i] = True
            else:
                block[i] = img
        # pad the tail batch: unused slots stay zero and are dropped below
        n_real = len(my_ids)

        t0 = time.time()
        global_batch = jax.make_array_from_process_local_data(sharding, block)
        current = config
        packed_h = health_d = None
        for level in (0, 1, 2):
            cfg = current if level == 0 else runner._escalated_config(level)
            program = runner._get_compiled(shape[0], shape[1:], cfg)
            packed, health = program(global_batch)
            packed_h = np.asarray(
                multihost_utils.process_allgather(packed, tiled=True)
            )
            health_h = np.asarray(
                multihost_utils.process_allgather(health, tiled=True)
            )
            measure_idx = (
                cfg.measure_channel_indices
                if cfg.measure_channel_indices is not None
                else tuple(range(shape[0]))
            )
            props, intensity, health_d = _unpack_outputs(
                packed_h, health_h, measure_idx
            )
            problems = [
                runner._well_health_problem(health_d, i, cfg)
                for i in range(len(batch_ids))
            ]
            needs_retry = any(p is not None and p[0] == "capacity" for p in problems)
            if not needs_retry or level == 2:
                break
        timings["device_s"] += time.time() - t0

        t0 = time.time()
        failed_all = np.asarray(
            multihost_utils.process_allgather(
                np.pad(failed_local, (0, per_proc - len(failed_local))),
                tiled=True,
            )
        )
        for i, wid in enumerate(batch_ids):
            # map batch position -> global array row: process p's block sits
            # at rows [p*per_proc, (p+1)*per_proc)
            if failed_all[i]:
                tables[wid] = None
                continue
            problem = runner._well_health_problem(health_d, i, cfg)
            if problem is not None:
                warnings.warn(
                    f"Well {wid}: {problem[1]}", SegmentationWarning, stacklevel=2
                )
                tables[wid] = None
                continue
            tables[wid] = runner._results_to_table(
                props, intensity, channels, i, shape[1:]
            )
        del n_real
        timings["assemble_s"] += time.time() - t0

    return PlateResults(tables, timings)
