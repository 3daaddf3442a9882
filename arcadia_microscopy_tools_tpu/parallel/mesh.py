"""Device mesh construction and sharding helpers.

The reference's only parallelism is a host thread pool
(`src/arcadia_microscopy_tools/pipeline.py:139-149`); here the unit of
scale-out is a `jax.sharding.Mesh`. HCS plates are embarrassingly parallel
across wells, so the primary axis is data parallelism ("wells"); a second
optional axis ("space") spatially shards very large tiles, with halo
exchange provided by `parallel.collectives`.

Configuration follows the reference's dataclass-with-defaults style: one
explicit `MeshConfig`, resolved eagerly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "MeshConfig",
    "create_mesh",
    "create_multihost_mesh",
    "well_sharding",
    "plate_sharding_multihost",
    "replicated",
]

WELL_AXIS = "wells"
SPACE_AXIS = "space"
HOST_AXIS = "hosts"


@dataclass(frozen=True)
class MeshConfig:
    """Mesh configuration.

    Attributes:
        n_devices: Number of devices to use (None = all available).
        space_parallelism: Devices per image for spatial sharding (1 = each
            image lives on one chip; >1 shards the Y axis across chips with
            halo exchange for stencil ops).
    """

    n_devices: int | None = None
    space_parallelism: int = 1

    def resolve_devices(self) -> list[jax.Device]:
        devices = jax.devices()
        n = self.n_devices if self.n_devices is not None else len(devices)
        if n > len(devices):
            raise ValueError(f"Requested {n} devices but only {len(devices)} available")
        return devices[:n]


def create_mesh(config: MeshConfig | None = None) -> Mesh:
    """Build a (wells, space) mesh over the available devices."""
    config = config or MeshConfig()
    devices = config.resolve_devices()
    n = len(devices)
    sp = config.space_parallelism
    if n % sp != 0:
        raise ValueError(f"space_parallelism={sp} must divide device count {n}")
    grid = np.array(devices).reshape(n // sp, sp)
    return Mesh(grid, axis_names=(WELL_AXIS, SPACE_AXIS))


def create_multihost_mesh(
    n_hosts: int, config: MeshConfig | None = None
) -> Mesh:
    """Build a (hosts, wells, space) mesh for multi-host plates.

    The `hosts` axis is the DCN boundary: `jax.devices()` orders devices by
    process, so reshaping (n_hosts, per_host_wells, space) puts cross-host
    traffic on the OUTER axis only - gradient all-reduces ride DCN once per
    step while well/space collectives stay on each slice's ICI (the layout
    recipe of the scaling playbook). Works identically on a virtual CPU
    topology, which is how `dryrun_multichip` exercises it without a second
    host.

    Scope: this builds the mesh for a SINGLE-CONTROLLER program (one Python
    process seeing all devices - megascale/virtual topologies, or
    jax.distributed single-controller runs). On multi-PROCESS deployments
    each process must additionally construct its batch shards with
    `jax.make_array_from_process_local_data` and gather results with
    `multihost_utils` - `PlateRunner`'s host-side feeding does not do that
    yet and is validated on single-controller topologies only.
    """
    config = config or MeshConfig()
    devices = config.resolve_devices()
    n = len(devices)
    sp = config.space_parallelism
    if n % (n_hosts * sp) != 0:
        raise ValueError(
            f"n_hosts={n_hosts} x space_parallelism={sp} must divide device "
            f"count {n}"
        )
    grid = np.array(devices).reshape(n_hosts, n // (n_hosts * sp), sp)
    return Mesh(grid, axis_names=(HOST_AXIS, WELL_AXIS, SPACE_AXIS))


def plate_sharding_multihost(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    """Batch sharding over the combined (hosts, wells) axes of a multi-host
    mesh: each host's slice takes a contiguous block of the plate batch, and
    within the slice wells spread over ICI exactly as in `well_sharding`."""
    if spatial:
        return NamedSharding(
            mesh, PartitionSpec((HOST_AXIS, WELL_AXIS), None, SPACE_AXIS, None)
        )
    return NamedSharding(mesh, PartitionSpec((HOST_AXIS, WELL_AXIS)))


def well_sharding(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    """Sharding for a (B, C, H, W) well batch: batch over the wells axis;
    when `spatial`, additionally shard the image rows (H) over the space
    axis, so one well's frame spans several chips (XLA inserts the halo /
    reduction collectives for the stencil and histogram stages)."""
    if spatial:
        return NamedSharding(mesh, PartitionSpec(WELL_AXIS, None, SPACE_AXIS, None))
    return NamedSharding(mesh, PartitionSpec(WELL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (e.g. model weights on every chip)."""
    return NamedSharding(mesh, PartitionSpec())
