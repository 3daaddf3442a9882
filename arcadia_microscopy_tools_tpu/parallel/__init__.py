"""Device-mesh scale-out: mesh construction, collectives (halo exchange,
sharded reductions), and the end-to-end plate runner."""

from .collectives import (
    halo_exchange,
    sharded_gaussian_filter,
    sharded_histogram_uint16,
    sharded_otsu_threshold,
)
from .mesh import MeshConfig, create_mesh, replicated, well_sharding
from .plate import PlateResults, PlateRunConfig, PlateRunner

__all__ = [
    "MeshConfig",
    "PlateResults",
    "PlateRunConfig",
    "PlateRunner",
    "create_mesh",
    "halo_exchange",
    "replicated",
    "sharded_gaussian_filter",
    "sharded_histogram_uint16",
    "sharded_otsu_threshold",
    "well_sharding",
]
