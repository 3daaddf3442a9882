"""Checkpointing for the segmentation U-Net (orbax).

The reference has no checkpointing at all (SURVEY.md section 5); here model
weights are saved/restored with orbax so trained weights survive across
sessions and can be distributed to every chip of a mesh at load time.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_checkpoint(path: str | Path, params: Any) -> None:
    """Save a parameter pytree to an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, params, force=True)
    checkpointer.wait_until_finished()


def load_checkpoint(path: str | Path, target: Any = None) -> Any:
    """Restore a parameter pytree from an orbax checkpoint directory.

    Restores against an abstract target tree so checkpoints written on one
    backend (e.g. the TPU) load on any other (CPU test meshes): without it,
    orbax tries to resurrect the exact device sharding it was saved with.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if target is None:
        target = seeded_params()
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding), target
    )
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, abstract)


def seeded_params(seed: int = 0):
    """Deterministic weights (mechanism-parity mode: the full pipeline runs
    with reproducible, untrained weights)."""
    from .unet import UNetConfig, init_unet

    return init_unet(jax.random.PRNGKey(seed), UNetConfig())
