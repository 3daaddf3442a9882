"""Deep segmentation: from-scratch JAX U-Net, flow-tracking mask
reconstruction, training, and checkpointing."""

from .flows import compute_masks, flow_error, follow_flows, masks_to_flows
from .segmentation import SegmentationModel, find_best_available_device
from .synthetic import synthesize_cells
from .unet import UNetConfig, apply_unet, count_params, init_unet

__all__ = [
    "SegmentationModel",
    "UNetConfig",
    "apply_unet",
    "compute_masks",
    "count_params",
    "find_best_available_device",
    "flow_error",
    "follow_flows",
    "init_unet",
    "masks_to_flows",
    "synthesize_cells",
]
