"""Ingest layer: from-scratch ND2/LIF readers, metadata parsers, tile feed."""

from .leica import list_image_names, load_lif_image
from .nikon import load_nd2

__all__ = ["list_image_names", "load_lif_image", "load_nd2"]
