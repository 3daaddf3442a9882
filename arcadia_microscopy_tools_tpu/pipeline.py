"""Pipeline facade (reference module parity:
`src/arcadia_microscopy_tools/pipeline.py`)."""

from .ops.pipeline import ImageOperation, Pipeline

__all__ = ["ImageOperation", "Pipeline"]
