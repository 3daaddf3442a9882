"""Compile-time pipeline composition.

API twin of the reference pipeline engine (`src/arcadia_microscopy_tools/
pipeline.py:11-173`) with a different execution model: instead of a Python
loop over operations (and a ThreadPoolExecutor over axis 0 in parallel mode),
the operation fold is traced ONCE into a single jitted XLA program, so
consecutive ops fuse into one device kernel launch and intermediates stay in
HBM/VMEM. `parallel=True` keeps the reference's "map over the leading axis"
semantics but lowers to `jax.vmap` - every frame of a timelapse/z-stack is
processed in one batched program rather than one thread per frame.

Host dtype contract: NumPy in -> NumPy out, with floating results upcast to
float64 (the reference's output dtype); JAX array in -> JAX array out
(float32, stays on device). `preserve_dtype=True` casts back to the input
dtype in both modes. `copy` and `max_workers` are accepted for API
compatibility; they are no-ops because jitted programs never mutate their
inputs and XLA owns its own parallelism.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ImageOperation", "Pipeline"]


class ImageOperation:
    """A callable wrapper for image processing functions.

    Stores a function along with its args and kwargs for later execution on an
    image intensity array. Allows for convenient composition of image
    processing pipelines. The wrapped function must be traceable (pure jnp) for
    the pipeline to fuse it into a single device program; non-traceable
    functions still work but fall back to eager execution.

    Args:
        func: The image processing function to wrap.
        *args: Positional arguments to pass to the function.
        **kwargs: Keyword arguments to pass to the function.
    """

    __slots__ = ("func", "args", "kwargs")

    def __init__(self, func: Callable, *args: object, **kwargs: object) -> None:
        object.__setattr__(self, "func", func)
        object.__setattr__(self, "args", args)
        object.__setattr__(self, "kwargs", kwargs)

    def __setattr__(self, name: str, value: object) -> None:
        raise AttributeError("ImageOperation instances are immutable")

    def __delattr__(self, name: str) -> None:
        raise AttributeError("ImageOperation instances are immutable")

    def __call__(self, intensities):
        """Apply the operation to an image.

        Args:
            intensities: Input image as an array of intensity values.

        Returns:
            The processed image intensity array.
        """
        return self.func(intensities, *self.args, **self.kwargs)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, ImageOperation):
            return NotImplemented
        return (
            self.func == other.func and self.args == other.args and self.kwargs == other.kwargs
        )

    def __hash__(self) -> int:
        return hash((self.func, self.args, tuple(sorted(self.kwargs.items()))))

    def __repr__(self) -> str:
        args_repr = [repr(arg) for arg in self.args]
        kwargs_repr = [f"{key}={repr(value)}" for key, value in self.kwargs.items()]
        args_kwargs_repr = ", ".join(args_repr + kwargs_repr)
        return f"{self.func.__name__}({args_kwargs_repr})"


@lru_cache(maxsize=256)
def _compiled_fold(
    operations: tuple[ImageOperation, ...],
    parallel: bool,
    preserve_dtype: bool,
):
    """Build (and cache) the jitted operation fold for a pipeline signature."""

    def fold(x):
        out = x
        for operation in operations:
            out = operation(out)
        if preserve_dtype and out.dtype != x.dtype:
            out = out.astype(x.dtype)
        return out

    if parallel:
        return jax.jit(jax.vmap(fold))
    return jax.jit(fold)


@dataclass
class Pipeline:
    """A sequence of image processing operations compiled to one device program.

    Combines multiple image operations into a single callable pipeline that
    applies each operation in sequence to an input image.

    Attributes:
        operations: List of ImageOperation instances to apply in sequence.
        copy: Accepted for API compatibility with the reference; jitted
            programs never mutate their input, so this is always effectively
            True. Ignored when parallel=True (warning emitted, matching the
            reference).
        preserve_dtype: If True, forces output to have the same dtype as input.
            If False, allows dtype to change based on operations (e.g.,
            uint16 -> float for normalization). Default is False.
        parallel: If True, maps the operation fold over the first axis via
            `jax.vmap` (timelapse, z-stack, or multi-channel data). Requires at
            least 3D input. Default is False.
        max_workers: Accepted for API compatibility; XLA owns parallel
            execution, so this has no effect (must still be >= 1 if given).
    """

    operations: list[ImageOperation]
    copy: bool = False
    preserve_dtype: bool = False
    parallel: bool = False
    max_workers: int | None = None

    def __post_init__(self) -> None:
        """Validate the pipeline configuration."""
        if isinstance(self.operations, tuple):
            self.operations = list(self.operations)
        if not self.operations:
            raise ValueError("Pipeline must have at least one operation")
        if not all(callable(op) for op in self.operations):
            raise TypeError(
                "All operations must be callable (wrap functions with ImageOperation)"
            )
        if self.max_workers is not None and self.max_workers < 1:
            raise ValueError(f"max_workers must be at least 1, got {self.max_workers}")
        if self.parallel and self.copy:
            warnings.warn(
                "copy=True has no effect when parallel=True. "
                "Parallel mode always produces a new output array.",
                UserWarning,
                stacklevel=2,
            )

    def _apply_operations(self, intensities):
        """Apply all operations to an image array (eager; used as a fallback
        and for API compatibility)."""
        out = intensities
        for operation in self.operations:
            out = operation(out)
        return out

    def __call__(self, intensities):
        """Apply the pipeline to an image.

        When parallel=False, applies the fused operation fold to the entire
        array. When parallel=True, vmaps the fold over the first axis
        (requires at least 3D input).

        Args:
            intensities: Input image (NumPy or JAX array).

        Returns:
            The processed image array. NumPy in -> NumPy out (floating results
            as float64); JAX in -> JAX out (on device).

        Raises:
            ValueError: If parallel=True and input has fewer than 3 dimensions.
        """
        if self.parallel and intensities.ndim < 3:
            raise ValueError(
                f"Parallel mode requires at least 3D input (got {intensities.ndim}D). "
                "The first axis is used to distribute work across devices."
            )

        is_host_input = isinstance(intensities, np.ndarray)
        try:
            fold = _compiled_fold(
                tuple(self.operations), self.parallel, self.preserve_dtype
            )
        except TypeError:
            # unhashable operation config (e.g. an ndarray kernel argument):
            # build the jitted fold without the cache
            fold = _compiled_fold.__wrapped__(
                tuple(self.operations), self.parallel, self.preserve_dtype
            )

        try:
            result = fold(jnp.asarray(intensities))
        except (
            jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError,
        ):
            # An operation is not traceable - it converts traced values to
            # host arrays, or branches on data (Tracer{Bool,Integer}Conversion
            # errors are ConcretizationTypeError subclasses): fall back to
            # eager per-op execution with the same semantics (per-frame when
            # parallel, matching the reference's thread map over axis 0).
            host = np.asarray(intensities)
            if self.parallel:
                result = np.stack([self._apply_operations(f) for f in host])
            else:
                result = self._apply_operations(host)
            if self.preserve_dtype and result.dtype != intensities.dtype:
                result = result.astype(intensities.dtype)
            return result

        if is_host_input:
            host = np.asarray(result)
            if not self.preserve_dtype and np.issubdtype(host.dtype, np.floating):
                host = host.astype(np.float64)
            return host
        return result

    def __len__(self) -> int:
        """Return the number of operations in the pipeline."""
        return len(self.operations)

    def __repr__(self) -> str:
        operations_repr = ", ".join(repr(operation) for operation in self.operations)
        params = []
        if self.copy:
            params.append("copy=True")
        if self.preserve_dtype:
            params.append("preserve_dtype=True")
        if self.parallel:
            params.append("parallel=True")
        if self.max_workers is not None:
            params.append(f"max_workers={self.max_workers}")
        params_str = f", {', '.join(params)}" if params else ""
        return f"Pipeline([{operations_repr}]{params_str})"
