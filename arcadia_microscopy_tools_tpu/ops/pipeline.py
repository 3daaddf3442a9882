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
    """An image-processing step frozen together with its configuration.

    Binding (func, args, kwargs) into one immutable, hashable object lets a
    Pipeline use the operation tuple as a compilation-cache key: the same
    sequence of configured steps always maps to the same jitted program.
    Pure-jnp functions fuse into that program; anything else still runs via
    the eager fallback.
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
        """Run the wrapped function on *intensities* with the bound config."""
        return self.func(intensities, *self.args, **self.kwargs)

    def _identity(self) -> tuple:
        return (self.func, self.args, tuple(sorted(self.kwargs.items())))

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, ImageOperation):
            return NotImplemented
        return self._identity() == other._identity()

    def __hash__(self) -> int:
        return hash(self._identity())

    def __repr__(self) -> str:
        parts = [repr(a) for a in self.args]
        parts += [f"{k}={v!r}" for k, v in self.kwargs.items()]
        return f"{self.func.__name__}({', '.join(parts)})"


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
    """An ordered stack of ImageOperations executed as one device program.

    Calling the pipeline traces the whole operation fold once and jits it, so
    XLA fuses consecutive steps and keeps intermediates on device. Args:

        operations: the steps, in application order.
        copy: accepted for reference-API compatibility; jitted programs never
            mutate inputs so copying is implicit (a warning fires if combined
            with parallel=True, as in the reference).
        preserve_dtype: cast the result back to the input dtype when True;
            otherwise the dtype follows the math (uint16 in, float out).
        parallel: vmap the fold over axis 0 (stacks/timelapses; input must be
            >= 3D). One batched program replaces the reference's thread pool.
        max_workers: accepted for compatibility and unused — XLA schedules
            its own parallelism. Must be >= 1 when given.
    """

    operations: list[ImageOperation]
    copy: bool = False
    preserve_dtype: bool = False
    parallel: bool = False
    max_workers: int | None = None

    def __post_init__(self) -> None:
        self.operations = list(self.operations)
        if len(self.operations) == 0:
            raise ValueError("Pipeline must have at least one operation")
        for op in self.operations:
            if not callable(op):
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
        and for API compatibility).

        `copy=True` protects the caller's array from in-place-mutating host
        operations exactly as the reference does (`amt/pipeline.py:117-121`);
        on the jitted path copying is implicit because traced programs never
        mutate their inputs.
        """
        out = intensities.copy() if self.copy else intensities
        for operation in self.operations:
            out = operation(out)
        return out

    @staticmethod
    def _shard_frames(x):
        """Distribute the leading (frame) axis across every visible device.

        The reference's parallel mode is a host thread pool; here each frame
        is an independent program instance, so laying the stack out over a
        1-D device mesh makes XLA run the vmapped fold data-parallel with no
        collectives. A frame count that does not divide the device count is
        padded (repeating the last frame) so every device still gets an equal
        shard instead of silently degrading to one device; the caller slices
        the result back to the true count.

        Returns (sharded array, true frame count).
        """
        n = x.shape[0]
        devices = jax.devices()
        if len(devices) <= 1:
            return x, n
        ndev = len(devices)
        rem = n % ndev
        if rem:
            pad = jnp.broadcast_to(x[-1:], (ndev - rem,) + x.shape[1:])
            x = jnp.concatenate([x, pad], axis=0)
        mesh = jax.sharding.Mesh(np.array(devices), ("frames",))
        spec = jax.sharding.PartitionSpec("frames")
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec)), n

    def __call__(self, intensities):
        """Run the fused fold on *intensities* (vmapped over axis 0 when
        parallel=True, which requires >= 3D input; the stack is sharded
        across all visible devices when the frame count allows). NumPy input
        returns NumPy (floats widened to float64); device input stays on
        device."""
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

        x = jnp.asarray(intensities)
        n_frames = None
        if self.parallel:
            x, n_frames = self._shard_frames(x)
        try:
            result = fold(x)
            if n_frames is not None and result.shape[0] != n_frames:
                result = result[:n_frames]
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
        return len(self.operations)

    def __repr__(self) -> str:
        flags = {
            "copy": self.copy,
            "preserve_dtype": self.preserve_dtype,
            "parallel": self.parallel,
            "max_workers": self.max_workers,
        }
        shown = [f"{k}={v}" for k, v in flags.items() if v not in (False, None)]
        inner = ", ".join(repr(op) for op in self.operations)
        tail = (", " + ", ".join(shown)) if shown else ""
        return f"Pipeline([{inner}]{tail})"
