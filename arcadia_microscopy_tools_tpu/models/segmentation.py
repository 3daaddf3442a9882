"""High-throughput segmentation model wrapper.

API twin of the reference's `SegmentationModel`
(`src/arcadia_microscopy_tools/model.py:28-290`): same defaults (diameter 30,
flow_threshold 0.4, cellprob_threshold 0, niter None, batch_size 8), same
validation ranges, the same lazy model load-and-cache, and the same
`batch_segment` per-image failure isolation (SegmentationWarning + None
placeholder, index alignment preserved).

What changed underneath: the Cellpose/PyTorch model and CUDA/MPS device pick
are replaced by the from-scratch JAX U-Net (`models.unet`), flow-tracking
reconstruction (`models.flows`), and JAX device/mesh discovery - on TPU the
network runs in bfloat16 on the MXU and the whole forward + mask
reconstruction is one fused jitted program per input shape.
"""

from __future__ import annotations

import logging
import warnings
from collections.abc import Sequence
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..exceptions import SegmentationWarning
from ..typing import Float64Array, Int64Array
from ..utils import get_tqdm
from .flows import compute_masks
from .unet import UNetConfig, apply_unet, init_unet

logger = logging.getLogger(__name__)

_DOWNSAMPLE_MULTIPLE = 16  # pad H, W to this multiple for the U-Net


class SegmentationParams(TypedDict):
    """Resolved parameters for a segmentation run."""

    diameter: float
    flow_threshold: float
    cellprob_threshold: float
    niter: int | None
    batch_size: int


def find_best_available_device() -> jax.Device:
    """Pick the best compute device: TPU > GPU > CPU (the analogue of the
    reference's CUDA > MPS > CPU selection, model.py:134-158)."""
    devices = jax.devices()
    by_kind = {d.platform: d for d in reversed(devices)}
    if "tpu" in by_kind:
        device = by_kind["tpu"]
        logger.info(f"Using TPU: {device.device_kind} ({len(jax.devices('tpu'))} chips visible)")
    elif "gpu" in by_kind:
        device = by_kind["gpu"]
        logger.info(f"Using GPU: {device.device_kind}")
    else:
        device = devices[0]
        logger.info("No accelerator available. Using CPU.")
    return device


@partial(
    jax.jit,
    static_argnames=(
        "niter", "max_cells", "min_size", "flow_threshold", "allow_pallas",
    ),
)
def _segment_program(
    params,
    image,  # (H, W, 3) float32, already normalized and padded
    cellprob_threshold,
    flow_threshold: float,
    niter: int,
    max_cells: int,
    min_size: int,
    allow_pallas: bool | None = None,
):
    """One fused device program: U-Net forward + flow tracking + QC.

    Accepts either parameter form: the plain tree from `init_unet` or the
    space-to-depth rewrite from `unet_s2d.s2d_params` (the wrapper hands the
    S2D form whenever the padded shape allows it - same outputs to float
    tolerance, ~4x faster on the MXU at high resolution)."""
    if "down0" in params:
        from .unet_s2d import apply_unet_s2d

        out = apply_unet_s2d(params, image[None])[0]
    else:
        out = apply_unet(params, image[None])[0]
    return compute_masks(
        out,
        cellprob_threshold=cellprob_threshold,
        flow_threshold=flow_threshold,
        niter=niter,
        max_cells=max_cells,
        min_size=min_size,
        allow_pallas=allow_pallas,
    )


@partial(
    jax.jit,
    static_argnames=(
        "niter", "max_cells", "min_size", "flow_threshold", "allow_pallas",
    ),
)
def _segment_program_batch(
    params,
    images,  # (B, H, W, 3) float32, already normalized and padded
    cellprob_threshold,
    flow_threshold: float,
    niter: int,
    max_cells: int,
    min_size: int,
    allow_pallas: bool | None = None,
):
    """Batched fused program: the whole batch is ONE device dispatch (forward
    + flow tracking + QC vmapped over images) - the reference's serial
    per-image loop (model.py:276-288) is the inefficiency this replaces."""
    if "down0" in params:
        from .unet_s2d import apply_unet_s2d

        out = apply_unet_s2d(params, images)
    else:
        out = apply_unet(params, images)
    return jax.vmap(
        lambda o: compute_masks(
            o,
            cellprob_threshold=cellprob_threshold,
            flow_threshold=flow_threshold,
            niter=niter,
            max_cells=max_cells,
            min_size=min_size,
            allow_pallas=allow_pallas,
        )
    )(out)


@dataclass
class SegmentationModel:
    """U-Net segmentation wrapper for high-throughput cell segmentation.

    Attributes:
        default_cell_diameter_px: Default expected cell diameter in pixels.
            Default is 30 (the training distribution mean, as in Cellpose).
        default_flow_threshold: Default flow error threshold for mask
            generation. Higher values keep more masks. Must be >= 0.
            Default is 0.4.
        default_cellprob_threshold: Default cell probability threshold.
            Higher values yield fewer, more confident masks. Must be between
            -10 and 10. Default is 0.
        default_num_iterations: Default number of flow-integration steps.
            If None, uses a diameter-proportional default.
        default_batch_size: Number of images dispatched to the device at
            once in batched paths. Default is 8.
        device: JAX device for model computation. If None, automatically
            selects the best available device (TPU > GPU > CPU).
        checkpoint_path: Optional orbax checkpoint directory with trained
            weights; otherwise deterministic seeded weights are used (the
            mechanism-parity mode: identical pipeline, untrained network).
        seed: PRNG seed for weight initialization when no checkpoint is given.
    """

    default_cell_diameter_px: float = 30
    default_flow_threshold: float = 0.4
    default_cellprob_threshold: float = 0
    default_num_iterations: int | None = None
    default_batch_size: int = 8
    device: jax.Device | None = field(default=None)
    checkpoint_path: Path | None = None
    seed: int = 0
    max_cells: int = 4096
    min_size: int = 15
    _params: Any = field(default=None, init=False, repr=False)
    _s2d_params: Any = field(default=None, init=False, repr=False)
    _config: UNetConfig = field(default_factory=UNetConfig, init=False, repr=False)

    def __post_init__(self) -> None:
        """Set device if not provided."""
        if self.device is None:
            self.device = find_best_available_device()

    def _resolve_and_validate_parameters(
        self,
        cell_diameter_px: float | None,
        flow_threshold: float | None,
        cellprob_threshold: float | None,
        num_iterations: int | None,
        batch_size: int | None,
    ) -> SegmentationParams:
        """Resolve parameters from provided values or defaults, then validate
        (same ranges as the reference, model.py:117-132)."""
        params: SegmentationParams = {
            "diameter": cell_diameter_px
            if cell_diameter_px is not None
            else self.default_cell_diameter_px,
            "flow_threshold": flow_threshold
            if flow_threshold is not None
            else self.default_flow_threshold,
            "cellprob_threshold": cellprob_threshold
            if cellprob_threshold is not None
            else self.default_cellprob_threshold,
            "niter": num_iterations if num_iterations is not None else self.default_num_iterations,
            "batch_size": batch_size if batch_size is not None else self.default_batch_size,
        }

        if params["diameter"] <= 0:
            raise ValueError(f"Cell diameter [px] must be positive, got {params['diameter']}")
        if params["flow_threshold"] < 0:
            raise ValueError(
                f"Flow threshold must be non-negative, got {params['flow_threshold']}"
            )
        if not (-10 <= params["cellprob_threshold"] <= 10):
            raise ValueError(
                "Cell probability threshold must be between -10 and 10, got "
                f"{params['cellprob_threshold']}"
            )

        return params

    @property
    def network(self):
        """Lazy-load and cache the network parameters (checkpoint or seeded)."""
        if self._params is None:
            if self.checkpoint_path is not None:
                from .weights import load_checkpoint

                logger.info(f"Loading U-Net weights from {self.checkpoint_path} on {self.device}")
                self._params = load_checkpoint(self.checkpoint_path)
            else:
                logger.info(f"Initializing seeded U-Net weights on {self.device}")
                self._params = init_unet(jax.random.PRNGKey(self.seed), self._config)
            self._params = jax.device_put(self._params, self.device)
        return self._params

    @property
    def _network_fast(self):
        """The S2D-rewritten parameter tree for inference dispatches (built
        once, lazily; padded inputs are always a multiple of 16 so the S2D
        forward is always applicable).

        The rewrite only supports the default 4-level architecture
        (`unet_s2d.apply_unet_s2d` hardcodes the level layout); checkpoints
        with a different depth/width fall back to the plain parameter tree,
        which `_segment_program` routes through the shape-generic
        `apply_unet`."""
        if self._s2d_params is None:
            from .unet_s2d import s2d_params, s2d_supported

            params = self.network
            if s2d_supported(params, self._config):
                self._s2d_params = jax.device_put(
                    s2d_params(params), self.device
                )
            else:
                logger.info(
                    "checkpoint architecture not S2D-rewritable; using the "
                    "plain forward"
                )
                self._s2d_params = params
        return self._s2d_params

    # kept as an alias so reference-style call sites keep working
    cellpose_model = network

    # canonical cell diameter the net is trained at (training radii 3-23 px
    # center on ~30 px diameters; also Cellpose's canonical, model.py:51-52)
    _CANONICAL_DIAMETER = 30.0

    @staticmethod
    def _prepare_image(
        intensities: np.ndarray, scale: float = 1.0
    ) -> tuple[jnp.ndarray, tuple[int, int], tuple[int, int]]:
        """Normalize to [0,1] by the 1-99 percentile stretch (the Cellpose
        input convention), arrange to (H, W, 3), optionally rescale so the
        expected cell diameter hits the canonical training scale (the
        Cellpose diameter mechanism), and pad to the U-Net multiple.

        Returns (device image, original (h, w), scaled (hs, ws))."""
        x = np.asarray(intensities, dtype=np.float32)
        if x.ndim == 2:
            x = x[None]
        if x.ndim != 3:
            raise ValueError(f"Expected ([C], H, W) input, got shape {x.shape}")
        c, h, w = x.shape
        if c > 3:
            x = x[:3]
        elif c < 3:
            x = np.concatenate([x] + [x[-1:]] * (3 - c), axis=0)

        p1 = np.percentile(x, 1, axis=(1, 2), keepdims=True)
        p99 = np.percentile(x, 99, axis=(1, 2), keepdims=True)
        denom = np.maximum(p99 - p1, 1e-6)
        x = np.clip((x - p1) / denom, 0.0, 1.0)

        if abs(scale - 1.0) > 1e-3:
            from scipy.ndimage import zoom

            x = zoom(x, (1.0, scale, scale), order=1)
        hs, ws = x.shape[1], x.shape[2]

        pad_h = (-hs) % _DOWNSAMPLE_MULTIPLE
        pad_w = (-ws) % _DOWNSAMPLE_MULTIPLE
        # "edge" (not "reflect") tolerates pads of any size, so tiny inputs
        # (H or W below the downsample multiple) segment instead of crashing
        # inside np.pad; the pad region only feeds the net's receptive field
        x = np.pad(x, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        return jnp.asarray(np.moveaxis(x, 0, -1)), (h, w), (hs, ws)

    @staticmethod
    def _upscale_labels(
        labels: np.ndarray, shape: tuple[int, int]
    ) -> np.ndarray:
        """Nearest-neighbor resize of a label image back to the original
        grid (labels are categorical; interpolation would invent ids)."""
        hs, ws = labels.shape
        h, w = shape
        if (hs, ws) == (h, w):
            return labels
        yi = np.minimum(((np.arange(h) + 0.5) * hs / h).astype(int), hs - 1)
        xi = np.minimum(((np.arange(w) + 0.5) * ws / w).astype(int), ws - 1)
        return labels[yi[:, None], xi[None, :]]

    def _rescale_factor(self, params: SegmentationParams) -> float:
        """Cellpose diameter semantics: resize the input by canonical /
        diameter so cells reach the scale the net was trained at
        (reference behavior doc model.py:49-56)."""
        return self._CANONICAL_DIAMETER / float(params["diameter"])

    def _resolve_niter(self, params: SegmentationParams) -> int:
        if params["niter"] is not None:
            return int(params["niter"])
        # flow dynamics run in the rescaled space where cells sit at the
        # canonical ~30 px diameter, so the canonical 200 steps suffice for
        # any requested diameter
        return 200

    def segment(
        self,
        intensities: Float64Array,
        cell_diameter_px: float | None = None,
        flow_threshold: float | None = None,
        cellprob_threshold: float | None = None,
        num_iterations: int | None = None,
        batch_size: int | None = None,
        **extra_kwargs: Any,
    ) -> Int64Array:
        """Run cell segmentation on one image.

        Args:
            intensities: Input image with shape ([channel], height, width),
                values typically normalized floats in [0, 1] (raw intensities
                are renormalized internally).
            cell_diameter_px / flow_threshold / cellprob_threshold /
            num_iterations / batch_size: Per-call overrides of the defaults
                (see class attributes).

        Returns:
            Segmentation mask as Int64Array (consecutive labels, bg=0).

        Raises:
            ValueError: If parameters are out of valid ranges.
            RuntimeError: If segmentation fails on device.
        """
        resolved = self._resolve_and_validate_parameters(
            cell_diameter_px, flow_threshold, cellprob_threshold, num_iterations, batch_size
        )
        try:
            image, (h, w), (hs, ws) = self._prepare_image(
                np.asarray(intensities), self._rescale_factor(resolved)
            )
            labels = _segment_program(
                self._network_fast,
                image,
                jnp.float32(resolved["cellprob_threshold"]),
                float(resolved["flow_threshold"]),
                self._resolve_niter(resolved),
                self.max_cells,
                self.min_size,
                allow_pallas=self.device.platform != "cpu",
            )
            labels_np = np.asarray(labels[:hs, :ws])
            return self._upscale_labels(labels_np, (h, w)).astype(np.int64)
        except ValueError:
            raise
        except Exception as e:  # noqa: BLE001 - mirrors reference error wrapping
            raise RuntimeError(f"Segmentation failed: {e}") from e

    def batch_segment(
        self,
        intensities_batch: Sequence[Float64Array],
        cell_diameter_px: float | None = None,
        flow_threshold: float | None = None,
        cellprob_threshold: float | None = None,
        num_iterations: int | None = None,
        batch_size: int | None = None,
        show_progress: bool = True,
        **extra_kwargs: Any,
    ) -> list[Int64Array | None]:
        """Run cell segmentation on multiple images.

        All images are processed with the same parameters, resolved and
        validated once. Same-shape images are stacked into device batches of
        `batch_size` and dispatched as ONE fused vmapped program (the
        reference loops serially per image even on GPU, model.py:276-288).
        Failure isolation is preserved: a failed batch falls back to
        per-image dispatch, and each failing image emits a
        SegmentationWarning and a None placeholder while the rest of the
        batch continues (index alignment preserved).
        """
        resolved = self._resolve_and_validate_parameters(
            cell_diameter_px, flow_threshold, cellprob_threshold, num_iterations, batch_size
        )
        niter = self._resolve_niter(resolved)
        bs = max(1, int(resolved["batch_size"]))

        n_total = len(intensities_batch)
        masks: list[Int64Array | None] = [None] * n_total

        progress = None
        if show_progress:
            progress = get_tqdm()(total=n_total, desc="Segmenting")

        def fail(i: int, e: Exception) -> None:
            warnings.warn(
                f"Segmentation failed on image {i}: {e}",
                SegmentationWarning,
                stacklevel=3,
            )

        # host prep first; group same-padded-shape images into device batches
        scale = self._rescale_factor(resolved)
        prepared: dict[tuple[int, int], list] = {}
        for i, intensities in enumerate(intensities_batch):
            try:
                image, (h, w), (hs, ws) = self._prepare_image(
                    np.asarray(intensities), scale
                )
                prepared.setdefault(tuple(image.shape[:2]), []).append(
                    (i, image, (h, w), (hs, ws))
                )
            except Exception as e:  # noqa: BLE001
                fail(i, e)
                if progress is not None:
                    progress.update(1)

        def run_single(i, image, hw, hws):
            try:
                labels = _segment_program(
                    self._network_fast,
                    image,
                    jnp.float32(resolved["cellprob_threshold"]),
                    float(resolved["flow_threshold"]),
                    niter,
                    self.max_cells,
                    self.min_size,
                    allow_pallas=self.device.platform != "cpu",
                )
                hs, ws = hws
                masks[i] = self._upscale_labels(
                    np.asarray(labels[:hs, :ws]), hw
                ).astype(np.int64)
            except Exception as e:  # noqa: BLE001
                fail(i, e)

        for group in prepared.values():
            for start in range(0, len(group), bs):
                chunk = group[start : start + bs]
                stack = jnp.stack(
                    [img for _, img, _, _ in chunk]
                    + [chunk[-1][1]] * (bs - len(chunk))
                )
                try:
                    labels = _segment_program_batch(
                        self._network_fast,
                        stack,
                        jnp.float32(resolved["cellprob_threshold"]),
                        float(resolved["flow_threshold"]),
                        niter,
                        self.max_cells,
                        self.min_size,
                        allow_pallas=self.device.platform != "cpu",
                    )
                    labels_h = np.asarray(labels)
                    for k, (i, _, hw, (hs, ws)) in enumerate(chunk):
                        masks[i] = self._upscale_labels(
                            labels_h[k, :hs, :ws], hw
                        ).astype(np.int64)
                except Exception as e:  # noqa: BLE001
                    # isolate: retry images of the failed batch one by one
                    logger.debug(f"Batched dispatch failed ({e}); isolating per image")
                    for i, img, hw, hws in chunk:
                        run_single(i, img, hw, hws)
                if progress is not None:
                    progress.update(len(chunk))

        if progress is not None:
            progress.close()
        return masks
