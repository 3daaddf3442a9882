"""Pin the adjudicated golden-fixture masks as regression artifacts.

The reference pins parser metadata byte-for-byte against transcribed YAML
(`src/arcadia_microscopy_tools/tests/data/README.md:9-27`); no mask
equivalent exists there because the reference delegates segmentation to
Cellpose. Round 3 adjudicated both compute paths' masks on the three real
ND2 fixtures visually (ACCURACY.md "Golden-fixture adjudication"); this
script freezes those adjudicated masks so any later drift in either path -
kernel rewrites, retrained weights, threshold changes - fails a test
instead of passing silently.

Segmentation settings mirror tools/accuracy_eval.py exactly (same channel,
middle plane, same diameters). Goldens are generated ON THE CPU BACKEND -
the same backend the test lane uses - so the U-Net golden is bit-stable
for the gate; the test also asserts cross-backend tolerance via IoU, not
equality.

Usage: python tools/pin_golden_masks.py  (rewrites tests/data/golden_masks/)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Force the CPU backend only when run as the pinning script; the test suites
# import `segment_fixture` under their own backend (CPU lane and TPU lane).
if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

FIXTURE_DIAMETERS = {"example-zstack.nd2": 70.0}
OUT = REPO / "tests" / "data" / "golden_masks"


def segment_fixture(nd2_path: Path):
    """(classical label image, unet label image) for one golden fixture,
    with the exact channel/plane/diameter conventions of accuracy_eval."""
    import jax.numpy as jnp

    from arcadia_microscopy_tools_tpu import MicroscopyImage
    from arcadia_microscopy_tools_tpu.models.segmentation import SegmentationModel
    from arcadia_microscopy_tools_tpu.ops.fused import fused_classical_mask
    from arcadia_microscopy_tools_tpu.ops.labeling import label

    image = MicroscopyImage.from_nd2_path(nd2_path)
    channel = image.channels[0]
    frame = np.asarray(image.get_channel_intensities(channel))
    while frame.ndim > 2:
        frame = frame[frame.shape[0] // 2]  # middle frame/plane

    img01 = frame.astype(np.float64) / max(float(frame.max()), 1.0)
    u16 = (np.clip(img01, 0, 1) * 65535).astype(np.uint16)
    mask = fused_classical_mask(jnp.asarray(u16), low_sigma=1.0, high_sigma=16.0)
    classical = np.array(label(mask, checked=False))
    sizes = np.bincount(classical.ravel())
    small = np.nonzero(sizes < 15)[0]
    classical[np.isin(classical, small)] = 0

    model = SegmentationModel(checkpoint_path=REPO / "checkpoints" / "unet")
    unet = np.asarray(
        model.segment(
            frame.astype(np.float64),
            cell_diameter_px=FIXTURE_DIAMETERS.get(nd2_path.name),
        )
    )
    return classical, unet


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for nd2_path in sorted((REPO / "tests" / "data").glob("*.nd2")):
        classical, unet = segment_fixture(nd2_path)
        stem = nd2_path.stem
        np.savez_compressed(
            OUT / f"{stem}.npz",
            classical=classical.astype(np.int32),
            unet=unet.astype(np.int32),
        )
        print(
            f"{stem}: classical {int(classical.max())} cells, "
            f"unet {int(unet.max())} cells -> {OUT / (stem + '.npz')}"
        )


if __name__ == "__main__":
    main()
