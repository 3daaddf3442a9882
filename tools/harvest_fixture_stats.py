"""Harvest acquisition statistics from the five real golden ND2 fixtures
into `models/fixture_stats.json`, so synthetic training data can match real
acquisition physics (VERDICT round-4 item 4b).

For each fixture the script measures, on the same normalized frame both
segmentation paths consume (channel 0, middle plane, [0, 1] max-normalized):

- background level / noise sigma (robust MAD of background residuals after
  removing a coarse 16-px box illumination field),
- illumination gradient amplitude (peak-to-peak of that coarse field),
- polarity and cell contrast (foreground-vs-background medians, foreground
  taken from the adjudicated U-Net golden masks - the masks adjudicated
  closest to truth on every real-cell fixture, ACCURACY.md),
- cell radius statistics from the golden mask instance areas,
- a PSF proxy: the half-width of the image autocorrelation's central lobe
  (captures optical blur scale without assuming a Gaussian PSF).

`models/synthetic.synthesize_cells_like` maps one record onto
`synthesize_cells` parameters. Usage: python tools/harvest_fixture_stats.py
(CPU; rewrites models/fixture_stats.json).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATA = REPO / "tests" / "data"
GOLDEN = DATA / "golden_masks"
OUT = REPO / "arcadia_microscopy_tools_tpu" / "models" / "fixture_stats.json"


def _normalized_frame(nd2_path: Path) -> np.ndarray:
    from arcadia_microscopy_tools_tpu import MicroscopyImage

    image = MicroscopyImage.from_nd2_path(nd2_path)
    frame = np.asarray(image.get_channel_intensities(image.channels[0]))
    while frame.ndim > 2:
        frame = frame[frame.shape[0] // 2]
    return frame.astype(np.float64) / max(float(frame.max()), 1.0)


def _box_smooth(img: np.ndarray, k: int = 16) -> np.ndarray:
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=k, mode="nearest")


def harvest_one(name: str) -> dict:
    img = _normalized_frame(DATA / f"{name}.nd2")
    masks = np.load(GOLDEN / f"{name}.npz")["unet"]
    fg = masks > 0
    bg = ~fg

    field = _box_smooth(img)
    resid = img - field
    bg_resid = resid[bg]
    noise = float(1.4826 * np.median(np.abs(bg_resid - np.median(bg_resid))))
    bg_level = float(np.median(img[bg]))
    gradient = float(np.percentile(field[bg], 98) - np.percentile(field[bg], 2))

    fg_med = float(np.median(img[fg])) if fg.any() else bg_level
    contrast = fg_med - bg_level

    ids, areas = np.unique(masks[masks > 0], return_counts=True)
    radii = np.sqrt(areas / np.pi) if len(ids) else np.array([10.0])

    # PSF proxy: half-width (pixels) at half max of the central lobe of the
    # background-subtracted autocorrelation, along x
    z = img - img.mean()
    f = np.fft.rfft2(z)
    ac = np.fft.irfft2(f * np.conj(f), s=z.shape)
    row = ac[0]
    row = row / row[0]
    half = np.nonzero(row[: len(row) // 2] < 0.5)[0]
    acorr_hwhm = float(half[0]) if len(half) else float(len(row) // 2)

    return {
        "background_level": round(bg_level, 4),
        "noise": round(noise, 4),
        "gradient": round(gradient, 4),
        "contrast": round(contrast, 4),
        "inverted": bool(contrast < 0),
        "cell_radius_mean": round(float(radii.mean()), 2),
        "cell_radius_std": round(float(radii.std()), 2),
        "n_cells": int(len(ids)),
        "fg_fraction": round(float(fg.mean()), 4),
        "acorr_hwhm_px": round(acorr_hwhm, 1),
    }


def main() -> None:
    stats = {}
    for p in sorted(DATA.glob("*.nd2")):
        stats[p.stem] = harvest_one(p.stem)
        print(p.stem, json.dumps(stats[p.stem]))
    OUT.write_text(json.dumps(stats, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
