"""Accuracy evaluation for both segmentation paths; writes ACCURACY.md.

Instance-level scoring on synthetic suites with known ground truth (held-out
seeds; easy / touching / gradient+noise / dense), plus the golden ND2
fixtures (no ground-truth masks exist for them, so the report gives cell
counts and cross-path agreement).

Run on the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/accuracy_eval.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from arcadia_microscopy_tools_tpu.models.synthetic import synthesize_cells
from arcadia_microscopy_tools_tpu.ops.fused import fused_classical_mask
from arcadia_microscopy_tools_tpu.ops.labeling import label

CHECKPOINT = Path(os.environ.get("AMT_EVAL_CHECKPOINT", REPO / "checkpoints" / "unet"))
GOLDEN = REPO / "tests" / "data"

SUITES = {
    "easy (r1 training regime)": dict(separation=0.9, gradient=0.1, noise=0.05, n_cells=14),
    "touching clusters": dict(separation=0.6, gradient=0.1, noise=0.05, n_cells=18),
    "strong gradient + noise": dict(separation=0.9, gradient=0.3, noise=0.09, n_cells=14),
    "dense": dict(separation=0.75, gradient=0.15, noise=0.06, n_cells=30),
    # domain axes real microscopy spans (round-2 augmentation targets)
    "faint small cells (low SNR)": dict(
        separation=0.9, gradient=0.05, noise=0.02, n_cells=20,
        radius_range=(4.0, 8.0), cell_contrast=0.18, background_level=0.1,
        shot_noise=0.04,
    ),
    "brightfield polarity (inverted)": dict(
        separation=0.85, gradient=0.1, noise=0.04, n_cells=14,
        invert=True, cell_contrast=0.5, background_level=0.15,
    ),
    "defocused + shot noise": dict(
        separation=0.85, gradient=0.1, noise=0.03, n_cells=14,
        blur_sigma=1.4, shot_noise=0.05, cell_contrast=0.7,
    ),
    # round-3 adjudication target: example-zstack.nd2 is a membrane stain
    # (bright boundaries, dark interiors); thresholding segments the
    # membrane skeleton, not cells - only the flow path can be right here
    "membrane stain (boundary-labeled)": dict(
        separation=0.85, gradient=0.1, noise=0.04, n_cells=14,
        membrane_only=1.0, cell_contrast=0.8, background_level=0.08,
    ),
}
N_IMAGES = 8
SIZE = 256
EVAL_SEED = 1234  # training uses seed 0; this is held out


def match_instances(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Greedy IoU matching between ground-truth and predicted instances.

    Returns AP@0.5, AP@0.75, mean matched IoU, and count statistics.
    """
    gt_ids = [i for i in np.unique(gt) if i > 0]
    pr_ids = [i for i in np.unique(pred) if i > 0]
    if not gt_ids:
        return dict(ap50=1.0 if not pr_ids else 0.0, ap75=0.0, miou=0.0, n_gt=0, n_pred=len(pr_ids))

    # IoU matrix via per-pair intersections from the joint histogram
    joint = gt.astype(np.int64) * (pred.max() + 1) + pred
    pairs, counts = np.unique(joint[(gt > 0) & (pred > 0)], return_counts=True)
    gt_area = {i: int((gt == i).sum()) for i in gt_ids}
    pr_area = {i: int((pred == i).sum()) for i in pr_ids}

    candidates = []
    for p, c in zip(pairs, counts):
        g, q = divmod(int(p), int(pred.max() + 1))
        iou = c / (gt_area[g] + pr_area[q] - c)
        candidates.append((iou, g, q))
    candidates.sort(reverse=True)

    used_g, used_p, matches = set(), set(), []
    for iou, g, q in candidates:
        if g in used_g or q in used_p:
            continue
        used_g.add(g)
        used_p.add(q)
        matches.append(iou)

    def ap(threshold: float) -> float:
        tp = sum(1 for i in matches if i >= threshold)
        fp = len(pr_ids) - tp
        fn = len(gt_ids) - tp
        return tp / max(tp + fp + fn, 1)

    return dict(
        ap50=ap(0.5),
        ap75=ap(0.75),
        miou=float(np.mean([i for i in matches if i >= 0.5])) if matches else 0.0,
        n_gt=len(gt_ids),
        n_pred=len(pr_ids),
    )


def classical_segment(img01: np.ndarray) -> np.ndarray:
    """DoG -> fused histogram rescale+Otsu -> CC, min_size 15."""
    u16 = (np.clip(img01, 0, 1) * 65535).astype(np.uint16)
    mask = fused_classical_mask(jnp.asarray(u16), low_sigma=1.0, high_sigma=16.0)
    lbl = np.array(label(mask, checked=False))
    sizes = np.bincount(lbl.ravel())
    small = np.nonzero(sizes < 15)[0]
    lbl[np.isin(lbl, small)] = 0
    return lbl


def main() -> None:
    from arcadia_microscopy_tools_tpu.models.segmentation import SegmentationModel

    model = SegmentationModel(checkpoint_path=CHECKPOINT)

    lines = [
        "# Accuracy evaluation",
        "",
        "Instance segmentation accuracy of both compute paths, scored by greedy",
        "IoU matching against ground truth on held-out synthetic suites, plus the",
        "golden ND2 fixtures (no ground-truth masks exist for those; the table",
        "reports counts and cross-path agreement). AP@t = TP/(TP+FP+FN) at",
        "matched-IoU threshold t. Regenerate with `python tools/accuracy_eval.py`",
        "(runs on the TPU).",
        "",
        "## Synthetic suites (8 images each, 256x256, eval seed held out from training)",
        "",
        "| Suite | Path | AP@0.5 | AP@0.75 | matched IoU | cells (GT -> pred) |",
        "|---|---|---|---|---|---|",
    ]

    for suite, kw in SUITES.items():
        rng = np.random.default_rng(EVAL_SEED)
        per_path = {"classical": [], "unet": []}
        counts = {"classical": [0, 0], "unet": [0, 0]}
        images, gts = [], []
        for _ in range(N_IMAGES):
            img, gt = synthesize_cells(rng, (SIZE, SIZE), **kw)
            images.append(img)
            gts.append(gt)

        unet_masks = model.batch_segment(
            [i.astype(np.float64) for i in images], show_progress=False
        )
        for img, gt, unet_lbl in zip(images, gts, unet_masks):
            for path, pred in (
                ("classical", classical_segment(img)),
                ("unet", unet_lbl if unet_lbl is not None else np.zeros_like(gt)),
            ):
                m = match_instances(gt, np.asarray(pred))
                per_path[path].append(m)
                counts[path][0] += m["n_gt"]
                counts[path][1] += m["n_pred"]

        for path in ("classical", "unet"):
            ms = per_path[path]
            lines.append(
                f"| {suite} | {path} | "
                f"{np.mean([m['ap50'] for m in ms]):.3f} | "
                f"{np.mean([m['ap75'] for m in ms]):.3f} | "
                f"{np.mean([m['miou'] for m in ms]):.3f} | "
                f"{counts[path][0]} -> {counts[path][1]} |"
            )

    # golden ND2 fixtures: segment, report counts + cross-path agreement
    lines += [
        "",
        "## Golden ND2 fixtures (real microscopy; no ground-truth masks exist)",
        "",
        "| Fixture | channel | classical cells | U-Net cells | fg-IoU classical vs U-Net |",
        "|---|---|---|---|---|",
    ]
    from arcadia_microscopy_tools_tpu import MicroscopyImage

    # Cellpose semantics: the caller supplies the expected cell diameter and
    # the model rescales to its canonical training scale. The zstack
    # fixture's confluent epithelial cells are ~60-80 px across (measured
    # from the adjudication overlay); the other fixtures sit near the
    # canonical 30.
    fixture_diameters = {"example-zstack.nd2": 70.0}

    for nd2_path in sorted(GOLDEN.glob("*.nd2")):
        image = MicroscopyImage.from_nd2_path(nd2_path)
        channel = image.channels[0]
        frame = np.asarray(image.get_channel_intensities(channel))
        while frame.ndim > 2:
            frame = frame[frame.shape[0] // 2]  # middle frame/plane
        img01 = frame.astype(np.float64) / max(float(frame.max()), 1.0)
        classical = classical_segment(img01)
        unet = model.segment(
            frame.astype(np.float64),
            cell_diameter_px=fixture_diameters.get(nd2_path.name),
        )
        a, b = classical > 0, np.asarray(unet) > 0
        agreement = (a & b).sum() / max((a | b).sum(), 1)
        lines.append(
            f"| {nd2_path.name} | {channel.name} | {int(classical.max())} | "
            f"{int(np.asarray(unet).max())} | {agreement:.3f} |"
        )

    lines += [
        "",
        "## Reading the numbers",
        "",
        "- The classical path (threshold + connected components) cannot split",
        "  touching cells by construction; its AP on the touching suite is the",
        "  expected failure mode that motivates the flow-based deep path, and",
        "  matches the reference's classical pipeline behavior.",
        "- The U-Net path is trained purely on synthetic data (the environment",
        "  has no Cellpose weights and no annotated real data); its numbers on",
        "  the synthetic suites measure the flow mechanism end-to-end (network",
        "  -> flow integration -> sink clustering -> QC), and the golden-fixture",
        "  rows sanity-check behavior on real microscopy images.",
        "- Suites 6-8 cover the domain axes the round-2 training augmentation",
        "  added (faint/small low-SNR cells, inverted brightfield polarity,",
        "  PSF blur + shot noise); the membrane suite is the round-3 addition",
        "  (see below). The classical path collapses on inverted polarity by",
        "  construction (its threshold keeps the bright side); the flow path",
        "  learns both polarities.",
        "",
        "## Golden-fixture adjudication (round 3)",
        "",
        "The two paths disagree on the real fixtures, so round 3 rendered both",
        "paths' masks over each image (`python tools/render_adjudication.py` ->",
        "docs/fixture_adjudication.png) and adjudicated visually:",
        "",
        "- **example-multichannel (brightfield PBMCs)**: ~25-30 distinct cells",
        "  are visible - smooth ring-dark cells plus textured clumps. The",
        "  classical path's 14 regions MERGE the touching textured clumps (the",
        "  known by-construction limit of threshold+CC); the U-Net resolves",
        "  individual cells within clumps. Adjudication: the U-Net's higher",
        "  count is closer to truth; low cross-path fg-IoU here reflects the",
        "  classical path's merging, not a U-Net error.",
        "- **example-timelapse (faint FITC colony)**: one connected diffuse blob",
        "  with several brighter lobes. classical=1 object; the net splits the",
        "  lobes. Genuinely ambiguous without orthogonal truth (the lobes match",
        "  visible local maxima); neither path is clearly wrong.",
        "- **example-zstack (FITC membrane stain, confluent epithelium)**: the",
        "  fluorescence marks cell BOUNDARIES; ~9 polygonal cells with dark",
        "  interiors. Thresholding segments the membrane SKELETON - its",
        "  'cells' are membrane fragments, wrong by construction for cell",
        "  counting. Before round 3 the net also fragmented along membranes",
        "  (it had never seen a boundary-labeled cell); the membrane_only",
        "  synthetic modality (confluent packing, edge-clipped cells) was",
        "  added to training and the membrane suite above scores the",
        "  mechanism. With the Cellpose-style diameter rescaling added in",
        "  round 3 (these cells are ~70 px across, the table passes that",
        "  diameter), the net now fills the enclosed polygonal cells instead",
        "  of fragmenting the membranes. On membrane-stained data the flow",
        "  path is the only structurally correct path, and cross-path fg-IoU",
        "  is EXPECTED to stay low.",
        "",
    ]

    out = REPO / "ACCURACY.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
