"""Training loop for the segmentation U-Net on synthetic cells.

The reference ships no training at all (it downloads Cellpose weights); here
the flow-prediction mechanism is trained from scratch: targets are the
diffusion flows computed from ground-truth masks (`masks_to_flows`, the same
construction Cellpose trains against), losses are MSE on the flow field plus
sigmoid-BCE on the cell probability. Runs on whatever backend JAX picks
(bfloat16 matmuls on TPU); optax Adam with cosine decay.

Usage:
    python -m arcadia_microscopy_tools_tpu.models.train --steps 600 \
        --out checkpoints/unet
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .flows import masks_to_flows
from .synthetic import synthesize_cells
from .unet import UNetConfig, apply_unet, init_unet

MAX_CELLS_TRAIN = 64


def make_batch(rng: np.random.Generator, batch: int, size: int):
    """Host-side synthetic batch: images (B,H,W,3), flow targets (B,H,W,2),
    cellprob targets (B,H,W).

    Difficulty is sampled per image: separation down to 0.55 radius-sums
    (heavily touching clusters - the case flow segmentation exists for),
    illumination gradients up to 0.25, a range of noise levels, plus the
    domain axes real microscopy spans and pure geometry does not: small and
    faint cells (low SNR fluorescence), inverted polarity (brightfield /
    phase), PSF blur, camera shot noise, and nonzero background offsets.
    The inputs are per-image 1-99 percentile normalized, matching exactly
    what the segmentation wrapper feeds the net at inference time
    (models/segmentation.py), so training sees the deployment distribution.
    """
    images = np.zeros((batch, size, size, 3), np.float32)
    labels = np.zeros((batch, size, size), np.int32)
    for i in range(batch):
        r_lo = float(rng.uniform(3.0, 9.0))
        r_hi = r_lo * float(rng.uniform(1.3, 2.6))
        membrane = rng.random() < 0.2
        img, lbl = synthesize_cells(
            rng,
            (size, size),
            n_cells=int(rng.integers(8, 28)),
            radius_range=(r_lo, r_hi),
            # membrane-stained tissue is confluent: cells share walls, so
            # sample tighter packing for that modality
            separation=float(
                rng.uniform(0.45, 0.8) if membrane else rng.uniform(0.55, 1.0)
            ),
            gradient=float(rng.uniform(0.0, 0.25)),
            noise=float(rng.uniform(0.01, 0.09)),
            cell_contrast=float(rng.uniform(0.12, 1.0)),
            background_level=float(rng.uniform(0.0, 0.25)),
            invert=bool(rng.random() < 0.25),
            blur_sigma=float(rng.uniform(0.0, 1.6)),
            shot_noise=float(rng.uniform(0.0, 0.06)),
            # membrane-stain modality (confluent epithelium labeled at the
            # boundary, e.g. the example-zstack golden fixture): interiors
            # at background, only the rim bright
            membrane_only=float(rng.uniform(0.7, 1.0)) if membrane else 0.0,
            # half of all fields clip cells at the border, as real FOVs do
            edge_cells=bool(rng.random() < 0.5),
        )
        # the inference-time normalization (percentile 1-99 contrast stretch)
        p1, p99 = np.percentile(img, [1.0, 99.0])
        img = np.clip((img - p1) / max(p99 - p1, 1e-6), 0.0, 1.0).astype(np.float32)
        images[i] = img[..., None].repeat(3, axis=-1)
        labels[i] = lbl
    return images, labels


@partial(jax.jit, static_argnames=())
def _flow_targets(labels: jnp.ndarray):
    flows, fg = jax.vmap(lambda l: masks_to_flows(l, MAX_CELLS_TRAIN))(labels)
    return flows, fg


def loss_fn(params, images, flow_t, fg_t):
    out = apply_unet(params, images)
    pred_flows = out[..., :2]
    pred_prob = out[..., 2]
    flow_mse = jnp.mean(jnp.sum((pred_flows - 5.0 * flow_t) ** 2, axis=-1))
    bce = jnp.mean(
        jnp.maximum(pred_prob, 0) - pred_prob * fg_t + jnp.log1p(jnp.exp(-jnp.abs(pred_prob)))
    )
    return flow_mse + 2.0 * bce, (flow_mse, bce)


def train(
    steps: int = 600,
    batch: int = 8,
    size: int = 128,
    lr: float = 3e-4,
    seed: int = 0,
    out: str | Path | None = None,
    log_every: int = 25,
):
    import optax

    config = UNetConfig()
    params = init_unet(jax.random.PRNGKey(seed), config)
    schedule = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, images, flow_t, fg_t):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, flow_t, fg_t
        )
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    rng = np.random.default_rng(seed)
    t0 = time.time()
    for step in range(steps):
        images, labels = make_batch(rng, batch, size)
        flow_t, fg_t = _flow_targets(jnp.asarray(labels))
        params, opt_state, loss, (flow_mse, bce) = step_fn(
            params, opt_state, jnp.asarray(images), flow_t, fg_t.astype(jnp.float32)
        )
        if step % log_every == 0 or step == steps - 1:
            print(
                f"step {step:5d} loss {float(loss):.4f} "
                f"flow {float(flow_mse):.4f} bce {float(bce):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    if out is not None:
        from .weights import save_checkpoint

        save_checkpoint(Path(out), params)
        print(f"saved checkpoint to {out}")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    train(args.steps, args.batch, args.size, args.lr, args.seed, args.out)


if __name__ == "__main__":
    main()
