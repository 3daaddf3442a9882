"""Per-stage timing of the deep (U-Net) plate program on the real chip.

Breaks the 2048^2 U-Net well program (parallel/plate._build_well_program
method="unet") into its stages and times each with scalar readbacks, the
same methodology as profile_stages.py. Not part of the test suite.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pathlib import Path

from arcadia_microscopy_tools_tpu.models import flows as F
from arcadia_microscopy_tools_tpu.models.unet import apply_unet
from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params
from arcadia_microscopy_tools_tpu.ops.fused import _percentile_from_cum
from arcadia_microscopy_tools_tpu.ops.stats import histogram_int

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
REPS = int(os.environ.get("PROF_REPS", "3"))
NITER = 200
MAX_CELLS = 1024
CAP = min(-(-int(H * W * 0.0625) // 8192) * 8192, H * W)

ckpt = Path(__file__).parent / "checkpoints" / "unet"
params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()

rng = np.random.default_rng(0)
base = rng.normal(150, 15, (B, H, W)).clip(0, None)
yy, xx = np.mgrid[0:48, 0:48]
blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
for b in range(B):
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        base[b, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
seg_imgs = jnp.asarray(base.astype(np.uint16))


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"{name:46s} {dt:8.1f} ms/img", flush=True)
    return fn(*args)


@jax.jit
def normalize(seg_img):
    counts, _ = histogram_int(seg_img, 65536)
    cum = jnp.cumsum(counts.astype(jnp.float32))
    p1 = _percentile_from_cum(cum, 1.0, H * W)
    p99 = _percentile_from_cum(cum, 99.0, H * W)
    x = seg_img.astype(jnp.float32)
    xn = jnp.clip((x - p1) / jnp.maximum(p99 - p1, 1e-6), 0.0, 1.0)
    return xn[..., None]


from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params

# production path (parallel/plate.py unet_mask): grayscale replication folded
# into the stem kernels, Pallas fused-moments GroupNorm
sparams = s2d_params(params, gray_input=True)
sparams_rgb = s2d_params(params)


@jax.jit
def forward(net_in):
    return apply_unet_s2d(sparams, net_in)  # production default (auto GN)


@jax.jit
def forward_s2d_out(net_in):
    # production deep-plate head: stays on the half-resolution S2D grid
    return apply_unet_s2d(sparams, net_in, out_s2d=True)


@jax.jit
def advect_s2d(out_s2d):
    return F._follow_sparse_core_s2d(out_s2d, 0.0, NITER, CAP, want_pred_c=True)


@jax.jit
def reconstruct_s2d(idx, valid, landing_compact, pred_c):
    return F._finish_masks_compact(
        idx, valid, landing_compact, None, H, W, 0.4, MAX_CELLS, 20,
        clear_border_labels=False, pred_c=pred_c,
    )


@jax.jit
def forward_xla_gn(net_in):
    return apply_unet_s2d(sparams, net_in, pallas_gn=False)


@jax.jit
def forward_plain(net_in):
    return apply_unet(params, jnp.concatenate([net_in] * 3, axis=-1))


@jax.jit
def advect(out):
    flows = out[..., :2] / 5.0
    active = out[..., 2] > 0.0
    return F._follow_sparse_core(flows, active, NITER, CAP)


@jax.jit
def reconstruct(idx, valid, landing_compact, out):
    flows = out[..., :2] / 5.0
    return F._finish_masks_compact(
        idx, valid, landing_compact, flows, H, W, 0.0, MAX_CELLS, 20,
        clear_border_labels=False,
    )


@jax.jit
def qc(labels, out):
    flows = out[..., :2] / 5.0
    return F.flow_error(labels, flows, MAX_CELLS)


@jax.jit
def qc_compact(idx, valid, lab_c, labels, out):
    flows = out[..., :2] / 5.0
    return F._flow_error_compact(
        idx, valid, lab_c, labels, flows, MAX_CELLS, use_pallas=False
    )


@jax.jit
def diffusion_only(labels):
    return F.masks_to_flows(labels, MAX_CELLS)


def stage_all(fn):
    return jax.jit(jax.vmap(fn))


net_in = timeit("normalize (histogram percentiles)", stage_all(normalize), seg_imgs)
# PROF_S2D_ONLY=1 measures just the production route (s2d-grid head ->
# s2d advect -> s2d recon+QC -> tail); the planar comparison stages are
# skipped to fit one run inside this environment's slow remote compiles
S2D_ONLY = os.environ.get("PROF_S2D_ONLY", "") == "1"
out = None
if not S2D_ONLY:
    out = timeit("U-Net forward 2048^2 (s2d gray)", forward, net_in)
if os.environ.get("PROF_XLA_GN", "") == "1":
    timeit("U-Net forward 2048^2 (s2d gray, XLA GN)", forward_xla_gn, net_in)
if os.environ.get("PROF_PLAIN_FWD", "") == "1":
    timeit("U-Net forward 2048^2 (plain)", forward_plain, net_in)
out_s2d = timeit("U-Net forward 2048^2 (s2d-grid head)", forward_s2d_out, net_in)
adv2 = timeit(
    f"sparse advection s2d (niter={NITER}, cap={CAP})", stage_all(advect_s2d), out_s2d
)
rec2 = timeit(
    "recon+QC s2d (cluster+filter+flow-error)",
    stage_all(reconstruct_s2d), adv2[0], adv2[1], adv2[2], adv2[4],
)
if S2D_ONLY:
    idx, valid = adv2[0], adv2[1]
    rec = rec2
    labels = rec[0]
else:
    adv = timeit(f"sparse advection (niter={NITER}, cap={CAP})", stage_all(advect), out)
    idx, valid, landing, ok = adv
    rec = timeit(
        "mask reconstruction (cluster+filter)", stage_all(reconstruct), idx, valid, landing, out
    )
    labels = rec[0]
    timeit("QC flow_error (masks_to_flows+MSE)", stage_all(qc), labels, out)
    timeit("  of which masks_to_flows diffusion", stage_all(diffusion_only), labels)
    timeit(
        "QC flow_error compact (production path)",
        stage_all(qc_compact), idx, valid, rec[1], labels, out,
    )

# measurement tail
from jax import lax

from arcadia_microscopy_tools_tpu.ops.regionprops import measure_compacted


@jax.jit
def tail(cm_labels, cm_lab_c, cm_idx, cm_valid, seg_img):
    n = H * W
    stack = jnp.stack([seg_img, seg_img])
    seg_key = jnp.where(cm_valid, cm_lab_c, 0)
    idx_key = jnp.where(cm_valid, cm_idx, n)
    seg_s, idx_s = lax.sort((seg_key, idx_key), num_keys=2)
    roots_image = jnp.where(cm_labels > 0, cm_labels - 1, n)
    return measure_compacted(seg_s, idx_s, roots_image, stack, MAX_CELLS, W)


lab_c = rec[1]
timeit(
    "measure tail (sort + measure_compacted 2ch)",
    stage_all(tail),
    labels,
    lab_c,
    idx,
    valid,
    seg_imgs,
)
