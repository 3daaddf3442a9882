"""Round-5: split the recon+QC stage (flows._finish_masks_compact) into its
sub-stages on the real chip - sink clustering, size-filter + label scatter,
compact flow-error QC (with the diffusion inside), final rebuild. Not part
of the test suite.

Usage: python tools/exp_r5_recon.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arcadia_microscopy_tools_tpu.models import flows as F
from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params
from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
REPS = int(os.environ.get("PROF_REPS", "3"))
NITER = 200
MAX_CELLS = 1024
SINK_CAP = 16 * MAX_CELLS
CAP = min(-(-int(H * W * 0.0625) // 8192) * 8192, H * W)

ckpt = REPO / "checkpoints" / "unet"
params = load_checkpoint(ckpt) if ckpt.exists() else seeded_params()
sp = s2d_params(params, gray_input=True)

rng = np.random.default_rng(0)
base = rng.normal(150, 15, (B, H, W)).clip(0, None)
yy, xx = np.mgrid[0:48, 0:48]
blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
for b in range(B):
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, H - 24)
        base[b, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
x = jnp.asarray((base / base.max())[..., None].astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"{name:46s} {dt:8.1f} ms/img", flush=True)
    return out


@jax.jit
def stage_in(xx):
    out_s2d = apply_unet_s2d(sp, xx, out_s2d=True)
    return jax.vmap(
        lambda o: F._follow_sparse_core_s2d(o, 0.0, NITER, CAP, True)
    )(out_s2d)


adv = stage_in(x)
idx, valid, landing, ok, pred_c = adv
_ = np.asarray(idx.ravel()[0])


@jax.jit
def s_cluster(idx, valid, landing):
    return jax.vmap(
        lambda i, v, l: F._cluster_landings_compact(i, v, l, H, W, 3, SINK_CAP)
    )(idx, valid, landing)


lab = timeit("cluster landings (sort+UF+composite)", s_cluster, idx, valid, landing)
lab_c = lab[0]


@jax.jit
def s_filter(idx, valid, lab_c):
    def one(i, v, lc):
        n = H * W
        sizes = jnp.zeros((SINK_CAP + 1,), jnp.int32).at[lc].add(v.astype(jnp.int32))
        ids = jnp.arange(SINK_CAP + 1, dtype=jnp.int32)
        keep = (ids > 0) & (sizes >= 20) & (sizes > 0)
        mapping = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)), 0)
        lc2 = mapping[lc]
        i_safe = jnp.where(v, i, n)
        labels = jnp.zeros((n,), jnp.int32).at[i_safe].set(lc2, mode="drop")
        return lc2, labels.reshape(H, W)

    return jax.vmap(one)(idx, valid, lab_c)


filt = timeit("size filter + label scatter", s_filter, idx, valid, lab_c)
lab_c2, labels = filt


@jax.jit
def s_qc(idx, valid, lab_c2, labels, pred_c):
    return jax.vmap(
        lambda i, v, lc, lb, pc: F._flow_error_compact(
            i, v, lc, lb, None, MAX_CELLS, use_pallas=False, pred_c=pc
        )
    )(idx, valid, lab_c2, labels, pred_c)


errs = timeit("QC flow-error compact (incl. diffusion)", s_qc, idx, valid, lab_c2, labels, pred_c)


@jax.jit
def s_rebuild(idx, valid, lab_c2, errs):
    def one(i, v, lc, e):
        n = H * W
        bad = e > 0.4
        bad_lut = jnp.concatenate([jnp.array([False]), bad])
        ids = jnp.arange(SINK_CAP + 1, dtype=jnp.int32)
        keep2 = ~bad_lut[jnp.clip(ids, 0, MAX_CELLS)] & (ids > 0)
        mapping2 = jnp.where(keep2, jnp.cumsum(keep2.astype(jnp.int32)), 0)
        lc3 = mapping2[lc]
        i_safe = jnp.where(v, i, n)
        return jnp.zeros((n,), jnp.int32).at[i_safe].set(lc3, mode="drop").reshape(H, W)

    return jax.vmap(one)(idx, valid, lab_c2, errs)


timeit("QC drop + final rebuild", s_rebuild, idx, valid, lab_c2, errs)


@jax.jit
def s_diffuse_only(labels):
    def one(lb):
        src = (lb == 1).astype(jnp.float32)
        return F._diffuse_and_gradient(lb, src, 128, False)

    return jax.vmap(one)(labels)


timeit("  of which diffusion+gradient alone", s_diffuse_only, labels)
