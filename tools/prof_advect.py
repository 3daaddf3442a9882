"""Prefix-difference attribution of the deep-path tail at 2048^2 (v5e):

1. sparse advection (_follow_sparse_core): compaction sort vs slot scatter
   vs doubling gathers;
2. compact reconstruction (_cluster_landings_compact): landing sort vs
   union-find rounds vs composite build.

Amortized prefix timings (each prefix is one jitted program; the stage cost
is the delta between consecutive prefixes), the same methodology as
tools/prof_fwd_prefix.py. Not part of the test suite.
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
from jax import lax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B = int(os.environ.get("PROF_BATCH", "2"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
REPS = int(os.environ.get("PROF_REPS", "5"))
NITER = 200
CAP = min(-(-int(H * W * 0.0625) // 8192) * 8192, H * W)
SINK_CAP = 16 * 1024

# synthetic flows/active matching profile_deep.py's blob statistics
rng = np.random.default_rng(0)
active_np = np.zeros((B, H, W), bool)
fy_np = np.zeros((B, H, W), np.float32)
fx_np = np.zeros((B, H, W), np.float32)
yy, xx = np.mgrid[0:48, 0:48]
r2 = (yy - 24) ** 2 + (xx - 24) ** 2
disk = r2 < 20**2
dy = np.where(disk, np.clip(-(yy - 24) / 8.0, -1, 1), 0).astype(np.float32)
dx = np.where(disk, np.clip(-(xx - 24) / 8.0, -1, 1), 0).astype(np.float32)
for b in range(B):
    for _ in range(180):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        sl = np.s_[b, cy - 24 : cy + 24, cx - 24 : cx + 24]
        active_np[sl] |= disk
        fy_np[sl] = np.where(disk, dy, fy_np[sl])
        fx_np[sl] = np.where(disk, dx, fx_np[sl])
print(f"active fraction: {active_np.mean():.4f}  cap {CAP} ({CAP/(H*W):.4f})")

flows = jnp.stack([jnp.asarray(fy_np), jnp.asarray(fx_np)], axis=-1)
active = jnp.asarray(active_np)

n = H * W
steps = max(1, int(np.ceil(np.log2(max(NITER, 2)))))


def advect_prefix(flows2, active2, stage):
    h, w = active2.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    fy = flows2[..., 0].astype(jnp.float32)
    fx = flows2[..., 1].astype(jnp.float32)
    ny = jnp.clip(jnp.round(yy + fy).astype(jnp.int32), 0, h - 1)
    nx = jnp.clip(jnp.round(xx + fx).astype(jnp.int32), 0, w - 1)
    own = (yy * w + xx).astype(jnp.int32).ravel()
    nxt = jnp.where(active2.ravel(), (ny * w + nx).ravel(), own)
    act = active2.ravel()
    if stage == 0:
        return nxt
    sorted_keys = lax.sort(jnp.where(act, own, n + own))
    head = sorted_keys[:CAP]
    idx = jnp.where(head < n, head, n)
    valid = idx < n
    idx_safe = jnp.where(valid, idx, 0)
    if stage == 1:
        return idx
    slot = jnp.full((n,), CAP, jnp.int32).at[idx_safe].set(
        jnp.arange(CAP, dtype=jnp.int32), mode="drop"
    )
    if stage == 2:
        return slot[:1024]
    comp_next = slot[nxt[idx_safe]]
    comp_next = jnp.where(
        valid & (comp_next < CAP), comp_next, jnp.arange(CAP, dtype=jnp.int32)
    )
    if stage == 3:
        return comp_next

    def cond(state):
        it, _, changed = state
        return changed & (it < steps)

    def body(state):
        it, cur, _ = state
        new = cur[cur]
        return it + 1, new, jnp.any(new != cur)

    _, comp_final, _ = lax.while_loop(
        cond, body, (jnp.int32(0), comp_next, jnp.bool_(True))
    )
    if stage == 4:
        return comp_final
    return idx, valid, idx_safe[comp_final]


ADV_STAGES = ["nxt build", "compaction sort", "slot scatter", "comp_next gathers",
              "doubling loop", "landing gather"]


def timeit_prefix(label, fn, stages, *args):
    prev = 0.0
    for s, name in enumerate(stages):
        f = jax.jit(lambda *a, s=s: fn(*a, s))
        fv = jax.jit(jax.vmap(lambda *a, s=s: fn(*a, s)))
        out = fv(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.time()
        for _ in range(REPS):
            out = fv(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.time() - t0) / (REPS * B) * 1000
        print(f"{label} {name:20s} {dt:8.2f} ms/img   delta {dt - prev:8.2f}",
              flush=True)
        prev = dt
    return out


adv_out = timeit_prefix("advect", advect_prefix, ADV_STAGES, flows, active)
idx_b, valid_b, landing_b = adv_out


def recon_prefix(idx, valid, landing_compact, stage):
    cap = idx.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    land_key = jnp.where(valid, landing_compact, n)
    ls, _ = lax.sort((land_key, iota), num_keys=1)
    edge = jnp.ones((1,), bool)
    is_new = jnp.concatenate([edge, ls[1:] != ls[:-1]])
    is_last = jnp.concatenate([ls[1:] != ls[:-1], edge])
    first_idx = lax.cummax(jnp.where(is_new, iota, 0))
    last_idx = cap - 1 - lax.cummax(jnp.where(is_last[::-1], iota, 0))[::-1]
    count = last_idx - first_idx + 1
    if stage == 0:
        return count
    sink_run = is_new & (count >= 3) & (ls < n)
    rank = jnp.cumsum(sink_run.astype(jnp.int32))
    sink_pos = (
        jnp.full((SINK_CAP,), n, jnp.int32)
        .at[jnp.where(sink_run, rank - 1, SINK_CAP)]
        .set(ls, mode="drop")
    )
    sy = sink_pos // W
    sx = sink_pos % W
    real = sink_pos < n
    iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)
    if stage == 1:
        return sink_pos

    def _window_min7(img2d):
        p = jnp.pad(img2d, 3, constant_values=SINK_CAP)
        r = p
        for d in range(-3, 4):
            if d == 0:
                continue
            r = jnp.minimum(r, jnp.roll(p, d, axis=0))
        r2 = r
        for d in range(-3, 4):
            if d == 0:
                continue
            r2 = jnp.minimum(r2, jnp.roll(r, d, axis=1))
        return r2[3:-3, 3:-3]

    sink_pos_safe = jnp.where(real, sink_pos, n)

    def uf_body(state):
        rep, _ = state
        img = (
            jnp.full((n,), SINK_CAP, jnp.int32)
            .at[sink_pos_safe]
            .set(rep, mode="drop")
        )
        m = _window_min7(img.reshape(H, W)).ravel()
        nm = m[jnp.where(real, sink_pos, 0)]
        new = jnp.minimum(rep, jnp.where(real, nm, rep))
        new = new[new]
        return new, jnp.any(new != rep)

    rep, _ = lax.while_loop(lambda s: s[1], uf_body, (iota_s, jnp.bool_(True)))
    if stage == 2:
        return rep
    tl = jnp.where(real, jnp.maximum(sy - 1, 0) * W + jnp.maximum(sx - 1, 0), n)
    key_root = jnp.full((SINK_CAP,), n, jnp.int32).at[rep].min(tl, mode="drop")
    is_root = (rep == iota_s) & real
    root_key = jnp.where(is_root, key_root, n)
    order_key, root_ids = lax.sort((root_key, iota_s), num_keys=1)
    root_label = (
        jnp.zeros((SINK_CAP,), jnp.int32)
        .at[root_ids]
        .set(jnp.where(order_key < n, iota_s + 1, 0))
    )
    lab_sink = jnp.where(real, root_label[rep], 0)
    if stage == 3:
        return lab_sink
    sink_label_img = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(real, sink_pos, n)]
        .set(lab_sink, mode="drop")
        .reshape(H, W)
    )
    mop = sink_label_img
    pad = jnp.pad(sink_label_img, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mop = jnp.maximum(mop, lax.dynamic_slice(pad, (1 + dy, 1 + dx), (H, W)))
    composite = jnp.where(sink_label_img > 0, sink_label_img, mop).ravel()
    lab_c = jnp.where(valid, composite[jnp.where(valid, landing_compact, 0)], 0)
    return lab_c


REC_STAGES = ["landing sort+runs", "sink_pos scatter", "union-find loop",
              "root order+label", "composite+assign"]
timeit_prefix("recon ", recon_prefix, REC_STAGES, idx_b, valid_b, landing_b)
