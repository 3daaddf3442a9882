"""Round-5 experiments: cheaper active-pixel compaction + gather cost probes.

The sparse advect's entry cost is ONE full-image int32 sort (~26 ms at
2048^2 on v5e, ROADMAP). Hypothesis: a two-stage compaction - compact
32-px SEGMENTS first (131K-key sort), gather the surviving segments' pixels
(contiguous 32-px rows, gather-of-rows not gather-of-elements), then run the
fine sort on the ~2x-inflated candidate set - produces the IDENTICAL `idx`
array at a fraction of the cost. Also probes whether Mosaic can lower an
arbitrary in-VMEM gather (x[x]) for the doubling rounds. Not part of the
test suite.

Usage: python tools/exp_r5_compact.py
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
n = H * W
CAP = min(-(-int(H * W * 0.0625) // 8192) * 8192, H * W)
SEG = 32
NSEG = n // SEG
SEG_CAP = CAP // 16  # candidate domain = SEG_CAP*32 = 2*CAP

rng = np.random.default_rng(0)
active_np = np.zeros((B, H, W), bool)
yy, xx = np.mgrid[0:48, 0:48]
disk = ((yy - 24) ** 2 + (xx - 24) ** 2) < 20**2
for b in range(B):
    for _ in range(180):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        active_np[b, cy - 24 : cy + 24, cx - 24 : cx + 24] |= disk
active = jnp.asarray(active_np)
print(f"active fraction {active_np.mean():.4f}, cap {CAP}, seg_cap {SEG_CAP}")


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"{name:44s} {dt:8.2f} ms/img", flush=True)
    return out


def compact_sort(act2d):
    act = act2d.ravel()
    own = jnp.arange(n, dtype=jnp.int32)
    sorted_keys = lax.sort(jnp.where(act, own, n + own), is_stable=False)
    head = sorted_keys[:CAP]
    return jnp.where(head < n, head, n)


def compact_two_stage(act2d):
    act_seg = act2d.reshape(NSEG, SEG)
    seg_any = jnp.any(act_seg, axis=1)
    seg_iota = jnp.arange(NSEG, dtype=jnp.int32)
    seg_sorted = lax.sort(
        jnp.where(seg_any, seg_iota, NSEG + seg_iota), is_stable=False
    )
    seg_head = seg_sorted[:SEG_CAP]
    seg_ok = seg_head < NSEG
    seg_safe = jnp.where(seg_ok, seg_head, 0)
    # gather surviving segments' activity rows (contiguous 32-px runs)
    cand_act = act_seg[seg_safe] & seg_ok[:, None]  # (SEG_CAP, 32)
    cand_idx = seg_safe[:, None] * SEG + jnp.arange(SEG, dtype=jnp.int32)[None, :]
    m = SEG_CAP * SEG
    key = jnp.where(cand_act.ravel(), cand_idx.ravel(), n + cand_idx.ravel())
    fine = lax.sort(key, is_stable=False)
    head = fine[:CAP]
    return jnp.where(head < n, head, n)


j_sort = jax.jit(jax.vmap(compact_sort))
j_two = jax.jit(jax.vmap(compact_two_stage))

a = timeit("compaction: full-image sort", j_sort, active)
b_ = timeit("compaction: two-stage (seg32)", j_two, active)
print("identical:", bool(jnp.all(a == b_)))

# --- gather cost probes ---------------------------------------------------
table = jnp.asarray(rng.integers(0, CAP, (B, CAP)).astype(np.int32))


def doubling_xla(t):
    def body(i, cur):
        return cur[cur]

    return lax.fori_loop(0, 6, body, t)


timeit("doubling 6 rounds: XLA gather", jax.jit(jax.vmap(doubling_xla)), table)

# Pallas in-VMEM gather: does Mosaic lower x[x] at all?
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(t_ref, o_ref):
        cur = t_ref[:]

        def body(i, cur):
            return cur.reshape(-1)[cur.reshape(-1)].reshape(cur.shape)

        o_ref[:] = jax.lax.fori_loop(0, 6, body, cur)

    def doubling_pallas(t):
        t2 = t.reshape(CAP // 128, 128)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(t2.shape, t2.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t2).reshape(-1)

    jp = jax.jit(jax.vmap(doubling_pallas))
    out_p = timeit("doubling 6 rounds: Pallas VMEM", jp, table)
    out_x = jax.jit(jax.vmap(doubling_xla))(table)
    print("pallas == xla:", bool(jnp.all(out_p == out_x)))
except Exception as e:  # noqa: BLE001
    print(f"pallas doubling unsupported: {type(e).__name__}: {e}")
