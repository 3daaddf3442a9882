"""Per-stage timing of the headline plate program on the real chip.

Times each stage of the fused well program separately (scalar readbacks to
force completion through the tunneled backend). Not part of the test suite.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arcadia_microscopy_tools_tpu.ops.basic import rescale_by_percentile, subtract_background_dog
from arcadia_microscopy_tools_tpu.ops.labeling import _propagate_labels, _rank_roots, label
from arcadia_microscopy_tools_tpu.ops.regionprops import (
    measure_intensity_stack,
    measure_labels,
)
from arcadia_microscopy_tools_tpu.ops.threshold import threshold_otsu

B = int(os.environ.get("PROF_BATCH", "4"))
H = W = int(os.environ.get("PROF_SIZE", "2048"))
C = 4
REPS = int(os.environ.get("PROF_REPS", "3"))

rng = np.random.default_rng(0)
base = rng.normal(150, 15, (B, C, H, W)).clip(0, None)
yy, xx = np.mgrid[0:48, 0:48]
blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
for b in range(B):
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        base[b, 0, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob
        for ch in range(1, C):
            base[b, ch, cy - 24 : cy + 24, cx - 24 : cx + 24] += blob * rng.uniform(0.2, 1)
wells = jnp.asarray(base.astype(np.uint16))

seg_img = wells[:, 0]


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf.ravel()[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf.ravel()[0]))
    dt = (time.time() - t0) / (REPS * B) * 1000
    print(f"{name:42s} {dt:8.1f} ms/img")
    return fn(*args)


# stage 1: DoG
dog_fn = jax.jit(jax.vmap(lambda x: subtract_background_dog(x, low_sigma=1.0, high_sigma=16.0)))
dog = timeit("DoG", dog_fn, seg_img)

# stage 2: rescale by percentile
resc_fn = jax.jit(jax.vmap(lambda x: rescale_by_percentile(x, (0.5, 99.9))))
resc = timeit("rescale_by_percentile", resc_fn, dog)

# stage 3: quantize + otsu + compare
def _mask(x):
    q = (x * 65535.0).astype(jnp.uint16)
    t = threshold_otsu(q)
    return q.astype(jnp.float32) > t

mask_fn = jax.jit(jax.vmap(_mask))
mask = timeit("quantize+otsu+compare", mask_fn, resc)

# stage 4: CC pieces
prop_fn = jax.jit(jax.vmap(lambda m: _propagate_labels(m, 2, False)))
roots = timeit("CC propagate (local+merge+remap)", prop_fn, mask)

def _rank(r):
    n = r.shape[0] * r.shape[1]
    mapping = _rank_roots(r.ravel(), n)
    return jnp.where(r < n, mapping[r], 0).astype(jnp.int32)

rank_fn = jax.jit(jax.vmap(_rank))
lbl = timeit("CC rank+final gather", rank_fn, roots)

lbl_full_fn = jax.jit(jax.vmap(lambda m: label(m, checked=False)))
timeit("CC total (label, checked=False)", lbl_full_fn, mask)

# stage 5: morphology measurement
meas_fn = jax.jit(jax.vmap(lambda l: measure_labels(l, max_cells=1024)))
timeit("measure_labels", meas_fn, lbl)

# stage 6: intensity stats
int_fn = jax.jit(jax.vmap(lambda l, s: measure_intensity_stack(l, s, max_cells=1024)))
timeit("measure_intensity_stack (4ch)", int_fn, lbl, wells)

print("---- sub-breakdown ----")

# CC local phase alone (pallas)
from arcadia_microscopy_tools_tpu.ops.cc_pallas import local_cc_pallas

local_fn = jax.jit(jax.vmap(lambda m: local_cc_pallas(m, 2)))
timeit("CC phase1 pallas local", local_fn, mask)

# one 4M random gather for calibration
table = jnp.arange(H * W + 1, dtype=jnp.int32)
gather_fn = jax.jit(jax.vmap(lambda r: table[r], in_axes=0))
timeit("calibration: 4M gather via 4M table", gather_fn, roots)

# one 4M sort
sort_fn = jax.jit(jax.vmap(lambda r: jnp.sort(r.ravel())))
timeit("calibration: 4M sort", sort_fn, roots)

# measurement pieces
from arcadia_microscopy_tools_tpu.ops.segment_reduce import (
    segment_minmax_blockwise,
    segment_sums_matmul,
)

seg_ids = jnp.clip(lbl.reshape(B, -1), 0, 1024)
ones = jnp.ones((B, H * W), jnp.float32)
yyf = jnp.broadcast_to(jnp.mgrid[0:H, 0:W][0].ravel().astype(jnp.float32), (B, H * W))

sums_fn = jax.jit(jax.vmap(lambda o, y, s: segment_sums_matmul(jnp.stack([o, y, y * y]), s, 1025)))
timeit("segment_sums_matmul Q=3", sums_fn, ones, yyf, seg_ids)

mm_fn = jax.jit(jax.vmap(lambda y, s: segment_minmax_blockwise(jnp.stack([y, y]), s, 1025)))
timeit("segment_minmax Q=2", mm_fn, yyf, seg_ids)
