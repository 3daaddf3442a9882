"""Probe: can Mosaic lower an arbitrary in-VMEM gather (x[idx]) - and if so,
what do the pointer-doubling rounds cost with the table resident in VMEM?

The sparse advect's doubling loop is log2(niter)~8 rounds of a cap-sized
(262144 at 2048^2) int32 gather; XLA streams the table from HBM every round
at ~11 ns/element (~3 ms/round from a 1 MB table, ROADMAP round-4
measurements). The table is 1 MB - it fits in VMEM ~16x over, so a Pallas
kernel that keeps it resident would pay the HBM read ONCE. The open
question is whether Mosaic can express the gather at all:

  v1: jnp.take(x, i)                 - flat 1D arbitrary gather
  v2: jnp.take_along_axis(x2, i2, 1) - lane-wise gather (known-supported)
  v3: full 2D gather decomposed as sublane roll + lane gather

Not part of the test suite. Usage: python tools/prof_gather_pallas.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CAP = int(os.environ.get("PROF_CAP", str(256 * 1024)))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "8"))
REPS = int(os.environ.get("PROF_REPS", "20"))

rng = np.random.default_rng(0)
# a permutation-with-sinks pointer array, like comp_next
ptr_np = rng.integers(0, CAP, CAP, dtype=np.int32)
ptr = jnp.asarray(ptr_np)


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:140]
        print(f"{name:34s} FAILED: {msg}", flush=True)
        return None
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / REPS * 1000
    print(f"{name:34s} {dt:8.3f} ms", flush=True)
    return out


# ---- XLA baseline: ROUNDS composed gathers --------------------------------
@jax.jit
def xla_rounds(p):
    cur = p
    for _ in range(ROUNDS):
        cur = cur[cur]
    return cur


# ---- v1: flat jnp.take inside a kernel -------------------------------------
def _k_take_flat(p_ref, o_ref):
    x = p_ref[...]
    cur = x
    for _ in range(ROUNDS):
        cur = jnp.take(x.ravel(), cur.ravel(), axis=0).reshape(x.shape)
        x = cur
    o_ref[...] = cur


@jax.jit
def pallas_take_flat(p):
    p2 = p.reshape(CAP // 128, 128)
    return pl.pallas_call(
        _k_take_flat,
        out_shape=jax.ShapeDtypeStruct(p2.shape, p2.dtype),
    )(p2)


# ---- v2: lane-wise take_along_axis (sanity: known-supported shape) ---------
def _k_lane_gather(p_ref, o_ref):
    x = p_ref[...]
    idx = x & 127
    o_ref[...] = jnp.take_along_axis(x, idx, axis=1)


@jax.jit
def pallas_lane(p):
    p2 = p.reshape(CAP // 128, 128)
    return pl.pallas_call(
        _k_lane_gather,
        out_shape=jax.ShapeDtypeStruct(p2.shape, p2.dtype),
    )(p2)


# ---- v3: full gather = one-hot-matmul row select? too big; instead probe
#          sublane take_along_axis ------------------------------------------
def _k_sublane_gather(p_ref, o_ref):
    x = p_ref[...]
    idx = (x >> 7) % (CAP // 128)
    o_ref[...] = jnp.take_along_axis(x, idx, axis=0)


@jax.jit
def pallas_sublane(p):
    p2 = p.reshape(CAP // 128, 128)
    return pl.pallas_call(
        _k_sublane_gather,
        out_shape=jax.ShapeDtypeStruct(p2.shape, p2.dtype),
    )(p2)


print(f"cap={CAP} rounds={ROUNDS} reps={REPS}", flush=True)
ref = timeit("xla composed gathers", xla_rounds, ptr)
got = timeit("pallas flat take (VMEM-resident)", pallas_take_flat, ptr)
if got is not None and ref is not None:
    same = np.array_equal(np.asarray(got).ravel(), np.asarray(ref))
    print(f"  flat-take correctness: {same}", flush=True)
timeit("pallas lane take_along_axis", pallas_lane, ptr)
timeit("pallas sublane take_along_axis", pallas_sublane, ptr)
