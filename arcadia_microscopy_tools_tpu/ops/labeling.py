"""Connected-components labeling as TPU-friendly fixpoint kernels.

Replaces `skimage.measure.label` / `skimage.segmentation.relabel_sequential` /
`skimage.segmentation.clear_border` used by the reference mask processor
(`src/arcadia_microscopy_tools/masks.py:38-65`).

Algorithm (two-phase union-find, the Playne/Stava GPU-CC structure recast for
XLA):

1. **Block-local phase** - every foreground pixel starts with its own linear
   index; a fixed number of masked neighbor-minimum sweeps propagate minima
   WITHIN static 64x64 blocks. These sweeps are pure shifted compares (VPU,
   no gathers) that XLA fuses into one memory pass per iteration.
2. **Boundary merge phase** - only pixels on block edges can disagree across
   blocks. The real merge edges (both sides foreground, labels differ - a
   few tens of K) are compacted by a small sort, then drive a union-find
   root table whose gathers/scatters touch only the compact key space.
3. **Seed + re-sweep** - block-edge strips are overwritten with their merged
   global roots (static strided slices, ~2% of pixels) and one seeded
   in-block sweep spreads them to block interiors in VMEM. This replaces
   the full-image remap gather (a 4M-pixel gather costs ~40 ms on this
   toolchain). For the public `label()`, roots are then ranked by a
   cumulative sum over the root indicator (a pixel is a root iff
   label == own index), reproducing skimage's scan-order numbering exactly.
4. Optionally (`checked=True`, the default for the public API) a global
   neighbor-min + pointer-jump `while_loop` verifies the fixpoint, which
   guarantees correctness for adversarial shapes (e.g. spirals threading
   dozens of blocks) at the cost of at least one extra full-image pass.
   The plate/bench hot path uses `checked=False`: for cell-like components
   whose block-graph diameter is far below the merge round count, phases
   1-3 are already exact.

Everything is static-shaped: no dynamic extents, no host synchronization;
the labeler can sit inside a bigger jitted plate program or be vmapped over
a batch of masks.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "label",
    "component_roots",
    "relabel_sequential",
    "relabel_sequential_filtered",
    "clear_border",
    "num_labels",
    "compact_labels",
]

# Pallas kernel for the block-local phase (see ops/cc_pallas.py): default ON
# for accelerator backends (2.5x faster CC, measured on v5e), AMT_PALLAS_CC=0
# forces the pure-XLA sweep path.
_USE_PALLAS_LOCAL = os.environ.get("AMT_PALLAS_CC", "1") != "0"


def use_pallas_local(enabled: bool) -> None:
    """Toggle the Pallas block-local CC kernel (module-wide).

    The flag is resolved OUTSIDE jit by the public entry points
    (`label`, `component_roots`) into a static argument, so it participates
    in their compilation cache keys: flipping it never clears other
    programs' caches, and both variants stay cached side by side.
    """
    global _USE_PALLAS_LOCAL
    _USE_PALLAS_LOCAL = enabled

_NEIGHBORS_8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
_NEIGHBORS_4 = [(-1, 0), (0, -1), (0, 1), (1, 0)]

_BLOCK = 64
# Cap on local sweeps. The early-exit check makes typical cost ~the actual
# in-block geodesic (a few dozen sweeps for cells); the generous cap only
# matters for pathological in-block snakes.
_LOCAL_ITERS = 192
# Merge-loop cap: the union-find propagates minima ONE boundary-graph hop
# per iteration, so convergence needs ~the component's block-graph diameter.
# 32 covers a component spanning every block of a 4096px axis at block 128;
# the early-exit makes typical cost ~3 iterations regardless. The
# convergence certificate still catches anything beyond the cap.
_MERGE_ITERS = 32
_LOCAL_CHECK_EVERY = 8  # convergence-check cadence inside the local phase


def _neighbor_min(lbl: jax.Array, sentinel: jax.Array, offsets) -> jax.Array:
    """Minimum label over the given neighbor offsets (background = sentinel)."""
    h, w = lbl.shape
    padded = jnp.pad(lbl, 1, mode="constant", constant_values=sentinel)
    out = lbl
    for dy, dx in offsets:
        shifted = lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
        out = jnp.minimum(out, shifted)
    return out


def _masked_neighbor_min(lbl, fg, sentinel, offsets, block):
    """Neighbor minimum restricted to neighbors inside the same block."""
    h, w = lbl.shape
    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    padded = jnp.pad(lbl, 1, mode="constant", constant_values=sentinel)
    out = lbl
    for dy, dx in offsets:
        shifted = lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
        allowed = jnp.ones((h, w), bool)
        if dy == -1:
            allowed &= (yy % block) != 0
        if dy == 1:
            allowed &= (yy % block) != block - 1
        if dx == -1:
            allowed &= (xx % block) != 0
        if dx == 1:
            allowed &= (xx % block) != block - 1
        out = jnp.minimum(out, jnp.where(allowed, shifted, sentinel))
    return jnp.where(fg, out, sentinel)


def _boundary_pairs(lbl: jax.Array, sentinel, offsets, block):
    """Label pairs adjacent across block boundaries, flattened.

    Static strided slices only; invalid slots carry the sentinel.
    Returns (La, Lb) 1-D int32 arrays.
    """
    h, w = lbl.shape
    pairs_a = []
    pairs_b = []

    diag = any(dy != 0 and dx != 0 for dy, dx in offsets)
    shifts = (-1, 0, 1) if diag else (0,)

    # horizontal interfaces: row r = block-1 (mod block) with row r+1
    if h > block:
        a = lbl[block - 1 : h - 1 : block, :]  # (nb_y, W)
        b = lbl[block : h : block, :]
        for dx in shifts:
            if dx == 0:
                bb = b
            elif dx == 1:
                bb = jnp.concatenate(
                    [b[:, 1:], jnp.full((b.shape[0], 1), sentinel, b.dtype)], axis=1
                )
            else:
                bb = jnp.concatenate(
                    [jnp.full((b.shape[0], 1), sentinel, b.dtype), b[:, :-1]], axis=1
                )
            pairs_a.append(a.ravel())
            pairs_b.append(bb.ravel())

    # vertical interfaces: col c = block-1 (mod block) with col c+1
    if w > block:
        a = lbl[:, block - 1 : w - 1 : block]  # (H, nb_x)
        b = lbl[:, block : w : block]
        for dy in shifts:
            if dy == 0:
                bb = b
            elif dy == 1:
                bb = jnp.concatenate(
                    [b[1:, :], jnp.full((1, b.shape[1]), sentinel, b.dtype)], axis=0
                )
            else:
                bb = jnp.concatenate(
                    [jnp.full((1, b.shape[1]), sentinel, b.dtype), b[:-1, :]], axis=0
                )
            pairs_a.append(a.ravel())
            pairs_b.append(bb.ravel())

    if not pairs_a:
        empty = jnp.full((1,), sentinel, lbl.dtype)
        return empty, empty
    return jnp.concatenate(pairs_a), jnp.concatenate(pairs_b)


def _pallas_viable(shape: tuple[int, int], allow_pallas: bool) -> bool:
    # the module/env toggle is folded into `allow_pallas` by the public
    # wrappers (outside jit), so it is part of their static cache keys
    h, w = shape
    return (
        allow_pallas
        and h % 128 == 0
        and w % 128 == 0
        and jax.devices()[0].platform != "cpu"
    )


def _local_phase(
    fg: jax.Array, connectivity: int, allow_pallas: bool = True
) -> tuple[jax.Array, int]:
    """Phase 1: in-block root indices (sentinel = H*W on background).

    Returns (labels, block) where `block` is the tile size whose edges the
    boundary-merge phase must reconcile.
    """
    h, w = fg.shape
    n = h * w
    sentinel = jnp.int32(n)
    offsets = _NEIGHBORS_8 if connectivity == 2 else _NEIGHBORS_4

    if _pallas_viable((h, w), allow_pallas):
        from .cc_pallas import PALLAS_CC_BLOCK, local_cc_pallas

        return jnp.where(fg, local_cc_pallas(fg, connectivity), sentinel), PALLAS_CC_BLOCK

    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lbl = jnp.where(fg, idx, sentinel)

    # while_loop in chunks of _LOCAL_CHECK_EVERY sweeps with an early-exit
    # convergence check: typical cells converge well before the cap.
    def local_chunk(state):
        cur, it, _ = state
        new = cur
        for _ in range(_LOCAL_CHECK_EVERY):
            new = _masked_neighbor_min(new, fg, sentinel, offsets, _BLOCK)
        return new, it + _LOCAL_CHECK_EVERY, jnp.any(new != cur)

    def local_cond(state):
        _, it, changed = state
        return changed & (it < _LOCAL_ITERS)

    lbl, _, _ = lax.while_loop(
        local_cond, local_chunk, (lbl, jnp.int32(0), jnp.bool_(True))
    )
    return lbl, _BLOCK


def _local_resweep(
    fg: jax.Array, init: jax.Array, connectivity: int, block: int, allow_pallas: bool = True
) -> jax.Array:
    """Seeded phase-1 rerun: min-propagate `init` to the in-block fixpoint."""
    h, w = fg.shape
    n = h * w
    sentinel = jnp.int32(n)
    offsets = _NEIGHBORS_8 if connectivity == 2 else _NEIGHBORS_4

    if _pallas_viable((h, w), allow_pallas) and block == 128:
        from .cc_pallas import local_resweep_pallas

        return jnp.where(fg, local_resweep_pallas(fg, init, connectivity), sentinel)

    def local_chunk(state):
        cur, it, _ = state
        new = cur
        for _ in range(_LOCAL_CHECK_EVERY):
            new = _masked_neighbor_min(new, fg, sentinel, offsets, block)
        return new, it + _LOCAL_CHECK_EVERY, jnp.any(new != cur)

    def local_cond(state):
        _, it, changed = state
        return changed & (it < _LOCAL_ITERS)

    lbl, _, _ = lax.while_loop(
        local_cond, local_chunk, (init, jnp.int32(0), jnp.bool_(True))
    )
    return lbl


def _merge_boundary_pairs(La, Lb, n, pair_cap):
    """Union-find over the boundary label pairs, on a COMPACTED key space.

    Real merge edges (both sides foreground, labels differ) are compacted to a
    static `pair_cap` slots by one small sort, so the union-find tables hold a
    few tens of K entries instead of H*W - every gather/scatter in the merge
    loop is then microseconds instead of tens of milliseconds.

    Returns (keys, roots, overflowed): sorted distinct boundary labels, the
    resolved root per sorted slot, and a flag set when more than `pair_cap`
    real edges existed (the convergence certificate downstream catches any
    resulting miss).
    """
    sentinel = jnp.int32(n)
    real = (La < n) & (Lb < n) & (La != Lb)
    overflow = jnp.sum(real) > pair_cap

    # compact the real edges to the front; invalid slots carry sentinels
    order = jnp.where(real, 0, 1).astype(jnp.int32)
    order_s, La_s, Lb_s = lax.sort((order, La, Lb), num_keys=1)
    valid = order_s[:pair_cap] == 0
    La_c = jnp.where(valid, La_s[:pair_cap], sentinel)
    Lb_c = jnp.where(valid, Lb_s[:pair_cap], sentinel)

    # one sort with a position payload yields the sorted keys, the compact id
    # per slot, AND each original slot's compact id (scattered back) - no
    # searchsorted (whose default lowering is ~17 sequential gathers on TPU)
    cat = jnp.concatenate([La_c, Lb_c])
    m_ids = cat.shape[0]
    s, pos = lax.sort((cat, jnp.arange(m_ids, dtype=jnp.int32)), num_keys=1)
    is_new = s != jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    uid_at = jnp.zeros((m_ids,), jnp.int32).at[pos].set(uid_sorted)

    ua = jnp.where(valid, uid_at[: La_c.shape[0]], m_ids)
    ub = jnp.where(valid, uid_at[La_c.shape[0] :], m_ids)
    rep = jnp.full((m_ids + 1,), sentinel, jnp.int32).at[uid_sorted].min(s)

    def merge_step(state):
        pv, it, _ = state
        ra = pv[ua]
        rb = pv[ub]
        m = jnp.where(valid, jnp.minimum(ra, rb), sentinel)
        new = pv.at[ua].min(m)
        new = new.at[ub].min(m)
        return new, it + 1, jnp.any(new != pv)

    parent_val, _, _ = lax.while_loop(
        lambda st: st[2] & (st[1] < _MERGE_ITERS),
        merge_step,
        (rep, jnp.int32(0), jnp.bool_(True)),
    )

    # roots aligned with the sorted key array s
    roots = parent_val[uid_sorted]
    return s, roots, overflow


def _resolve_values(values, keys, roots, n):
    """Root lookup for arbitrary label values via a sort-merge join.

    `keys` are sorted distinct boundary labels with resolved `roots`; values
    not present map to themselves. One 3-operand sort + cummax replaces
    searchsorted (sequential binary-search gathers are latency-bound on TPU),
    and the results return to query order through a second sort keyed on the
    original position rather than a scatter (a 196K-slot scatter costs ~5 ms
    on this toolchain; the extra sort ~1 ms).
    """
    nq = values.shape[0]
    m = keys.shape[0]
    v = jnp.concatenate([keys, values])
    # tiebreak 0 = key entry, 1 = query, so each key precedes its queries
    tie = jnp.concatenate(
        [jnp.zeros((m,), jnp.int32), jnp.ones((nq,), jnp.int32)]
    )
    # key rows carry position nq + i so they sort past every query row in the
    # un-merge sort below
    pos = jnp.concatenate(
        [nq + jnp.arange(m, dtype=jnp.int32), jnp.arange(nq, dtype=jnp.int32)]
    )
    aux = jnp.concatenate([roots, jnp.zeros((nq,), jnp.int32)])
    sv, st, sp, sa = lax.sort((v, tie, pos, aux), num_keys=2)

    is_key = st == 0
    iota = jnp.arange(m + nq, dtype=jnp.int32)
    last_key = lax.cummax(jnp.where(is_key, iota, -1))
    safe = jnp.maximum(last_key, 0)
    match = (last_key >= 0) & (sv[safe] == sv)
    resolved = jnp.where(match, sa[safe], sv)
    # un-merge: sort by original query position; key rows land in the tail
    _, out_full = lax.sort((sp, resolved), num_keys=1)
    out = out_full[:nq]
    return jnp.where(values < n, out, values)


def _seed_boundary_strips(lbl, keys, roots, n, block):
    """Overwrite every block-edge pixel's label with its merged global root.

    The strips are static strided slices (~2-3% of pixels), resolved in ONE
    batched sort-merge join. A subsequent in-block re-sweep spreads the seeds
    to interiors, which replaces the full-image remap gather of the old
    phase 3.
    """
    h, w = lbl.shape
    strips = []
    if h > block:
        strips.append(lbl[block - 1 :: block, :])
        strips.append(lbl[block::block, :])
    if w > block:
        strips.append(lbl[:, block - 1 :: block])
        strips.append(lbl[:, block::block])
    if not strips:
        return lbl

    flat = jnp.concatenate([s.ravel() for s in strips])
    resolved = _resolve_values(flat, keys, roots, n)

    out = lbl
    offset = 0
    i = 0
    if h > block:
        for sl in (
            (slice(block - 1, None, block), slice(None)),
            (slice(block, None, block), slice(None)),
        ):
            size = strips[i].size
            out = out.at[sl].set(resolved[offset : offset + size].reshape(strips[i].shape))
            offset += size
            i += 1
    if w > block:
        for sl in (
            (slice(None), slice(block - 1, None, block)),
            (slice(None), slice(block, None, block)),
        ):
            size = strips[i].size
            out = out.at[sl].set(resolved[offset : offset + size].reshape(strips[i].shape))
            offset += size
            i += 1
    return out


def component_roots(
    fg: jax.Array,
    connectivity: int = 2,
    pair_cap: int | None = None,
    allow_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel component root indices, gather-free.

    `allow_pallas` is resolved here, outside jit, against the module toggle
    (`use_pallas_local` / AMT_PALLAS_CC), so the choice is a static cache
    key: None means "module default", and an explicit True is still subject
    to the module-wide kill switch.
    """
    resolved = _USE_PALLAS_LOCAL if allow_pallas is None else (
        allow_pallas and _USE_PALLAS_LOCAL
    )
    return _component_roots_impl(fg, connectivity, pair_cap, resolved)


@partial(jax.jit, static_argnames=("connectivity", "pair_cap", "allow_pallas"))
def _component_roots_impl(
    fg: jax.Array,
    connectivity: int = 2,
    pair_cap: int | None = None,
    allow_pallas: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Jitted body of `component_roots` (allow_pallas already resolved).

    The fast path of the labeler: phase-1 block-local sweeps, a union-find
    over COMPACTED boundary edges, then boundary-strip seeding + an in-block
    re-sweep instead of a full-image remap gather (each 4M-pixel gather costs
    ~40 ms on TPU; the seeded re-sweep runs in VMEM).

    Returns:
        pair_cap None selects a size-scaled default (see above); the
        certificate catches any overflow.
        (roots, converged): `roots` is an int32 image of component-minimum
        linear indices (sentinel = H*W on background); `converged` is a
        device boolean certifying the fixpoint (one extra neighbor-min pass:
        True guarantees the labeling is exact even for adversarial shapes or
        `pair_cap` overflow).
    """
    fg = jnp.asarray(fg).astype(bool)
    h, w = fg.shape
    n = h * w
    sentinel = jnp.int32(n)
    offsets = _NEIGHBORS_8 if connectivity == 2 else _NEIGHBORS_4
    if pair_cap is None:
        # The union-find scatter cost scales with the TABLE size, not with
        # the real edge count, so the default cap scales with the image
        # (n/64 comfortably dominates the ~n/2000 real edges of cell-like
        # masks) between a 16K floor and the historical 64K ceiling.
        pair_cap = max(16384, min(65536, n // 64))

    lbl, block = _local_phase(fg, connectivity, allow_pallas)
    La, Lb = _boundary_pairs(lbl, sentinel, offsets, block)
    keys, roots, _ = _merge_boundary_pairs(La, Lb, n, pair_cap)
    lbl = _seed_boundary_strips(lbl, keys, roots, n, block)
    lbl = _local_resweep(fg, lbl, connectivity, block, allow_pallas)

    # convergence certificate: the labeling is a fixpoint iff no pixel sees a
    # smaller neighbor label (one fused VPU pass + reduce)
    nb = _neighbor_min(lbl, sentinel, offsets)
    converged = ~jnp.any(jnp.where(fg, nb < lbl, False))
    return lbl, converged


@partial(jax.jit, static_argnames=("connectivity", "checked", "allow_pallas"))
def _propagate_labels(
    fg: jax.Array, connectivity: int = 2, checked: bool = True, allow_pallas: bool = True
) -> jax.Array:
    """Union-find by label propagation; returns root linear indices per pixel
    (sentinel = H*W on background)."""
    h, w = fg.shape
    n = h * w
    sentinel = jnp.int32(n)
    offsets = _NEIGHBORS_8 if connectivity == 2 else _NEIGHBORS_4

    lbl, _ = _component_roots_impl(fg, connectivity, None, allow_pallas)

    if not checked:
        return lbl

    # ---- optional global fixpoint guarantee -----------------------------------
    def jump(cur):
        flat = jnp.concatenate([cur.ravel(), jnp.array([sentinel], jnp.int32)])
        return jnp.where(fg, flat[cur], sentinel)

    def body(state):
        cur, _ = state
        new = _neighbor_min(cur, sentinel, offsets)
        new = jnp.where(fg, new, sentinel)
        new = jump(jump(new))
        return new, jnp.any(new != cur)

    lbl, _ = lax.while_loop(lambda s: s[1], body, (lbl, jnp.bool_(True)))
    return lbl


def _rank_roots(roots_flat: jax.Array, sentinel: int) -> jax.Array:
    """Map each root linear index to its 1-based rank in ascending root order.

    A pixel is a root iff its label equals its own linear index, so ranks are
    just a cumulative sum over the root-indicator - no sort required.
    Returns a dense lookup table of size sentinel+1 with mapping[root] = rank
    (0 elsewhere, including the sentinel/background slot).
    """
    idx = jnp.arange(roots_flat.shape[0], dtype=roots_flat.dtype)
    is_root = roots_flat == idx
    ranks = jnp.cumsum(is_root.astype(jnp.int32))
    mapping = jnp.where(is_root, ranks, 0)
    return jnp.concatenate([mapping, jnp.zeros((1,), jnp.int32)])


def label(mask: jax.Array, connectivity: int = 2, checked: bool = True) -> jax.Array:
    """Label connected components of a boolean mask.

    Args:
        mask: 2D boolean array (True = foreground).
        connectivity: 2 for 8-connectivity (skimage's 2D default), 1 for
            4-connectivity.
        checked: Run the global fixpoint verification pass (default True).
            Pipelines over cell-like masks (component block-graph diameter
            well under the merge round count) may disable it for throughput.

    Returns:
        int32 label image with consecutive labels 1..N in scan order of each
        component's first pixel (background = 0), matching
        `skimage.measure.label`.
    """
    # resolve the Pallas-CC module flag outside jit: it becomes a static
    # cache key, so use_pallas_local() toggles take effect without clearing
    # any compilation caches
    return _label_impl(mask, connectivity, checked, _USE_PALLAS_LOCAL)


@partial(jax.jit, static_argnames=("connectivity", "checked", "allow_pallas"))
def _label_impl(
    mask: jax.Array, connectivity: int, checked: bool, allow_pallas: bool
) -> jax.Array:
    fg = jnp.asarray(mask).astype(bool)
    h, w = fg.shape
    n = h * w
    roots = _propagate_labels(fg, connectivity, checked, allow_pallas)
    mapping = _rank_roots(roots.ravel(), n)
    return jnp.where(fg, mapping[roots], 0).astype(jnp.int32)


@jax.jit
def relabel_sequential(label_image: jax.Array) -> jax.Array:
    """Relabel an integer label image to consecutive labels 1..N.

    Preserves the ascending order of the original label values
    (`skimage.segmentation.relabel_sequential` semantics). Implemented as a
    sort-based rank: one (value, position) sort, first-occurrence cumsum,
    scatter back - so label magnitudes far above the pixel count (e.g.
    tracking ids) relabel exactly, with no value-range table. Values must fit
    the array dtype after JAX canonicalization (int32 when x64 is disabled).
    """
    lbl = jnp.asarray(label_image)
    flat = lbl.ravel()
    n = flat.size
    s, pos = lax.sort((flat, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    first = jnp.ones((1,), bool)
    is_new = jnp.concatenate([first, s[1:] != s[:-1]]) & (s > 0)
    ranks = jnp.where(s > 0, jnp.cumsum(is_new.astype(jnp.int32)), 0)
    out = jnp.zeros((n,), jnp.int32).at[pos].set(ranks)
    return out.reshape(lbl.shape)


@partial(jax.jit, static_argnames=("min_size",))
def relabel_sequential_filtered(label_image: jax.Array, min_size: int) -> jax.Array:
    """Drop labels smaller than `min_size` pixels AND compact the survivors
    to consecutive 1..N, in ONE sort-based pass.

    Equivalent to a size filter followed by `relabel_sequential`, but the
    group sizes fall out of the same (value, position) sort that computes the
    ranks (run length = last-slot index - first-slot index + 1 in sorted
    order), so the separate per-pixel size lookup and its table build
    disappear.
    """
    lbl = jnp.asarray(label_image)
    flat = lbl.ravel()
    n = flat.size
    s, pos = lax.sort((flat, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    iota = jnp.arange(n, dtype=jnp.int32)

    edge = jnp.ones((1,), bool)
    is_new = jnp.concatenate([edge, s[1:] != s[:-1]])
    is_last = jnp.concatenate([s[1:] != s[:-1], edge])
    first_idx = lax.cummax(jnp.where(is_new, iota, 0))
    # last index of each run, propagated backward over the run
    last_idx = n - 1 - lax.cummax(jnp.where(is_last[::-1], iota, 0))[::-1]
    run = last_idx - first_idx + 1

    keep = (s > 0) & (run >= min_size)
    ranks = jnp.where(keep, jnp.cumsum((is_new & keep).astype(jnp.int32)), 0)
    out = jnp.zeros((n,), jnp.int32).at[pos].set(ranks)
    return out.reshape(lbl.shape)


@jax.jit
def clear_border(label_image: jax.Array) -> jax.Array:
    """Zero out any label that touches the image border
    (`skimage.segmentation.clear_border` for label inputs).

    For boolean inputs, label first (the reference applies clear_border before
    labeling; `masks.process_mask` reproduces that flow).
    """
    lbl = jnp.asarray(label_image)
    if lbl.dtype == bool:
        raise TypeError("clear_border expects an integer label image; call label() first")
    lbl = lbl.astype(jnp.int32)
    border_vals = jnp.concatenate([lbl[0, :], lbl[-1, :], lbl[:, 0], lbl[:, -1]])
    # Membership via a sort-merge join rather than a value-indexed table:
    # label values can exceed the pixel count (tracking ids), and clipping
    # them into one table slot would alias distinct large-id regions.
    m = border_vals.shape[0]
    flat = lbl.ravel()
    nq = flat.shape[0]
    v = jnp.concatenate([border_vals, flat])
    tie = jnp.concatenate([jnp.zeros((m,), jnp.int32), jnp.ones((nq,), jnp.int32)])
    pos = jnp.concatenate(
        [nq + jnp.arange(m, dtype=jnp.int32), jnp.arange(nq, dtype=jnp.int32)]
    )
    sv, st, sp = lax.sort((v, tie, pos), num_keys=2)
    is_border_row = st == 0
    iota = jnp.arange(m + nq, dtype=jnp.int32)
    last_border = lax.cummax(jnp.where(is_border_row, iota, -1))
    safe = jnp.maximum(last_border, 0)
    hit = (last_border >= 0) & (sv[safe] == sv)
    # un-merge by original position; border rows land past the tail
    _, hit_by_pos = lax.sort((sp, hit.astype(jnp.int32)), num_keys=1)
    on_border = hit_by_pos[:nq].astype(bool).reshape(lbl.shape)
    return jnp.where(on_border & (lbl > 0), 0, lbl)


@jax.jit
def num_labels(label_image: jax.Array) -> jax.Array:
    """Maximum label value (device scalar) - equals the number of cells for
    consecutively-relabeled images (label / relabel_sequential output); a
    sparse label set (e.g. after clear_border) counts its gaps."""
    return jnp.max(jnp.asarray(label_image))


@partial(jax.jit, static_argnames=("max_labels",))
def compact_labels(label_image: jax.Array, max_labels: int) -> jax.Array:
    """Relabel to consecutive 1..N assuming labels already lie in
    [0, max_labels] - a sort-free fast path for pipelines that filtered an
    already-consecutive labeling."""
    lbl = jnp.asarray(label_image).astype(jnp.int32)
    clipped = jnp.clip(lbl, 0, max_labels)
    counts = jnp.zeros(max_labels + 1, jnp.int32).at[clipped.ravel()].add(1)
    present = counts > 0
    ranks = jnp.cumsum(present[1:].astype(jnp.int32))  # rank of label k at k-1
    mapping = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.where(present[1:], ranks, 0)])
    return mapping[clipped]
