"""Flow-field mask reconstruction as fixed-iteration device kernels.

The Cellpose recipe (behavior contract documented at reference
`src/arcadia_microscopy_tools/model.py:49-64`): the network predicts a 2-D
flow field pointing toward each cell's center plus a cell probability map;
pixels above `cellprob_threshold` are advected along the flow for `niter`
Euler steps; pixels that converge to the same sink belong to one cell; masks
whose recomputed flows disagree with the network's (flow error >
`flow_threshold`) are discarded.

Everything here is static-shaped, jittable and vmappable:
- `follow_flows`: full-grid bilinear flow integration via
  jax.scipy.ndimage.map_coordinates inside a lax.fori_loop;
- `masks_from_flows`: landing-pixel scatter -> sink clustering with the CC
  labeler from ops.labeling -> per-pixel label gather (with a 3x3 mop-up for
  stragglers) -> small-mask removal;
- `masks_to_flows`: heat diffusion from each cell's center (the Cellpose
  flow-target construction) with a fixed iteration count;
- `flow_error`: per-mask MSE between predicted and mask-derived unit flows.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.labeling import label as cc_label

__all__ = [
    "follow_flows",
    "follow_flows_indices",
    "follow_flows_indices_sparse",
    "compute_masks_sparse_compact",
    "masks_from_flows",
    "masks_from_landing",
    "masks_to_flows",
    "flow_error",
    "compute_masks",
    "compute_masks_sparse",
]


def _bilinear_sample(field: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (H, W) `field` at float (2, N) coords with bilinear interp,
    clamped to the image bounds."""
    from jax.scipy.ndimage import map_coordinates

    return map_coordinates(field, [coords[0], coords[1]], order=1, mode="nearest")


@partial(jax.jit, static_argnames=("niter",))
def follow_flows(
    flows: jax.Array,  # (H, W, 2) - [dY, dX] unit flows toward cell centers
    active: jax.Array,  # (H, W) bool - pixels to advect
    niter: int = 200,
) -> jax.Array:
    """Advect every active pixel along the flow field for `niter` Euler steps.

    Returns (H, W, 2) float32 final positions (inactive pixels stay put).
    Sub-pixel (bilinear) trajectory variant; the mask-reconstruction hot path
    uses `follow_flows_indices` (identical clustering behavior, ~25x faster).
    """
    h, w = active.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    p0 = jnp.stack([yy, xx], axis=0).astype(jnp.float32).reshape(2, -1)
    act = active.ravel()

    fy = flows[..., 0].astype(jnp.float32)
    fx = flows[..., 1].astype(jnp.float32)

    def step(_, p):
        dy = _bilinear_sample(fy, p)
        dx = _bilinear_sample(fx, p)
        py = jnp.clip(p[0] + jnp.where(act, dy, 0.0), 0.0, h - 1)
        px = jnp.clip(p[1] + jnp.where(act, dx, 0.0), 0.0, w - 1)
        return jnp.stack([py, px], axis=0)

    p = lax.fori_loop(0, niter, step, p0)
    return p.reshape(2, h, w).transpose(1, 2, 0)


@partial(jax.jit, static_argnames=("niter",))
def follow_flows_indices(
    flows: jax.Array,  # (H, W, 2) - [dY, dX] unit flows toward cell centers
    active: jax.Array,  # (H, W) bool - pixels to advect
    niter: int = 200,
) -> jax.Array:
    """Landing pixel of each active pixel after >= `niter` advection steps,
    via pointer doubling on the one-step successor graph.

    The sequential Euler loop costs `niter` full-grid interpolation gathers
    (the round-1 deep-path bottleneck: ~3.5 s/image at 512^2). Discretizing
    the dynamics to p_{k+1} = round(p_k + F[p_k]) turns advection into a
    FUNCTIONAL GRAPH on pixel indices, whose niter-fold composition is
    next^(2^s) - computable with ceil(log2(niter)) full-image index gathers
    (~8 instead of 200). Rounding each step perturbs trajectories by <= 0.5 px
    but the sinks and their basins are unchanged for cell-scale flow fields
    (cells converge to the same arrival clusters; verified by the flow
    round-trip tests and the synthetic-training IoU eval).

    Composition is exact for the discretized dynamics - no cross-basin
    interpolation, so no mask bleeding at cell boundaries.

    Returns (H, W) int32 flat landing indices (inactive pixels map to
    themselves).
    """
    h, w = active.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    fy = flows[..., 0].astype(jnp.float32)
    fx = flows[..., 1].astype(jnp.float32)

    ny = jnp.clip(jnp.round(yy + fy).astype(jnp.int32), 0, h - 1)
    nx = jnp.clip(jnp.round(xx + fx).astype(jnp.int32), 0, w - 1)
    own = (yy * w + xx).astype(jnp.int32)
    nxt = jnp.where(active, ny * w + nx, own).ravel()

    # Pointer doubling with early exit: after k compositions every pixel has
    # advanced min(2^k, its distance-to-sink) steps, and sinks are fixpoints
    # of the discretized dynamics, so once nothing changes further gathers
    # are no-ops. Cell-scale basins (radius ~15 px) converge in ~5
    # compositions; the cap preserves the >= niter contract.
    steps = max(1, int(np.ceil(np.log2(max(niter, 2)))))

    def cond(state):
        it, _, changed = state
        return changed & (it < steps)

    def body(state):
        it, cur, _ = state
        new = cur[cur]
        return it + 1, new, jnp.any(new != cur)

    _, nxt, _ = lax.while_loop(cond, body, (jnp.int32(0), nxt, jnp.bool_(True)))
    return nxt.reshape(h, w)


def _two_stage_viable(n: int, cap: int) -> bool:
    """Two-stage compaction pays only when the full-image sort is large; the
    packing requires 8 | n and a head slice requires cap <= n.
    AMT_TWO_STAGE_COMPACT=0 forces the single full sort (A/B bisection)."""
    if os.environ.get("AMT_TWO_STAGE_COMPACT", "1") == "0":
        return False
    return n >= (1 << 20) and cap <= n and n % 8 == 0


def _compact_from_seg_bits(
    bits: jax.Array,  # (nseg,) int32 - 8-bit activity mask per segment
    own_of: "callable",  # (sid (S,1) i32, t (1,8) i32) -> (S, 8) flat indices
    n: int,
    cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Shared tail of the two-stage active-pixel compaction.

    Stage 1 sorts one int32 key per 8-pixel SEGMENT - `(sid << 8) | bits`
    with inactive segments offset past `nseg` - so the first `cap//4`
    sorted keys are exactly the ascending active segments WITH their
    per-pixel activity bits riding in the low byte (no gather to recover
    them). Stage 2 expands each surviving segment to its 8 candidate
    pixels arithmetically and runs the fine sort on that 2*cap-sized
    candidate set. Both sorts are ~8x smaller than the single full-image
    sort they replace (26 ms -> ~7 ms at 2048^2 on v5e); the result `idx`
    is BIT-IDENTICAL to the full sort's whenever every active segment
    survived stage 1 (equivalence-tested), and `seg_ok` is False otherwise
    (the caller folds it into its capacity-escalation flag).

    Returns (idx, seg_ok): (cap,) ascending active flat indices (n on
    padding slots).
    """
    nseg = bits.shape[0]
    seg_iota = jnp.arange(nseg, dtype=jnp.int32)
    activeseg = bits > 0
    cap_seg = max(1, min(cap // 4, nseg))
    seg_ok = jnp.sum(activeseg.astype(jnp.int32)) <= cap_seg
    # key layout: [sid or nseg+sid : 21 bits][bits : 8 bits] - positive i32
    key1 = (jnp.where(activeseg, seg_iota, nseg + seg_iota) << 8) | bits
    head1 = lax.sort(key1, is_stable=False)[:cap_seg]
    sid_h = head1 >> 8
    bits_h = head1 & 255
    validseg = sid_h < nseg
    sid_safe = jnp.where(validseg, sid_h, 0)[:, None]
    t = jnp.arange(8, dtype=jnp.int32)[None, :]
    act_c = ((bits_h[:, None] >> t) & 1).astype(bool) & validseg[:, None]
    own_c = own_of(sid_safe, t)
    keys2 = jnp.where(act_c, own_c, n + own_c).ravel()
    if keys2.shape[0] >= cap:
        head = lax.sort(keys2, is_stable=False)[:cap]
    else:  # cap > 2x candidate budget (heavily escalated): pad like nonzero
        head = jnp.pad(
            lax.sort(keys2, is_stable=False), (0, cap - keys2.shape[0]),
            constant_values=n,
        )
    idx = jnp.where(head < n, head, n)
    return idx, seg_ok


def _compact_two_stage_planar(
    act: jax.Array,  # (h, w) bool
    cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Two-stage compaction for a planar activity mask: segments are 8
    consecutive flat (row-major) pixels, so stage 2's candidate indices are
    `sid*8 + t` - pure arithmetic."""
    h, w = act.shape
    n = h * w
    nseg = n // 8
    powers = (1 << jnp.arange(8, dtype=jnp.int32))
    bits = jnp.sum(
        act.reshape(nseg, 8).astype(jnp.int32) * powers[None, :], axis=1
    )
    return _compact_from_seg_bits(
        bits, lambda sid, t: sid * 8 + t, n, cap
    )


def _compact_two_stage_s2d(
    act3: jax.Array,  # (h2, w2, 4) bool - S2D-grid activity, (c, a) order
    h: int,
    w: int,
    cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Two-stage compaction on the S2D grid: a segment is 8 consecutive
    elements of the (i, j, a)-raveled order - a j-pair with all 4
    sub-positions, i.e. a 2x4 full-resolution block. The bit packing is two
    minor-dim contractions (no transpose); stage 2 recovers full-res flat
    indices from the segment id arithmetically: sid = i*(w2/2) + m,
    t = (j - 2m)*4 + a, y = 2i + (a>>1), x = 2(2m + t>>2) + (a&1)."""
    h2, w2, _ = act3.shape
    n = h * w
    w2h = w2 // 2
    powers4 = (1 << jnp.arange(4, dtype=jnp.int32))
    t4 = jnp.sum(act3.astype(jnp.int32) * powers4[None, None, :], axis=2)
    v = t4.reshape(h2, w2h, 2)
    bits = (v[..., 0] + (v[..., 1] << 4)).reshape(-1)  # (h2*w2h,)

    def own_of(sid, t):
        i = sid // w2h
        m = sid % w2h
        a = t & 3
        y = 2 * i + (a >> 1)
        x = 2 * (2 * m + (t >> 2)) + (a & 1)
        return y * w + x

    return _compact_from_seg_bits(bits, own_of, n, cap)


def _follow_sparse_core(
    flows: jax.Array, active: jax.Array, niter: int, cap: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Compact-domain flow integration shared by the sparse entry points.

    Returns (idx, valid, landing_compact, ok): `idx` is the (cap,) flat index
    of each compacted active pixel (n on padding slots), `landing_compact`
    its (cap,) flat landing index after >= `niter` advection steps, `ok`
    False when the active count exceeded `cap`.
    """
    h, w = active.shape
    n = h * w
    yy, xx = jnp.mgrid[0:h, 0:w]
    fy = flows[..., 0].astype(jnp.float32)
    fx = flows[..., 1].astype(jnp.float32)
    ny = jnp.clip(jnp.round(yy + fy).astype(jnp.int32), 0, h - 1)
    nx = jnp.clip(jnp.round(xx + fx).astype(jnp.int32), 0, w - 1)
    own = (yy * w + xx).astype(jnp.int32).ravel()
    nxt = jnp.where(active.ravel(), (ny * w + nx).ravel(), own)
    act = active.ravel()

    n_active = jnp.sum(act)
    ok = n_active <= cap
    # compaction: two-stage segment sort on large images (bit-identical,
    # ~3.5x cheaper - see _compact_from_seg_bits); ONE full int32 sort
    # otherwise. Active pixels keep their flat index, inactive ones are
    # offset past n, so the first `cap` sorted keys are exactly the
    # ascending active indices (n-filled when fewer). This is what
    # jnp.nonzero(size=cap, fill_value=n) computes, but nonzero's
    # cumsum+scatter lowering measured 37 ms/img at 2048^2 on v5e while the
    # sort runs in ~11 ms (scatters serialize on TPU; sorts don't).
    # is_stable=False: the keys are DISTINCT integers, so the sorted array
    # is unique and stability buys nothing - but lax.sort's default
    # is_stable=True makes XLA:TPU carry an iota tiebreaker through the
    # whole sort network (measured 2.1x: 24.2 vs 11.3 ms/img at 2048^2).
    if _two_stage_viable(n, cap):
        idx, seg_ok = _compact_two_stage_planar(active, cap)
        ok = ok & seg_ok
    else:
        sorted_keys = lax.sort(jnp.where(act, own, n + own), is_stable=False)
        if cap <= n:
            head = sorted_keys[:cap]
        else:  # small images: pad to the static cap like nonzero(size=cap)
            head = jnp.pad(sorted_keys, (0, cap - n), constant_values=n)
        idx = jnp.where(head < n, head, n)
    valid = idx < n
    idx_safe = jnp.where(valid, idx, 0)

    # slot map: full-image position -> compact slot (cap on non-active)
    slot = jnp.full((n,), cap, jnp.int32).at[idx_safe].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )
    # compact successor permutation; landing on a non-active pixel (or a
    # padded slot) becomes a self-loop
    comp_next = slot[nxt[idx_safe]]
    comp_next = jnp.where(
        valid & (comp_next < cap), comp_next, jnp.arange(cap, dtype=jnp.int32)
    )

    steps = max(1, int(np.ceil(np.log2(max(niter, 2)))))

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
    landing_compact = idx_safe[comp_final]
    return idx, valid, landing_compact, ok


@partial(jax.jit, static_argnames=("niter", "cap"))
def follow_flows_indices_sparse(
    flows: jax.Array,  # (H, W, 2) - [dY, dX] unit flows toward cell centers
    active: jax.Array,  # (H, W) bool
    niter: int = 200,
    cap: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """`follow_flows_indices` restricted to the active pixel set.

    The dense pointer-doubling composes the FULL 4M-entry successor map per
    round (~8 full-image gathers, the 2048^2 deep-path bottleneck); cells
    typically cover a few percent of a well, so this variant compacts the
    active pixels to a static `cap`-sized list and doubles the successor
    permutation inside that compact domain - every round is a cap-sized
    gather (ROADMAP round-2 candidate 3). A landing pixel outside the
    active set (flows can step onto background at mask borders) becomes a
    fixpoint, exactly like the dense variant's inactive self-loops.

    Returns:
        (landing, ok): landing is the (H, W) int32 flat landing-index image
        (inactive pixels map to themselves); `ok` is False when the active
        count exceeded `cap`, in which case the result only advected the
        first `cap` pixels and the caller must fall back to the dense path.
    """
    h, w = active.shape
    n = h * w
    idx, valid, landing_compact, ok = _follow_sparse_core(flows, active, niter, cap)
    idx_safe = jnp.where(valid, idx, 0)
    own = jnp.arange(n, dtype=jnp.int32)
    landing = own.at[idx_safe].set(
        jnp.where(valid, landing_compact, idx_safe), mode="drop"
    )
    return landing.reshape(h, w), ok


@partial(jax.jit, static_argnames=("min_size", "sink_count"))
def masks_from_flows(
    final_positions: jax.Array,  # (H, W, 2) from follow_flows
    active: jax.Array,  # (H, W) bool
    min_size: int = 15,
    sink_count: int = 3,
) -> jax.Array:
    """Cluster converged float positions into instance masks (wrapper around
    `masks_from_landing` for the sub-pixel `follow_flows` variant)."""
    h, w = active.shape
    land_y = jnp.clip(jnp.round(final_positions[..., 0]).astype(jnp.int32), 0, h - 1)
    land_x = jnp.clip(jnp.round(final_positions[..., 1]).astype(jnp.int32), 0, w - 1)
    return masks_from_landing(land_y * w + land_x, active, min_size, sink_count)


@partial(jax.jit, static_argnames=("min_size", "sink_count", "size_cap"))
def masks_from_landing(
    landing_idx: jax.Array,  # (H, W) int32 flat landing indices
    active: jax.Array,  # (H, W) bool
    min_size: int = 15,
    sink_count: int = 3,
    size_cap: int = 4096,
) -> jax.Array:
    """Cluster converged pixels into instance masks.

    Landing pixels with at least `sink_count` arrivals form sink regions;
    sinks are merged with 8-connected labeling (plus one dilation step so
    near-adjacent sinks fuse), and every active pixel inherits the label of
    its landing pixel (3x3 mop-up for pixels landing just off a sink).
    Masks smaller than `min_size` pixels are dropped. Returns int32 labels.
    """
    h, w = active.shape
    n = h * w
    land_flat = landing_idx.ravel()
    act = active.ravel()

    counts = jnp.zeros(n, jnp.int32).at[jnp.where(act, land_flat, n - 1)].add(
        act.astype(jnp.int32)
    )
    sink_map = (counts.reshape(h, w) >= sink_count)

    # one dilation step merges sinks separated by a single pixel
    sink_dil = sink_map
    padded = jnp.pad(sink_map, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sink_dil = sink_dil | lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))

    sink_labels = cc_label(sink_dil)  # int32 (H, W)
    sink_labels = jnp.where(sink_map, sink_labels, 0)  # shrink back to true sinks

    # Each active pixel takes the label at its landing position, with a 3x3
    # mop-up for pixels landing just off a sink. Both resolve through ONE
    # gather from a composite image: a labeled pixel keeps its own label,
    # an unlabeled one exposes the max label of its 3x3 neighborhood (a
    # shifted-max VPU pass). Gathering the composite at the landing index is
    # then exactly direct-if-labeled-else-mopped; the previous formulation
    # spent nine 262K-element gathers on this (~3 ms each on TPU), the
    # shifted max costs one fused memory pass.
    mop = sink_labels
    lbl_pad = jnp.pad(sink_labels, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mop = jnp.maximum(mop, lax.dynamic_slice(lbl_pad, (1 + dy, 1 + dx), (h, w)))
    composite = jnp.where(sink_labels > 0, sink_labels, mop)
    labels = composite.ravel()[land_flat]
    labels = jnp.where(act, labels, 0).reshape(h, w)

    if min_size > 0:
        # remove small masks: per-label pixel counts via the MXU segment-sum
        # (scatter-add over a 262K image serializes; labels are bounded by
        # the sink-component count, far under the column budget). Labels at
        # or above size_cap would alias into one pooled size bin, so when
        # any exist the whole filter routes through an exact scatter-add
        # count instead (lax.cond: the slow branch only executes on the
        # rare pathological inputs) - no silent under-filtering either way.
        from ..ops.segment_reduce import segment_sums_matmul

        def _filter_pooled(lbl):
            in_cap = lbl < size_cap
            seg = jnp.where(in_cap, lbl, 0).ravel()
            sizes = segment_sums_matmul(
                jnp.ones((1, n), jnp.float32), seg, size_cap, exact=False
            )[0]
            keep = ~in_cap | (sizes[jnp.where(in_cap, lbl, 0)] >= min_size)
            return jnp.where(keep, lbl, 0)

        def _filter_exact(lbl):
            sizes = jnp.zeros(n + 1, jnp.int32).at[lbl.ravel()].add(1)
            return jnp.where(sizes[lbl] >= min_size, lbl, 0)

        labels = lax.cond(
            jnp.any(labels >= size_cap), _filter_exact, _filter_pooled, labels
        )
    return labels


def _cluster_landings_compact(
    idx: jax.Array,  # (cap,) flat indices of active pixels (n on padding)
    valid: jax.Array,  # (cap,) bool
    landing_compact: jax.Array,  # (cap,) flat landing index per active pixel
    h: int,
    w: int,
    sink_count: int,
    sink_cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Sink clustering in the compact domain: labels per compacted pixel.

    Produces EXACTLY `masks_from_landing(min_size=0)`'s labels without any
    full-image scatter-add / CC / remap (47 + 53 + 42 ms at 2048^2 on v5e):

    - arrival counts come from one cap-sized sort (run lengths in sorted
      order), not a 4M scatter-add;
    - the dense path's dilate-by-1 + 8-connected CC partition over sink
      pixels equals connecting sinks within Chebyshev distance 3, so a
      union-find over the (at most `sink_cap`) sink pixels with a 48-offset
      adjacency replaces the full-image labeler. Cluster numbering matches
      the dense CC scan order because a cluster's first dilated pixel is
      min over its sinks of the clamped top-left corner (distinct clusters
      always have distinct such keys: equal keys would imply Chebyshev
      distance <= 2, i.e. the same cluster);
    - per-pixel assignment gathers ONE composite image (direct sink label,
      else 3x3 max) at cap landing positions only.

    Returns (lab_c, sink_overflow): (cap,) int32 labels (0 = unlabeled) and
    a bool set when distinct sink pixels exceeded `sink_cap` (labels are
    then incomplete and the caller must escalate capacity).
    """
    n = h * w
    cap = idx.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)

    # only the RUN STRUCTURE of the sorted keys is consumed (first/last
    # indices of equal-key runs), so no payload rides along and stability
    # is irrelevant - bare unstable sort (2.3 -> 1.8 ms/img at cap 262k)
    land_key = jnp.where(valid, landing_compact, n)
    ls = lax.sort(land_key, is_stable=False)

    edge = jnp.ones((1,), bool)
    is_new = jnp.concatenate([edge, ls[1:] != ls[:-1]])
    is_last = jnp.concatenate([ls[1:] != ls[:-1], edge])
    first_idx = lax.cummax(jnp.where(is_new, iota, 0))
    last_idx = cap - 1 - lax.cummax(jnp.where(is_last[::-1], iota, 0))[::-1]
    count = last_idx - first_idx + 1

    sink_run = is_new & (count >= sink_count) & (ls < n)
    rank = jnp.cumsum(sink_run.astype(jnp.int32))  # 1-based at sink starts
    n_sinks = rank[-1]
    sink_overflow = n_sinks > sink_cap

    # ascending sink positions, n on padding slots (searchsorted-ready)
    sink_pos = (
        jnp.full((sink_cap,), n, jnp.int32)
        .at[jnp.where(sink_run, rank - 1, sink_cap)]
        .set(ls, mode="drop")
    )
    sy = sink_pos // w
    sx = sink_pos % w
    real = sink_pos < n
    iota_s = jnp.arange(sink_cap, dtype=jnp.int32)

    # Chebyshev-<=3 adjacency via a DENSE separable window-min, not a
    # gather: per union-find round, scatter each sink's representative into
    # a full-image buffer (sentinel elsewhere), take the 7x7 window min with
    # 12 shifted-min passes (pure VPU/HBM-streaming work), and read it back
    # at the sink positions with one sink_cap-sized gather. The previous
    # explicit 48-neighbor adjacency (slot-image scatter + (48, sink_cap)
    # gather per round) paid TPU gather cost on ~790K elements every round:
    # 13 ms to build + ~10 ms/round, 74 ms/img total at 2048^2 on v5e; this
    # formulation measures ~9 ms/img for identical representatives.
    def _window_min7(img2d):
        p = jnp.pad(img2d, 3, constant_values=sink_cap)
        r = p
        for d in range(-3, 4):
            if d == 0:
                continue
            # rolls by <=3 on a 3-padded image only wrap sentinel rows/cols,
            # so they are exact shift-with-sentinel-fill
            r = jnp.minimum(r, jnp.roll(p, d, axis=0))
        r2 = r
        for d in range(-3, 4):
            if d == 0:
                continue
            r2 = jnp.minimum(r2, jnp.roll(r, d, axis=1))
        return r2[3:-3, 3:-3]

    # union-find by min-index propagation + pointer jumping (O(log) rounds
    # regardless of cluster shape). The scatter/window-min image carries
    # sink REPRESENTATIVE indices < sink_cap; when they fit int16 the
    # full-image buffer halves, halving the dominant HBM traffic of the
    # 12-pass separable window min (~9 -> ~5 ms/img at 2048^2 on v5e,
    # round 5). Integer min is exact in either width.
    sink_pos_safe = jnp.where(real, sink_pos, n)
    use_i16 = sink_cap < 32767 and os.environ.get("AMT_UF_INT16", "1") != "0"
    img_dtype = jnp.int16 if use_i16 else jnp.int32

    def uf_body(state):
        rep, _ = state
        img = (
            jnp.full((n,), sink_cap, img_dtype)
            .at[sink_pos_safe]
            .set(rep.astype(img_dtype), mode="drop")
        )
        m = _window_min7(img.reshape(h, w)).ravel()
        nm = m[jnp.where(real, sink_pos, 0)].astype(jnp.int32)
        new = jnp.minimum(rep, jnp.where(real, nm, rep))
        new = new[new]
        return new, jnp.any(new != rep)

    rep, _ = lax.while_loop(lambda s: s[1], uf_body, (iota_s, jnp.bool_(True)))

    # cluster order key: min over sinks of the clamped dilated top-left
    tl = jnp.where(real, jnp.maximum(sy - 1, 0) * w + jnp.maximum(sx - 1, 0), n)
    key_root = jnp.full((sink_cap,), n, jnp.int32).at[rep].min(tl, mode="drop")
    is_root = (rep == iota_s) & real
    root_key = jnp.where(is_root, key_root, n)
    # root keys are distinct per cluster (see docstring); equal keys exist
    # only among the n-sentinel non-roots, whose scattered value is the
    # constant 0 - the result is permutation-invariant, so unstable is exact
    order_key, root_ids = lax.sort((root_key, iota_s), num_keys=1, is_stable=False)
    root_label = (
        jnp.zeros((sink_cap,), jnp.int32)
        .at[root_ids]
        .set(jnp.where(order_key < n, iota_s + 1, 0))
    )
    lab_sink = jnp.where(real, root_label[rep], 0)

    # composite image: direct label on sinks, else 3x3 neighborhood max;
    # ONE cap-sized gather assigns every active pixel
    sink_label_img = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(real, sink_pos, n)]
        .set(lab_sink, mode="drop")
        .reshape(h, w)
    )
    mop = sink_label_img
    pad = jnp.pad(sink_label_img, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mop = jnp.maximum(mop, lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w)))
    composite = jnp.where(sink_label_img > 0, sink_label_img, mop).ravel()
    lab_c = jnp.where(valid, composite[jnp.where(valid, landing_compact, 0)], 0)
    return lab_c, sink_overflow


def _finish_masks_compact(
    idx: jax.Array,
    valid: jax.Array,
    landing_compact: jax.Array,
    flows: jax.Array | None,
    h: int,
    w: int,
    flow_threshold: float,
    max_cells: int,
    min_size: int,
    sink_count: int = 3,
    sink_cap: int | None = None,
    clear_border_labels: bool = False,
    allow_pallas: bool | None = None,
    pred_c: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compact-domain twin of `_finish_masks`: size filter, flow-error QC and
    sequential renumbering all run on (cap,)-sized arrays; the label image is
    materialized by cap-sized scatters only (once for the QC diffusion, once
    for the result). Bit-identical to the dense tail (equivalence-tested).

    `clear_border_labels` additionally zeroes (without renumbering, matching
    `ops.labeling.clear_border`) every label owning a border pixel - the
    plate runner's `remove_edge_cells` step, folded in here so it costs one
    cap-sized scatter-max instead of a full-image membership join.

    Returns (labels image, lab_c, sink_overflow): `lab_c` is the (cap,)
    per-compact-pixel final label (0 = background/dropped), which callers
    can feed to compact-domain measurement without re-deriving it from the
    image."""
    if sink_cap is None:
        sink_cap = max(1024, 16 * max_cells)
    n = h * w
    lab_c, sink_overflow = _cluster_landings_compact(
        idx, valid, landing_compact, h, w, sink_count, sink_cap
    )

    # size filter + sequential renumber (ascending old labels, matching
    # relabel_sequential_filtered): per-label pixel counts via a small-table
    # scatter-add with cap updates
    sizes = jnp.zeros((sink_cap + 1,), jnp.int32).at[lab_c].add(
        valid.astype(jnp.int32)
    )
    ids = jnp.arange(sink_cap + 1, dtype=jnp.int32)
    keep = (ids > 0) & (sizes > 0) & (sizes >= min_size)
    mapping = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)), 0)
    lab_c = mapping[lab_c]

    idx_safe = jnp.where(valid, idx, n)
    labels = (
        jnp.zeros((n,), jnp.int32).at[idx_safe].set(lab_c, mode="drop").reshape(h, w)
    )

    if flow_threshold > 0:
        # compact-domain QC: per-label reductions on (cap,)-sized arrays
        # (the full-image flow_error measured ~142 ms/img at 2048^2; this
        # path ~20 ms). labels is exactly the scatter of lab_c at idx here,
        # the invariant _flow_error_compact requires.
        use_pallas = _resolve_use_pallas(labels, (h, w), allow_pallas)
        errors = _flow_error_compact(
            idx, valid, lab_c, labels, flows, max_cells,
            use_pallas=use_pallas, pred_c=pred_c,
        )
        bad = errors > flow_threshold
        bad_lut = jnp.concatenate([jnp.array([False]), bad])
        # present labels are contiguous 1..K after the first renumber, so a
        # cumsum over per-id keep flags reproduces relabel_sequential exactly
        keep2 = ~bad_lut[jnp.clip(ids, 0, max_cells)] & (ids > 0)
        mapping2 = jnp.where(keep2, jnp.cumsum(keep2.astype(jnp.int32)), 0)
        lab_c = mapping2[lab_c]
        labels = None  # rebuilt below (possibly after the border filter)

    if clear_border_labels:
        yy = (idx_safe // w).astype(jnp.int32)
        xx = (idx_safe % w).astype(jnp.int32)
        on_border = valid & (
            (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
        )
        touched = (
            jnp.zeros((sink_cap + 1,), jnp.int32)
            .at[jnp.where(on_border, lab_c, 0)]
            .max(1)
        )
        keep_inner = (touched == 0).at[0].set(False)
        lab_c = jnp.where(keep_inner[lab_c], lab_c, 0)
        labels = None

    if labels is None:
        labels = (
            jnp.zeros((n,), jnp.int32)
            .at[idx_safe]
            .set(lab_c, mode="drop")
            .reshape(h, w)
        )

    return labels, lab_c, sink_overflow


# Pallas temporally-blocked diffusion kernel (flows_pallas.py): OPT-IN via
# AMT_PALLAS_DIFFUSE=1. Measured on a real v5e chip (round 3), the dense XLA
# loop runs the 128-iteration diffusion at 2048^2 in ~8.2 ms/img - at the
# HBM roofline, XLA fuses each iteration into one pass - while the Pallas
# kernel measured ~12 ms/img at ts=256 (the roll-based shifts and halo
# recompute cost more than the saved HBM traffic) and exceeds the 16 MB
# scoped-vmem limit at ts=512 on 2048^2 inputs. The kernel is kept for
# hardware where the tradeoff flips; the dense loop is the default.
_USE_PALLAS_DIFFUSE = os.environ.get("AMT_PALLAS_DIFFUSE", "0") == "1"
_DIFFUSE_TS = 256


def _diffuse_pallas_viable(shape: tuple[int, int]) -> bool:
    h, w = shape
    return (
        _USE_PALLAS_DIFFUSE
        and h % _DIFFUSE_TS == 0
        and w % _DIFFUSE_TS == 0
        and jax.devices()[0].platform != "cpu"
    )


def masks_to_flows(
    labels: jax.Array,
    max_cells: int,
    n_iter: int = 128,
    allow_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Recompute flows from a label image (the Cellpose training-target /
    QC construction): diffuse heat from each cell's center within the cell,
    then take the normalized gradient.

    The diffusion runs through the temporally-blocked Pallas kernel when the
    shape and backend allow it; the choice is resolved HERE, outside jit,
    into a static cache key (the `use_pallas_local` pattern of
    ops/labeling.py - toggles never invalidate other programs' caches).
    `allow_pallas` (None = module default) lets callers that compile for a
    different backend than `jax.devices()[0]` - CPU-pinned models, spatially
    sharded (GSPMD-partitioned) programs where a Mosaic call could not be
    partitioned along the sharded axis - force the pure-XLA dense loop.
    When `labels` is a concrete committed array its own platform is used,
    so CPU-placed computations on a TPU-attached host stay off the kernel.

    Returns:
        (flows (H, W, 2) float32 unit vectors, cellprob-proxy (H, W) bool).
    """
    viable = _resolve_use_pallas(labels, jnp.shape(labels), allow_pallas)
    return _masks_to_flows_impl(labels, max_cells, n_iter, viable)


def _resolve_use_pallas(arr, shape, allow_pallas: bool | None) -> bool:
    """Resolve the diffusion-kernel choice OUTSIDE jit into a static flag
    (see `masks_to_flows`). When `arr` is a concrete committed array its own
    platform is used, so CPU-placed computations on a TPU host stay off the
    TPU-only kernel."""
    viable = _diffuse_pallas_viable(shape)
    devs = getattr(arr, "devices", None)
    if viable and callable(devs):
        try:
            viable = all(d.platform != "cpu" for d in devs())
        except Exception:  # tracers: fall through to the default resolution
            pass
    if allow_pallas is not None:
        viable = viable and allow_pallas
    return viable


@partial(jax.jit, static_argnames=("max_cells", "n_iter", "use_pallas"))
def _masks_to_flows_impl(
    labels: jax.Array, max_cells: int, n_iter: int, use_pallas: bool
) -> tuple[jax.Array, jax.Array]:
    """Jitted body of `masks_to_flows` (kernel choice already resolved)."""
    lbl = jnp.asarray(labels).astype(jnp.int32)
    h, w = lbl.shape
    nseg = max_cells + 1
    seg = jnp.clip(lbl.ravel(), 0, max_cells)
    fg = lbl > 0

    # center pixel per label = pixel closest to the centroid. Per-label
    # reductions run on the MXU segment kernels (jax.ops.segment_sum lowers
    # to scatter-add, which serializes on TPU; the .at[].min scatters were
    # the same story). Per-pixel reads of the per-label tables (cy[seg],
    # dmin[seg], ...) go through `table_lookup_matmul` - XLA's gather costs
    # ~27 ms per 4M indices on v5e even for a 1K table, and these four
    # lookups dominated the QC stage (~110 of 141 ms at 2048^2).
    from ..ops.segment_reduce import (
        segment_minmax_blockwise,
        segment_sums_matmul,
        table_lookup_matmul,
    )

    yy, xx = jnp.mgrid[0:h, 0:w]
    yf = yy.ravel().astype(jnp.float32)
    xf = xx.ravel().astype(jnp.float32)
    ones = jnp.ones_like(yf)
    sums = segment_sums_matmul(jnp.stack([ones, yf, xf]), seg, nseg)
    area = sums[0]
    cy = sums[1] / jnp.maximum(area, 1.0)
    cx = sums[2] / jnp.maximum(area, 1.0)
    c_at = table_lookup_matmul(jnp.stack([cy, cx]), seg)
    d2 = (yf - c_at[0]) ** 2 + (xf - c_at[1]) ** 2
    d2 = jnp.where(seg > 0, d2, jnp.inf)
    # per-label argmin in two passes: min distance, then min index among ties
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    d2_f = jnp.where(jnp.isfinite(d2), d2, big)
    dmin = segment_minmax_blockwise(d2_f[None], seg, nseg, compute_max=False)[0][0]
    idx = jnp.arange(h * w, dtype=jnp.float32)  # exact up to 2^24 pixels
    candidate = (d2_f == table_lookup_matmul(dmin, seg)) & (seg > 0)
    center_of = segment_minmax_blockwise(
        jnp.where(candidate, idx, jnp.float32(h * w))[None], seg, nseg,
        compute_max=False,
    )[0][0]
    is_center = candidate & (idx == table_lookup_matmul(center_of, seg))
    source = is_center.reshape(h, w).astype(jnp.float32)

    return _diffuse_and_gradient(lbl, source, n_iter, use_pallas), fg


def _diffuse_and_gradient(
    lbl: jax.Array, source: jax.Array, n_iter: int, use_pallas: bool
) -> jax.Array:
    """Shared diffusion + unit-gradient tail of the flow-target construction:
    diffuse heat from `source` within same-label neighborhoods, then return
    the (H, W, 2) normalized gradient. All dense elementwise/stencil work -
    cheap (the 128-iteration diffusion measured ~8 ms/img at 2048^2 on v5e,
    the HBM roofline); the expensive per-label reductions live in the
    callers, full-image or compact."""
    h, w = lbl.shape
    fg = lbl > 0

    # heat diffusion restricted to same-label neighbors. The same-label
    # masks are loop-invariant: hoisting them saves 4 int32 image reads +
    # compares per iteration (~40% of the 128-iteration loop's traffic).
    lbl_pad = jnp.pad(lbl, 1, constant_values=-1)
    _DIFF_OFFS = ((-1, 0), (1, 0), (0, -1), (0, 1))
    same_nbr = {
        (dy, dx): lax.dynamic_slice(lbl_pad, (1 + dy, 1 + dx), (h, w)) == lbl
        for dy, dx in _DIFF_OFFS
    }

    if use_pallas:
        # opt-in temporally-blocked Pallas stencil (see the module toggle
        # note above - the dense loop measured faster on v5e). ts stays at
        # 256: ts=512 with halo 64 exceeds the 16 MB scoped-vmem limit on
        # 2048^2 inputs (16.15 MB > 16 MB, measured on-chip round 3).
        from .flows_pallas import diffuse_pallas

        T = diffuse_pallas(lbl, source, n_iter, ts=_DIFFUSE_TS)
    else:
        # the SAME function the Pallas parity tests compare against - one
        # implementation, so the "bit-identical" guarantee covers production
        # (its same-label masks CSE with same_nbr above under XLA)
        from .flows_pallas import diffuse_xla

        T = diffuse_xla(lbl, source, n_iter)
    T = jnp.log1p(T)

    # gradient (central differences within the mask)
    Tp = jnp.pad(T, 1, mode="edge")

    def nbr(dy, dx):
        v = lax.dynamic_slice(Tp, (1 + dy, 1 + dx), (h, w))
        return jnp.where(same_nbr[(dy, dx)], v, T)

    gy = (nbr(1, 0) - nbr(-1, 0)) / 2.0
    gx = (nbr(0, 1) - nbr(0, -1)) / 2.0
    norm = jnp.sqrt(gy * gy + gx * gx)
    unit_y = jnp.where(fg & (norm > 1e-6), gy / jnp.maximum(norm, 1e-6), 0.0)
    unit_x = jnp.where(fg & (norm > 1e-6), gx / jnp.maximum(norm, 1e-6), 0.0)
    return jnp.stack([unit_y, unit_x], axis=-1)


@partial(jax.jit, static_argnames=("max_cells", "allow_pallas"))
def flow_error(
    labels: jax.Array,
    predicted_flows: jax.Array,  # (H, W, 2) unit flows from the network
    max_cells: int,
    allow_pallas: bool | None = None,
) -> jax.Array:
    """Per-mask mean squared error between predicted flows and the flows the
    mask itself implies (Cellpose's QC criterion). Returns (max_cells,)."""
    from ..ops.segment_reduce import segment_sums_matmul

    computed, _ = masks_to_flows(labels, max_cells, allow_pallas=allow_pallas)
    lbl = jnp.asarray(labels).astype(jnp.int32)
    nseg = max_cells + 1
    seg = jnp.clip(lbl.ravel(), 0, max_cells)
    se = jnp.sum((predicted_flows - computed) ** 2, axis=-1).ravel()
    sums = segment_sums_matmul(jnp.stack([se, jnp.ones_like(se)]), seg, nseg)
    err = sums[0] / jnp.maximum(sums[1], 1.0)
    return err[1:]


def _flow_error_compact(
    idx: jax.Array,  # (cap,) flat indices of active pixels (n on padding)
    valid: jax.Array,  # (cap,) bool
    lab_c: jax.Array,  # (cap,) int32 final labels per compact pixel (0 = bg)
    labels: jax.Array,  # (H, W) int32 label image (scatter of lab_c at idx)
    predicted_flows: jax.Array | None,  # (H, W, 2) unit flows (None: pred_c)
    max_cells: int,
    n_iter: int = 128,
    use_pallas: bool = False,
    pred_c: jax.Array | None = None,  # (cap, 2) flows at compact pixels
) -> jax.Array:
    """`flow_error` in the compact domain. The full-image version spends its
    time in per-label reductions and table lookups over all H*W pixels
    (~142 ms/img of the deep path's QC at 2048^2 on v5e) even though only
    the foreground participates; here every segment reduction and lookup
    runs on the (cap,)-sized active set instead (cap/HW ~ 6% by default).
    The dense work that remains - the diffusion stencil and the gradient -
    is elementwise/HBM-roofline cheap (~10 ms).

    Centers are bit-identical to the dense path: coordinate/count sums are
    integer-valued and below 2^24, so f32 accumulation is exact regardless
    of blocking order. The per-mask MSE may differ from the dense path in
    the last ulp (different f32 summation grouping).

    Requires `labels` to be exactly the scatter of `lab_c` at `idx` (the
    `_finish_masks_compact` invariant). Returns (max_cells,) mean squared
    flow error per label id.
    """
    from ..ops.segment_reduce import segment_sums_matmul, table_lookup_matmul

    h, w = labels.shape
    n = h * w
    nseg = max_cells + 1
    seg = jnp.where(valid, jnp.clip(lab_c, 0, max_cells), 0)
    vf = valid.astype(jnp.float32)
    idx_safe = jnp.where(valid, idx, 0)
    yf = (idx_safe // w).astype(jnp.float32) * vf
    xf = (idx_safe % w).astype(jnp.float32) * vf

    # per-label centroid -> center pixel (pixel closest to the centroid,
    # ties broken by min flat index), mirroring _masks_to_flows_impl
    sums = segment_sums_matmul(jnp.stack([vf, yf, xf]), seg, nseg)
    area = sums[0]
    cy = sums[1] / jnp.maximum(area, 1.0)
    cx = sums[2] / jnp.maximum(area, 1.0)
    c_at = table_lookup_matmul(jnp.stack([cy, cx]), seg)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    d2 = (yf - c_at[0]) ** 2 + (xf - c_at[1]) ** 2
    d2_f = jnp.where(seg > 0, d2, big)
    # segment argmin(d2, tie: min idx) as ONE unstable 3-key sort: the head
    # slot of each segment's run is its center pixel. Nonnegative f32 sorts
    # identically to its int32 bit pattern, so d2 rides as bitcast keys and
    # the selection is bit-exact vs the previous two segment-min sweeps +
    # two table lookups (which measured ~14 ms/img of the QC at 2048^2;
    # the cap-sized sort runs in ~2.5 ms). Triples are distinct on the
    # active set (idx is unique); padding triples are identical copies, so
    # unstable ordering cannot change the result.
    d2_bits = lax.bitcast_convert_type(d2_f, jnp.int32)
    idx_key = jnp.where(valid, idx, n)
    seg_s, _, idx_s = lax.sort(
        (seg, d2_bits, idx_key), num_keys=3, is_stable=False
    )
    ishead = (seg_s > 0) & jnp.concatenate(
        [jnp.ones((1,), bool), seg_s[1:] != seg_s[:-1]]
    )
    source = (
        jnp.zeros((n,), jnp.float32)
        .at[jnp.where(ishead, idx_s, n)]
        .set(1.0, mode="drop")
        .reshape(h, w)
    )

    computed = _diffuse_and_gradient(
        labels.astype(jnp.int32), source, n_iter, use_pallas
    )

    # per-mask MSE over the active set only: two cap-sized gathers replace
    # the full-image squared-error reduction (pred_c pre-gathered by S2D
    # callers whose network output never exists in planar layout)
    if pred_c is None:
        pred_c = predicted_flows.reshape(n, 2)[idx_safe]
    comp_c = computed.reshape(n, 2)[idx_safe]
    se = jnp.sum((pred_c - comp_c) ** 2, axis=-1) * vf
    sums2 = segment_sums_matmul(jnp.stack([se, vf]), seg, nseg)
    err = sums2[0] / jnp.maximum(sums2[1], 1.0)
    return err[1:]


@partial(
    jax.jit,
    static_argnames=(
        "niter", "max_cells", "min_size", "flow_threshold", "sparse_cap",
        "allow_pallas",
    ),
)
def compute_masks(
    network_output: jax.Array,  # (H, W, 3): dY, dX, cellprob logits
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    niter: int = 200,
    max_cells: int = 1024,
    min_size: int = 15,
    sparse_cap: int | None = None,
    allow_pallas: bool | None = None,
) -> jax.Array:
    """Full mask reconstruction: threshold cellprob, integrate flows, cluster
    sinks, QC by flow error, relabel sequentially. Returns int32 labels.

    `flow_threshold <= 0` disables the QC pass (Cellpose convention).

    `sparse_cap` routes flow integration through the active-pixel-compacted
    doubling (`follow_flows_indices_sparse`) when the foreground fits the
    cap, with a lax.cond fallback to the dense path when it does not -
    identical landings either way (equivalence-tested), large speedup on
    big sparse wells.

    The network is trained against 5x-scaled unit flows (the Cellpose
    target convention); integration and QC use the unit-scale field.
    """
    flows = network_output[..., :2] / 5.0
    cellprob = network_output[..., 2]
    active = cellprob > cellprob_threshold

    if sparse_cap is not None:
        # NOTE: under vmap this cond becomes a select and BOTH paths run;
        # batched callers that want the sparse win should use
        # compute_masks_sparse and route the overflow flag to their own
        # capacity escalation (parallel/plate.py does).
        landing = lax.cond(
            jnp.sum(active) <= sparse_cap,
            lambda: follow_flows_indices_sparse(
                flows, active, niter=niter, cap=sparse_cap
            )[0],
            lambda: follow_flows_indices(flows, active, niter=niter),
        )
    else:
        landing = follow_flows_indices(flows, active, niter=niter)
    return _finish_masks(
        landing, active, flows, flow_threshold, max_cells, min_size,
        allow_pallas=allow_pallas,
    )


@partial(
    jax.jit,
    static_argnames=(
        "niter", "max_cells", "min_size", "flow_threshold", "cap",
        "allow_pallas",
    ),
)
def compute_masks_sparse(
    network_output: jax.Array,  # (H, W, 3): dY, dX, cellprob logits
    cap: int,
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    niter: int = 200,
    max_cells: int = 1024,
    min_size: int = 15,
    allow_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`compute_masks` with UNCONDITIONALLY sparse flow integration.

    Returns (labels, ok): `ok` is False when the active-pixel count exceeded
    `cap`, in which case only the first `cap` pixels were advected and the
    labels are incomplete - callers must treat it like any other capacity
    overflow (the plate runner re-dispatches the well with escalated caps).
    vmap-friendly: no lax.cond, so batching never silently runs the dense
    path for every image.
    """
    out = compute_masks_sparse_compact(
        network_output,
        cap,
        cellprob_threshold=cellprob_threshold,
        flow_threshold=flow_threshold,
        niter=niter,
        max_cells=max_cells,
        min_size=min_size,
        allow_pallas=allow_pallas,
    )
    return out.labels, out.ok


class CompactMasks(NamedTuple):
    """Result of `compute_masks_sparse_compact`.

    Attributes:
        labels: (H, W) int32 label image.
        lab_c: (cap,) final label of each compacted active pixel (0 = none).
        idx: (cap,) flat pixel index of each compacted active pixel.
        valid: (cap,) bool, False on padding slots.
        ok: scalar bool, False on active-pixel or sink capacity overflow.
    """

    labels: jax.Array
    lab_c: jax.Array
    idx: jax.Array
    valid: jax.Array
    ok: jax.Array


@partial(
    jax.jit,
    static_argnames=(
        "niter",
        "max_cells",
        "min_size",
        "flow_threshold",
        "cap",
        "clear_border_labels",
        "allow_pallas",
    ),
)
def compute_masks_sparse_compact(
    network_output: jax.Array,  # (H, W, 3): dY, dX, cellprob logits
    cap: int,
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    niter: int = 200,
    max_cells: int = 1024,
    min_size: int = 15,
    clear_border_labels: bool = False,
    allow_pallas: bool | None = None,
) -> CompactMasks:
    """`compute_masks_sparse` that also exposes the compact pixel set.

    The plate runner measures cells directly on (lab_c, idx) via
    `ops.regionprops.measure_compacted` - the full-image label scan that
    `measure_labels`/`measure_intensity_stack` would pay (~390 ms at 2048^2
    x 4 channels on v5e) collapses to cap-sized reductions. The label image
    is still materialized (the perimeter stencil and API callers need it).
    """
    flows = network_output[..., :2] / 5.0
    cellprob = network_output[..., 2]
    active = cellprob > cellprob_threshold
    h, w = active.shape
    idx, valid, landing_compact, ok = _follow_sparse_core(flows, active, niter, cap)
    labels, lab_c, sink_ovf = _finish_masks_compact(
        idx,
        valid,
        landing_compact,
        flows,
        h,
        w,
        flow_threshold,
        max_cells,
        min_size,
        clear_border_labels=clear_border_labels,
        allow_pallas=allow_pallas,
    )
    return CompactMasks(labels, lab_c, idx, valid, ok & ~sink_ovf)


def _follow_sparse_core_s2d(
    out_s2d: jax.Array,  # (H/2, W/2, 12) f32 head output, (c, a) order
    cellprob_threshold: float,
    niter: int,
    cap: int,
    want_pred_c: bool,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array | None]:
    """`_follow_sparse_core` reading the network output ON the S2D grid.

    The S2D forward's head (models/unet_s2d.apply_unet_s2d(out_s2d=True))
    emits (H/2, W/2, 12) with flat channel c*4 + (ay*2 + ax) - the planar
    (H, W, 3) tensor is a pure permutation of it that costs a
    depth-to-space conv plus layout-hostile 3-minor-lane slices to
    materialize and read (~12 ms/img at 2048^2 on v5e). Everything this
    core needs is elementwise (threshold, one advection step) or
    gather-by-flat-index, so it computes flat image coordinates from
    broadcasted iotas instead: y = 2i + ay, x = 2j + ax. The compaction
    sort keys are true flat indices whatever the element order, so `idx`,
    `landing_compact` and all downstream results are bit-identical to the
    planar core fed the permuted tensor (equivalence-tested).

    Returns (idx, valid, landing_compact, ok, pred_c): as the planar core,
    plus the (cap, 2) predicted unit flows gathered at the compact pixels
    (None unless `want_pred_c`) for `_flow_error_compact`.
    """
    h2, w2, ch = out_s2d.shape
    assert ch == 12, f"expected 12 S2D channels, got {ch}"
    h, w = 2 * h2, 2 * w2
    n = h * w
    i = lax.broadcasted_iota(jnp.int32, (h2, w2, 4), 0)
    j = lax.broadcasted_iota(jnp.int32, (h2, w2, 4), 1)
    a = lax.broadcasted_iota(jnp.int32, (h2, w2, 4), 2)
    y = 2 * i + (a >> 1)
    x = 2 * j + (a & 1)
    fy = out_s2d[..., 0:4].astype(jnp.float32) / 5.0
    fx = out_s2d[..., 4:8].astype(jnp.float32) / 5.0
    act3 = out_s2d[..., 8:12] > cellprob_threshold
    ny = jnp.clip(jnp.round(y.astype(jnp.float32) + fy).astype(jnp.int32), 0, h - 1)
    nx = jnp.clip(jnp.round(x.astype(jnp.float32) + fx).astype(jnp.int32), 0, w - 1)
    own3 = y * w + x
    nxt_r = jnp.where(act3, ny * w + nx, own3).ravel()
    act = act3.ravel()
    own = own3.ravel()

    n_active = jnp.sum(act)
    ok = n_active <= cap
    # identical compaction to the planar core: the keys are flat indices,
    # so sorting them yields the SAME ascending active-index list from the
    # S2D element order (see _follow_sparse_core for the is_stable story).
    # Large images route through the two-stage segment compaction on the
    # S2D grid (bit-identical; see _compact_two_stage_s2d).
    if _two_stage_viable(n, cap) and w2 % 2 == 0:
        idx, seg_ok = _compact_two_stage_s2d(act3, h, w, cap)
        ok = ok & seg_ok
    else:
        sorted_keys = lax.sort(jnp.where(act, own, n + own), is_stable=False)
        if cap <= n:
            head = sorted_keys[:cap]
        else:
            head = jnp.pad(sorted_keys, (0, cap - n), constant_values=n)
        idx = jnp.where(head < n, head, n)
    valid = idx < n
    idx_safe = jnp.where(valid, idx, 0)

    # S2D ravel position of each compact pixel: pure index arithmetic
    # replaces the planar path's flat-ordered successor table
    iy, ix = idx_safe // w, idx_safe % w
    sub = (iy & 1) * 2 + (ix & 1)
    base = (iy >> 1) * w2 + (ix >> 1)
    succ = nxt_r[base * 4 + sub]

    slot = jnp.full((n,), cap, jnp.int32).at[idx_safe].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )
    comp_next = slot[succ]
    comp_next = jnp.where(
        valid & (comp_next < cap), comp_next, jnp.arange(cap, dtype=jnp.int32)
    )

    steps = max(1, int(np.ceil(np.log2(max(niter, 2)))))

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
    landing_compact = idx_safe[comp_final]

    pred_c = None
    if want_pred_c:
        out_r = out_s2d.reshape(-1)
        off = base * 12 + sub
        pred_c = jnp.stack([out_r[off], out_r[off + 4]], axis=-1) / 5.0
    return idx, valid, landing_compact, ok, pred_c


@partial(
    jax.jit,
    static_argnames=(
        "niter",
        "max_cells",
        "min_size",
        "flow_threshold",
        "cap",
        "clear_border_labels",
        "allow_pallas",
    ),
)
def compute_masks_sparse_compact_s2d(
    out_s2d: jax.Array,  # (H/2, W/2, 12): S2D head output, (c, a) order
    cap: int,
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    niter: int = 200,
    max_cells: int = 1024,
    min_size: int = 15,
    clear_border_labels: bool = False,
    allow_pallas: bool | None = None,
) -> CompactMasks:
    """`compute_masks_sparse_compact` on the S2D-grid head output.

    Same results (bit-identical labels given the permuted same values) and
    the same CompactMasks contract, without ever materializing the planar
    (H, W, 3) network output - the plate runner's deep path pairs this
    with `apply_unet_s2d(out_s2d=True)`.
    """
    h2, w2, _ = out_s2d.shape
    h, w = 2 * h2, 2 * w2
    idx, valid, landing_compact, ok, pred_c = _follow_sparse_core_s2d(
        out_s2d, cellprob_threshold, niter, cap, want_pred_c=flow_threshold > 0
    )
    labels, lab_c, sink_ovf = _finish_masks_compact(
        idx,
        valid,
        landing_compact,
        None,
        h,
        w,
        flow_threshold,
        max_cells,
        min_size,
        clear_border_labels=clear_border_labels,
        allow_pallas=allow_pallas,
        pred_c=pred_c,
    )
    return CompactMasks(labels, lab_c, idx, valid, ok & ~sink_ovf)


def _finish_masks(
    landing, active, flows, flow_threshold, max_cells, min_size,
    allow_pallas=None,
):
    """Shared tail of mask reconstruction: sink clustering, size filter,
    flow-error QC, sequential relabel."""
    from ..ops.labeling import relabel_sequential, relabel_sequential_filtered

    # the size filter rides the relabel sort (run lengths are free in sorted
    # order), so masks_from_landing skips its own size pass
    labels = masks_from_landing(landing, active, min_size=0)
    labels = relabel_sequential_filtered(labels, min_size)

    if flow_threshold > 0:
        from ..ops.segment_reduce import table_lookup_matmul

        errors = flow_error(labels, flows, max_cells, allow_pallas=allow_pallas)
        bad = errors > flow_threshold
        # map per-label badness back onto pixels (MXU lookup: the XLA gather
        # for this full-image read of a 1K table costs ~27 ms at 2048^2)
        bad_lut = jnp.concatenate([jnp.zeros((1,), jnp.int32), bad.astype(jnp.int32)])
        keep = (
            table_lookup_matmul(bad_lut, jnp.clip(labels, 0, max_cells).ravel()) == 0
        ).reshape(labels.shape)
        labels = jnp.where(keep, labels, 0)
        labels = relabel_sequential(labels)

    return labels
