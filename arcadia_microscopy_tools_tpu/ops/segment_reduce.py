"""MXU-friendly segment reductions.

`jax.ops.segment_sum` lowers to scatter-add, which serializes badly on TPU
(~100 ms per reduction over a 2048^2 image). Per-cell measurement is really
a dense matrix product in disguise: for a block of pixels, the one-hot label
matrix (block x segments) times the quantity matrix (quantities x block)
yields all segment sums of all quantities in one bf16 matmul on the MXU.

`segment_sums_matmul` processes the image in fixed-size blocks inside a
`lax.scan`, computing Q quantities x S segments per step:
    (Q, B) @ (B, S) -> (Q, S), accumulated in f32.
For a 2048^2 image with 1024 segments and 15 quantities this is ~130 GFLOP
of bf16 - about a millisecond of MXU time versus ~1.5 s of scatters.

Segment min/max (bbox, intensity extrema) use the same blockwise one-hot
mask with a VPU max-reduce instead of a matmul.

bf16 caveat: quantities are accumulated exactly only if each PRODUCT is
exactly representable. We split large-magnitude quantities (coordinates,
squared coordinates) into high/low bf16 parts so the matmul-based sums stay
within float32 rounding of the exact result (tested against f64 in
tests/test_segment_reduce.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "segment_sums_matmul",
    "segment_minmax_blockwise",
    "segment_central_moments",
    "segment_variances",
    "table_lookup_matmul",
]


def _bf16_round(x: jax.Array) -> jax.Array:
    """x rounded to the nearest bf16 value (ties-to-even), returned as f32.

    Computed with integer bit arithmetic on the f32 pattern instead of an
    f32->bf16->f32 convert pair: XLA:TPU's excess-precision folding elides
    the convert roundtrip (treating it as a no-op widening), which silently
    zeroes the `lo` residual in the splits below and re-rounds `hi` inside
    the matmul - measured 33/82501 absolute error on 2048^2 centroid sums
    before the round-4 fix. The first fix pinned the converts with
    `optimization_barrier`, but a barrier also fences fusion inside the
    measurement scan body (measured -7% on the classical plate composite,
    27.9 -> 26.1 img/s). The bit-level round is semantically identical to
    the hardware convert (bf16 = top 16 bits of f32 with RN-even, carry
    propagating into the exponent is correct IEEE behavior; inputs here are
    finite) and is plain fusible integer elementwise work.
    """
    u = lax.bitcast_convert_type(x, jnp.uint32)
    rounded = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) & jnp.uint32(
        0xFFFF0000
    )
    return lax.bitcast_convert_type(rounded, jnp.float32)


def _split_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split f32 values into two bf16-exact parts: x = hi + lo.

    bf16 has 8 mantissa bits; rounding x to bf16 keeps the top bits and the
    residual fits in another bf16 with disjoint exponent range, so
    hi + lo reconstructs x to ~16 mantissa bits - enough for pixel
    coordinates (< 2^12) and their squares (< 2^24) to survive exactly.
    `_bf16_round` (not a convert pair) keeps XLA from folding the split
    away; see its docstring.
    """
    hi = _bf16_round(x)
    # lo is consumed through a bf16 cast at the matmul input, which applies
    # the same rounding an explicit roundtrip here would
    lo = x - hi
    return hi, lo


@partial(jax.jit, static_argnames=("num_segments", "block", "exact"))
def segment_sums_matmul(
    quantities: jax.Array,  # (Q, N) float32
    segment_ids: jax.Array,  # (N,) int32 in [0, num_segments)
    num_segments: int,
    block: int = 8192,
    exact: bool = True,
) -> jax.Array:
    """All segment sums of all quantities in blockwise bf16 matmuls.

    Returns (Q, num_segments) float32. With `exact=True` each quantity is
    hi/lo-split so the bf16 matmul loses no precision for values up to ~2^16
    (f32 accumulation handles the rest).
    """
    q, n = quantities.shape
    pad = (-n) % block
    if pad:
        quantities = jnp.pad(quantities, ((0, 0), (0, pad)))
        # padded pixels point at segment 0 with zero quantities
        segment_ids = jnp.pad(segment_ids, (0, pad))
    n_pad = n + pad
    k = n_pad // block

    if exact:
        hi, lo = _split_bf16(quantities)
        qmat = jnp.concatenate([hi, lo], axis=0)  # (2Q, N)
    else:
        qmat = quantities

    qmat = qmat.reshape(qmat.shape[0], k, block).transpose(1, 0, 2)  # (K, Q', B)
    seg = segment_ids.reshape(k, block)

    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (block, num_segments), 1)

    def body(carry, inp):
        vals, labels = inp  # (Q', B), (B,)
        onehot = (labels[:, None] == seg_iota).astype(jnp.bfloat16)  # (B, S)
        partial_sums = jax.lax.dot_general(
            vals.astype(jnp.bfloat16),
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q', S)
        return carry + partial_sums, None

    init = jnp.zeros((qmat.shape[1], num_segments), jnp.float32)
    total, _ = lax.scan(body, init, (qmat, seg))

    if exact:
        total = total[:q] + total[q:]
    return total


@partial(jax.jit, static_argnames=("num_segments", "block", "compute_min", "compute_max"))
def segment_minmax_blockwise(
    values: jax.Array,  # (Q, N) float32
    segment_ids: jax.Array,  # (N,)
    num_segments: int,
    block: int = 16384,
    compute_min: bool = True,
    compute_max: bool = True,
) -> tuple[jax.Array | None, jax.Array | None]:
    """Segment min/max of each quantity via blockwise one-hot masking.

    One scan per quantity: XLA fuses the (B, S) masked reduce for a single
    quantity into a streaming pass, but materializes the (Q, B, S) tensor if
    quantities share one scan (10x slower, measured).

    Returns ((Q, S) mins, (Q, S) maxes); empty segments yield +inf / -inf.
    """
    q, n = values.shape
    pad = (-n) % block
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)))
        segment_ids = jnp.pad(segment_ids, (0, pad), constant_values=num_segments)
    n_pad = n + pad
    k = n_pad // block

    seg = segment_ids.reshape(k, block)
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (block, num_segments), 1)

    def one_quantity(vq):
        vals = vq.reshape(k, block)

        def body(carry, inp):
            cmin, cmax = carry
            v, labels = inp
            mask = labels[:, None] == seg_iota  # (B, S)
            if compute_min:
                cmin = jnp.minimum(cmin, jnp.min(jnp.where(mask, v[:, None], big), axis=0))
            if compute_max:
                cmax = jnp.maximum(cmax, jnp.max(jnp.where(mask, v[:, None], -big), axis=0))
            return (cmin, cmax), None

        init = (
            jnp.full((num_segments,), big, jnp.float32),
            jnp.full((num_segments,), -big, jnp.float32),
        )
        (cmin, cmax), _ = lax.scan(body, init, (vals, seg))
        return cmin, cmax

    mins = []
    maxs = []
    for i in range(q):
        cmin, cmax = one_quantity(values[i])
        mins.append(cmin)
        maxs.append(cmax)
    return (
        jnp.stack(mins) if compute_min else None,
        jnp.stack(maxs) if compute_max else None,
    )


def _split3_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Three-way bf16 split (~24 mantissa bits): x = a + b + c.

    `_bf16_round` (integer bit round, not a convert pair) keeps XLA:TPU's
    excess-precision folding from eliding the roundtrips and zeroing the
    residuals; see `_bf16_round`."""
    a = _bf16_round(x)
    r = x - a
    b = _bf16_round(r)
    c = r - b
    return a, b, c


@partial(jax.jit, static_argnames=("num_segments", "block"))
def segment_central_moments(
    yf: jax.Array,  # (N,) row coordinates, float32
    xf: jax.Array,  # (N,) col coordinates, float32
    extra: jax.Array,  # (E, N) additional quantities to segment-sum
    segment_ids: jax.Array,  # (N,) int32
    cy: jax.Array,  # (S,) per-segment centroid rows
    cx: jax.Array,  # (S,) per-segment centroid cols
    num_segments: int,
    block: int = 8192,
    minmax_vals: jax.Array | None = None,  # (M, N) quantities for min/max
    value_channels: jax.Array | None = None,  # (C, N) values to variance-sum
    channel_means: jax.Array | None = None,  # (C, S) per-segment means
) -> tuple[
    jax.Array, jax.Array, jax.Array, jax.Array,
    tuple[jax.Array, jax.Array] | None, jax.Array | None,
]:
    """Segment sums of centered second moments (dy^2, dx^2, dy*dx) plus extra
    quantities, with NO per-pixel gathers - and, optionally, segment min/max
    of `minmax_vals` fused into the SAME blockwise scan.

    The per-pixel centroid lookup cy[seg] is reconstructed inside the scan as
    onehot @ cy using a 3-way bf16 split of the centroid table (~24 mantissa
    bits - float32-grade for coordinates up to 2^13), so the whole pass stays
    on the MXU. Fusing the min/max quantities reuses the per-block one-hot
    membership (its construction is the dominant cost of a standalone
    `segment_minmax_blockwise` pass); padding slots must carry segment id 0
    (their extrema land in the dropped background column). `value_channels`
    with `channel_means` additionally accumulates centered squared-deviation
    sums per channel in the SAME scan (see `segment_variances` for why raw
    sums of squares cannot produce an accurate variance); the final tuple
    element carries those (C, S) sums, or None.
    """
    e, n = extra.shape
    m = 0 if minmax_vals is None else minmax_vals.shape[0]
    c = 0 if value_channels is None else value_channels.shape[0]
    pad = (-n) % block
    if pad:
        yf = jnp.pad(yf, (0, pad))
        xf = jnp.pad(xf, (0, pad))
        extra = jnp.pad(extra, ((0, 0), (0, pad)))
        segment_ids = jnp.pad(segment_ids, (0, pad))
        if m:
            minmax_vals = jnp.pad(minmax_vals, ((0, 0), (0, pad)))
        if c:
            value_channels = jnp.pad(value_channels, ((0, 0), (0, pad)))
    k = (n + pad) // block

    yb = yf.reshape(k, block)
    xb = xf.reshape(k, block)
    eb = extra.reshape(e, k, block).transpose(1, 0, 2)
    seg = segment_ids.reshape(k, block)
    mb = (
        minmax_vals.reshape(m, k, block).transpose(1, 0, 2)
        if m
        else jnp.zeros((k, 0, block), jnp.float32)
    )
    vb = (
        value_channels.reshape(c, k, block).transpose(1, 0, 2)
        if c
        else jnp.zeros((k, 0, block), jnp.float32)
    )
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (block, num_segments), 1)

    cy_parts = _split3_bf16(cy)
    cx_parts = _split3_bf16(cx)
    mean_parts = [_split3_bf16(channel_means[ci]) for ci in range(c)]
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    def body(carry, inp):
        sums_c, min_c, max_c = carry
        y, x, ex, mv, vc, labels = inp
        member = labels[:, None] == seg_iota  # (B, S) bool
        onehot = member.astype(jnp.bfloat16)

        def lookup(parts):
            acc = jnp.zeros((block,), jnp.float32)
            for p in parts:
                acc = acc + jax.lax.dot_general(
                    onehot,
                    p.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        dy = y - lookup(cy_parts)
        dx = x - lookup(cx_parts)
        rows = [jnp.stack([dy * dy, dx * dx, dy * dx]), ex]
        if c:
            dev = jnp.stack([vc[ci] - lookup(mean_parts[ci]) for ci in range(c)])
            rows.append(dev * dev)
        quantities = jnp.concatenate(rows, axis=0)  # (3+E+C, B)
        # integer-bit round: see _bf16_round (a convert pair would be folded
        # away by XLA:TPU, zeroing the residual row; a barrier would fence
        # fusion across the scan body)
        hi = _bf16_round(quantities)
        lo = quantities - hi
        qmat = jnp.concatenate([hi, lo], axis=0).astype(jnp.bfloat16)
        sums = jax.lax.dot_general(
            qmat,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*(3+E+C), S)

        for qi in range(m):
            v = mv[qi][:, None]
            min_c = min_c.at[qi].set(
                jnp.minimum(min_c[qi], jnp.min(jnp.where(member, v, big), axis=0))
            )
            max_c = max_c.at[qi].set(
                jnp.maximum(max_c[qi], jnp.max(jnp.where(member, v, -big), axis=0))
            )
        return (sums_c + sums, min_c, max_c), None

    rows_total = 3 + e + c
    init = (
        jnp.zeros((2 * rows_total, num_segments), jnp.float32),
        jnp.full((m, num_segments), big, jnp.float32),
        jnp.full((m, num_segments), -big, jnp.float32),
    )
    (total, mins, maxs), _ = lax.scan(body, init, (yb, xb, eb, mb, vb, seg))
    total = total[:rows_total] + total[rows_total:]
    minmax = (mins, maxs) if m else None
    var_sums = total[3 + e :] if c else None
    return total[0], total[1], total[2], total[3 : 3 + e], minmax, var_sums


@partial(jax.jit, static_argnames=("num_segments", "block"))
def segment_variances(
    values: jax.Array,  # (C, N) float32
    segment_ids: jax.Array,  # (N,) int32
    means: jax.Array,  # (C, S) per-segment means
    num_segments: int,
    block: int = 8192,
) -> jax.Array:
    """Segment sums of squared deviations sum((v - mean_seg)^2), gather-free.

    Summing raw v^2 cannot give an accurate variance for uint16-scale
    intensities: v^2 needs up to 32 mantissa bits, the bf16 hi/lo split
    keeps ~16, and the E[x^2] - E[x]^2 cancellation amplifies whatever
    rounding survives (a uniform region at 50000 counts would read a
    standard deviation of ~100 instead of 0). Centering first bounds the
    summand by the region's actual spread: the per-pixel mean arrives
    through an in-scan onehot @ means lookup (3-way bf16 split, ~24
    mantissa bits), the deviations are hi/lo split, and the squared sums
    accumulate in f32. Returns (C, S) float32.
    """
    c, n = values.shape
    pad = (-n) % block
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)))
        segment_ids = jnp.pad(segment_ids, (0, pad))
    k = (n + pad) // block

    vb = values.reshape(c, k, block).transpose(1, 0, 2)  # (K, C, B)
    seg = segment_ids.reshape(k, block)
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (block, num_segments), 1)
    mean_parts = [_split3_bf16(means[ci]) for ci in range(c)]

    def body(carry, inp):
        vals, labels = inp  # (C, B), (B,)
        onehot = (labels[:, None] == seg_iota).astype(jnp.bfloat16)  # (B, S)

        def lookup(parts):
            acc = jnp.zeros((block,), jnp.float32)
            for prt in parts:
                acc = acc + jax.lax.dot_general(
                    onehot,
                    prt.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        dev = jnp.stack([vals[ci] - lookup(mean_parts[ci]) for ci in range(c)])
        dsq = dev * dev  # (C, B)
        # integer-bit round: see _bf16_round
        hi = _bf16_round(dsq)
        lo = dsq - hi
        qmat = jnp.concatenate([hi, lo], axis=0).astype(jnp.bfloat16)
        sums = jax.lax.dot_general(
            qmat,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2C, S)
        return carry + sums, None

    init = jnp.zeros((2 * c, num_segments), jnp.float32)
    total, _ = lax.scan(body, init, (vb, seg))
    return total[:c] + total[c:]


@partial(jax.jit, static_argnames=("block",))
def table_lookup_matmul(
    tables: jax.Array, ids: jax.Array, block: int = 8192
) -> jax.Array:
    """Exact per-element lookup `tables[..., ids]` via byte-plane one-hot
    matmuls on the MXU.

    XLA lowers `table[ids]` to a gather, which is random-access bound on TPU
    (~27 ms per 4M indices even for a 1K-entry table, measured on v5e). A
    lookup into a small table is a dense selection in disguise: the
    (block, S) one-hot of the ids picks rows of an (S, 4Q) byte-plane matrix
    in one bf16 matmul at segment-sum speed (~7 ms for the same shape). Each
    32-bit payload is split into four bytes - exactly representable in bf16,
    and each one-hot row has a single 1 so no accumulation ever rounds -
    then recombined with integer shifts and bitcast back. Bit-exact for ANY
    32-bit payload, including f32 NaN/inf bit patterns.

    Only worth it for small tables: the one-hot build is O(N * S), so cost
    grows linearly with table size - at S ~ 1K it beats the gather ~4x; by
    S ~ 16K it loses. Use XLA's gather beyond a few thousand entries.

    Args:
        tables: (S,) or (Q, S) array of 32-bit payloads (f32 / i32 / u32).
        ids: (N,) int32 indices; out-of-range ids return all-zero payloads.
        block: ids processed per scan step.

    Returns:
        (N,) or (Q, N) array of tables.dtype.
    """
    squeeze = tables.ndim == 1
    if squeeze:
        tables = tables[None]
    q, s = tables.shape
    dtype = tables.dtype
    bits = lax.bitcast_convert_type(tables, jnp.uint32)
    planes = jnp.stack(
        [((bits >> shift) & 0xFF).astype(jnp.float32) for shift in (0, 8, 16, 24)],
        axis=-1,
    )  # (Q, S, 4)
    planes = planes.transpose(1, 0, 2).reshape(s, 4 * q).astype(jnp.bfloat16)

    n = ids.shape[0]
    pad = (-n) % block
    ids_p = jnp.pad(ids, (0, pad), constant_values=s)
    k = (n + pad) // block
    idm = ids_p.reshape(k, block)
    seg_iota = lax.broadcasted_iota(jnp.int32, (block, s), 1)

    def body(_, labels):
        onehot = (labels[:, None] == seg_iota).astype(jnp.bfloat16)
        sel = lax.dot_general(
            onehot,
            planes,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, 4Q)
        return None, sel

    _, sel = lax.scan(body, None, idm)
    sel = sel.reshape(k * block, q, 4)[:n]  # (N, Q, 4) byte values as f32
    b = sel.astype(jnp.uint32)
    word = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    out = lax.bitcast_convert_type(word, dtype).transpose(1, 0)  # (Q, N)
    return out[0] if squeeze else out
