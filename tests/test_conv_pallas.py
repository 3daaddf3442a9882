"""Parity tests for the fused Pallas 3x3 conv kernel (models/conv_pallas.py)
against the XLA ops it replaces, in interpreter mode on CPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from arcadia_microscopy_tools_tpu.models.conv_pallas import (
    conv3x3_fused,
    conv_pallas_viable,
    gn_affine_params,
)


def _conv_ref(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


@pytest.mark.parametrize("b,h,w,c,co", [(1, 16, 128, 128, 128), (2, 24, 256, 64, 128)])
def test_plain_conv_parity(b, h, w, c, co):
    rng = np.random.default_rng(0)
    x = _rand(rng, (b, h, w, c)).astype(jnp.bfloat16)
    wk = _rand(rng, (3, 3, c, co), 0.05).astype(jnp.bfloat16)
    got = conv3x3_fused(x, wk, interpret=True)
    want = _conv_ref(x, wk).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.05,
    )


def test_prologue_relu_affine_matches_gn_then_conv():
    rng = np.random.default_rng(1)
    b, h, w, c, co, groups = 2, 16, 128, 128, 128, 8
    x = _rand(rng, (b, h, w, c)).astype(jnp.bfloat16)
    wk = _rand(rng, (3, 3, c, co), 0.05).astype(jnp.bfloat16)
    scale = _rand(rng, (c,), 0.5) + 1.0
    bias = _rand(rng, (c,), 0.1)

    # reference: GN (unet semantics) -> relu -> conv
    from arcadia_microscopy_tools_tpu.models.unet import _group_norm

    ref_in = jax.nn.relu(_group_norm(x, scale, bias, groups)).astype(jnp.bfloat16)
    want = _conv_ref(ref_in, wk).astype(jnp.bfloat16)

    # kernel path: moments on host, affine folded into the prologue
    f = x.astype(jnp.float32)
    s1 = jnp.sum(f, axis=(1, 2))
    s2 = jnp.sum(jnp.square(f), axis=(1, 2))
    eff_s, eff_b = gn_affine_params(s1, s2, scale, bias, groups, h * w * (c // groups))
    got = conv3x3_fused(x, wk, prologue=(eff_s, eff_b), relu=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.08,
    )


def test_accum_and_moments():
    rng = np.random.default_rng(2)
    b, h, w, c, co = 1, 16, 128, 128, 128
    x = _rand(rng, (b, h, w, c)).astype(jnp.bfloat16)
    wk = _rand(rng, (3, 3, c, co), 0.05).astype(jnp.bfloat16)
    z = _rand(rng, (b, h, w, co), 0.5).astype(jnp.bfloat16)
    y, (s1, s2) = conv3x3_fused(x, wk, accum=z, emit_moments=True, interpret=True)
    want = (_conv_ref(x, wk) + z.astype(jnp.float32)).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.05,
    )
    f = np.asarray(y, np.float32)
    np.testing.assert_allclose(np.asarray(s1), f.sum(axis=(1, 2)), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), (f * f).sum(axis=(1, 2)), rtol=1e-4, atol=1e-2)


def test_vmap_sequential():
    rng = np.random.default_rng(3)
    b, h, w, c, co = 2, 16, 128, 64, 128
    xs = _rand(rng, (3, b, h, w, c)).astype(jnp.bfloat16)
    wk = _rand(rng, (3, 3, c, co), 0.05).astype(jnp.bfloat16)
    got = jax.vmap(lambda xx: conv3x3_fused(xx, wk, interpret=True))(xs)
    want = jnp.stack([conv3x3_fused(xs[i], wk, interpret=True) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_viability_gate():
    assert not conv_pallas_viable((2, 16, 128, 100), 128)  # C not lane-aligned
    assert not conv_pallas_viable((2, 16, 100, 128), 128)  # W not lane-aligned
    assert not conv_pallas_viable((2, 16, 128, 128), 96)  # Co not lane-aligned
    # on CPU the backend gate rejects everything
    assert not conv_pallas_viable((2, 1024, 1024, 128), 128)
