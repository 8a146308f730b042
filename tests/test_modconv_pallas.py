"""Fused modulated-conv Pallas kernel vs the unfused XLA path.

The kernel (ops/pallas/modconv_pallas.py) must match modulated_conv2d +
bias_act exactly in structure: forward values, and gradients wrt x, w,
styles, bias — on CPU via interpret mode (force=True), at mxu='highest'
so both sides run true-fp32 contractions.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from stylemc_tpu.ops import bias_act
from stylemc_tpu.ops.modulated_conv import modulated_conv2d
from stylemc_tpu.ops.pallas.modconv_pallas import fused_modulated_layer

GAIN = float(np.sqrt(2))


def _ref_layer(x, w, s, noise, b, clamp=256.0):
    y = modulated_conv2d(x, w, s, noise=noise[None, None], up=1, padding=1,
                         flip_weight=True)
    return bias_act(y, b, act="lrelu", gain=GAIN, clamp=clamp)


def _mk(n=2, ci=8, co=16, h=16, w_sp=128, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, ci, h, w_sp), jnp.float32)
    w = jnp.asarray(rs.randn(co, ci, 3, 3) * 0.3, jnp.float32)
    s = jnp.asarray(rs.randn(n, ci) * 0.7 + 1.0, jnp.float32)
    noise = jnp.asarray(rs.randn(h, w_sp) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(co) * 0.2, jnp.float32)
    return x, w, s, noise, b


def test_fused_forward_matches_unfused():
    x, w, s, noise, b = _mk()
    want = np.asarray(_ref_layer(x, w, s, noise, b))
    got = fused_modulated_layer(x, w, s, noise, b, gain=GAIN, clamp=256.0,
                                mxu="highest", force=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_fused_forward_clamp_binds():
    x, w, s, noise, b = _mk(seed=3)
    x = x * 600.0  # push activations into the clamp
    want = np.asarray(_ref_layer(x, w, s, noise, b))
    got = np.asarray(fused_modulated_layer(
        x, w, s, noise, b, gain=GAIN, clamp=256.0, mxu="highest",
        force=True))
    assert (np.abs(want) >= 256.0 - 1e-3).any(), "clamp never bound"
    # atol covers values within fp-reassociation distance of the clamp
    # boundary (the fused path folds d into the taps; one element in 64k
    # lands on the other side of +-256)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def test_fused_grads_match_unfused():
    x, w, s, noise, b = _mk()

    def loss_ref(x, w, s, b):
        return jnp.sum(jnp.square(_ref_layer(x, w, s, noise, b)))

    def loss_fused(x, w, s, b):
        return jnp.sum(jnp.square(fused_modulated_layer(
            x, w, s, noise, b, gain=GAIN, clamp=256.0, mxu="highest",
            force=True)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, s, b)
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, s, b)
    for name, a, g in zip(("dx", "dw", "ds", "db"), want, got):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=name)


def test_fused_grads_with_clamp_active():
    x, w, s, noise, b = _mk(seed=3)
    x = x * 600.0

    def loss_ref(x, s):
        return jnp.sum(jnp.square(_ref_layer(x, w, s, noise, b)))

    def loss_fused(x, s):
        return jnp.sum(jnp.square(fused_modulated_layer(
            x, w, s, noise, b, gain=GAIN, clamp=256.0, mxu="highest",
            force=True)))

    want = jax.grad(loss_ref, argnums=(0, 1))(x, s)
    got = jax.grad(loss_fused, argnums=(0, 1))(x, s)
    for name, a, g in zip(("dx", "ds"), want, got):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=name)


def test_fused_rejects_unsupported():
    x, w, s, noise, b = _mk()
    # non-3x3 kernel
    w5 = jnp.zeros((16, 8, 5, 5), jnp.float32)
    assert fused_modulated_layer(x, w5, s, noise, b, force=True) is None
    # width not lane-aligned
    assert fused_modulated_layer(x[..., :96], w, s, noise[:, :96], b,
                                 force=True) is None


def test_fused_odd_batch_and_tall():
    x, w, s, noise, b = _mk(n=3, ci=16, co=8, h=24, w_sp=128, seed=7)
    want = np.asarray(_ref_layer(x, w, s, noise, b))
    got = np.asarray(fused_modulated_layer(
        x, w, s, noise, b, gain=GAIN, clamp=256.0, mxu="highest",
        force=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
