"""Parity tests for the ops layer against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from stylemc_tpu.ops import (
    setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
    bias_act, conv2d_resample, modulated_conv2d,
)
from oracle import upfirdn2d_np, conv2d_np, modulated_conv2d_np

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


# ---------------------------------------------------------------- setup_filter

def test_setup_filter_default():
    f = np.array(setup_filter([1, 3, 3, 1]))
    assert f.shape == (4, 4)
    ref = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float64)
    ref /= ref.sum()
    np.testing.assert_allclose(f, ref, rtol=1e-6)


def test_setup_filter_separable():
    f = np.array(setup_filter([1, 2, 3, 4, 4, 3, 2, 1]))
    assert f.ndim == 1
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)


def test_setup_filter_none_and_gain():
    f = np.array(setup_filter(None, gain=4))
    assert f.shape == (1, 1)  # sub-8-tap filters become dense 2D
    np.testing.assert_allclose(f.sum(), 4.0, rtol=1e-6)  # gain**(ndim/2) = gain


# ------------------------------------------------------------------- upfirdn2d

@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (2, 2, (3, 2, 3, 2)),
    (1, 1, (-1, -1, -1, -1)),   # cropping
    (2, 1, (2, -1, 0, 1)),      # mixed pad/crop
])
def test_upfirdn2d_matches_oracle(up, down, padding):
    x = _rand(2, 3, 12, 10)
    f = setup_filter([1, 3, 3, 1])
    got = np.array(upfirdn2d(jnp.array(x), f, up=up, down=down, padding=padding))
    want = upfirdn2d_np(x, np.array(f), up=up, down=down, padding=padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_separable_matches_2d():
    x = _rand(1, 2, 16, 16)
    taps = [1, 2, 3, 4, 4, 3, 2, 1]
    f1 = setup_filter(taps)                      # separable (>=8 taps)
    f2 = setup_filter(taps, separable=False)     # dense outer product
    got1 = np.array(upfirdn2d(jnp.array(x), f1, up=2, padding=(4, 3, 4, 3)))
    got2 = np.array(upfirdn2d(jnp.array(x), f2, up=2, padding=(4, 3, 4, 3)))
    np.testing.assert_allclose(got1, got2, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_gain_and_flip():
    x = _rand(1, 1, 8, 8)
    f = setup_filter([1, 3, 1], normalize=False)
    got = np.array(upfirdn2d(jnp.array(x), f, padding=1, gain=2.0, flip_filter=True))
    want = upfirdn2d_np(x, np.array(f), padding=1, gain=2.0, flip_filter=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_none_filter_identity():
    x = _rand(1, 2, 6, 6)
    got = np.array(upfirdn2d(jnp.array(x), None))
    np.testing.assert_allclose(got, x, rtol=1e-6)


def test_upsample_downsample_shapes():
    x = _rand(2, 4, 8, 8)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(jnp.array(x), f)
    assert up.shape == (2, 4, 16, 16)
    down = downsample2d(jnp.array(up), f)
    assert down.shape == (2, 4, 8, 8)
    filt = filter2d(jnp.array(x), f)
    assert filt.shape == x.shape


def test_upsample2d_dc_gain():
    # A constant image must stay (approximately) constant under up/downsampling
    # with a normalized filter.
    x = np.ones((1, 1, 8, 8), dtype=np.float32)
    f = setup_filter([1, 3, 3, 1])
    up = np.array(upsample2d(jnp.array(x), f))
    np.testing.assert_allclose(up[:, :, 4:-4, 4:-4], 1.0, rtol=1e-4)


# -------------------------------------------------------------------- bias_act

def test_bias_act_lrelu_defaults():
    x = _rand(2, 5, 4, 4)
    b = _rand(5)
    got = np.array(bias_act(jnp.array(x), jnp.array(b), act="lrelu"))
    y = x + b[None, :, None, None]
    want = np.where(y >= 0, y, 0.2 * y) * np.sqrt(2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bias_act_clamp_and_gain():
    x = _rand(3, 4)
    got = np.array(bias_act(jnp.array(x), act="linear", gain=100.0, clamp=5.0))
    want = np.clip(x * 100.0, -5, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
def test_bias_act_all_acts_finite(act):
    x = _rand(2, 8)
    out = np.array(bias_act(jnp.array(x), act=act))
    assert np.isfinite(out).all()
    assert out.shape == x.shape


def test_bias_act_dim():
    x = _rand(2, 3, 5)
    b = _rand(5)
    got = np.array(bias_act(jnp.array(x), jnp.array(b), dim=2))
    np.testing.assert_allclose(got, x + b[None, None, :], rtol=1e-6)


# ------------------------------------------------------------- conv2d_resample

@pytest.mark.parametrize("up,down,kh,flip_weight", [
    (1, 1, 3, True),
    (1, 1, 1, True),
    (1, 1, 3, False),
    (2, 1, 3, False),   # synthesis up-conv configuration
    (1, 2, 3, True),    # discriminator down-conv configuration
    (2, 1, 1, True),    # 1x1 upsample
    (1, 2, 1, True),    # 1x1 downsample
])
def test_conv2d_resample_matches_oracle(up, down, kh, flip_weight):
    x = _rand(2, 6, 8, 8)
    w = _rand(4, 6, kh, kh) * 0.3
    f = setup_filter([1, 3, 3, 1])
    padding = kh // 2
    got = np.array(conv2d_resample(
        jnp.array(x), jnp.array(w), f=f, up=up, down=down,
        padding=padding, flip_weight=flip_weight))

    # Oracle follows the documented generic decomposition: pad/up-FIR → conv → down-FIR.
    fw = fh = 4
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    t = upfirdn2d_np(x, np.array(f) if up > 1 else None, up=up,
                     padding=(px0, px1, py0, py1), gain=up ** 2)
    t = conv2d_np(t, w, flip_weight=flip_weight)
    if down > 1:
        t = upfirdn2d_np(t, np.array(f), down=down)
    assert got.shape == t.shape
    np.testing.assert_allclose(got, t, rtol=1e-3, atol=1e-4)


def test_conv2d_resample_grad_finite():
    import jax
    x = jnp.array(_rand(1, 4, 8, 8))
    w = jnp.array(_rand(4, 4, 3, 3) * 0.3)
    f = setup_filter([1, 3, 3, 1])

    def loss(w_):
        return jnp.sum(conv2d_resample(x, w_, f=f, up=2, padding=1,
                                       flip_weight=False) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.array(g)).all()


@pytest.mark.parametrize("h,kh,pad,up", [
    (8, 3, 1, 2),    # synthesis up-conv configuration
    (7, 3, 2, 2),    # odd extent
    (8, 1, 0, 2),    # 1x1 up
    (4, 3, 1, 4),    # up=4
])
def test_polyphase_up_conv_matches_pad_dilate(h, kh, pad, up):
    """The polyphase fused up-conv (one low-res conv with up²·O output
    channels, MXU-friendly backward) must match the dilated-pad
    formulation bit-for-tolerance in forward AND both gradients."""
    import sys
    import jax
    cr = sys.modules["stylemc_tpu.ops.conv2d_resample"]
    x = jnp.array(_rand(2, 3, h, h))
    w = jnp.array(_rand(5, 3, kh, kh) * 0.3)
    f = setup_filter([1, 3, 3, 1])

    def run(impl):
        saved = cr.UP_CONV_IMPL
        cr.UP_CONV_IMPL = impl
        try:
            y, vjp = jax.vjp(lambda x_, w_: conv2d_resample(
                x_, w_, f=f, up=up, padding=pad, flip_weight=False), x, w)
            gx, gw = vjp(jnp.ones_like(y) * 0.7)
        finally:
            cr.UP_CONV_IMPL = saved
        return np.asarray(y), np.asarray(gx), np.asarray(gw)

    for a, b in zip(run("pad_dilate"), run("polyphase")):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ modulated_conv2d

@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_matches_fused_oracle(demodulate):
    x = _rand(3, 6, 8, 8)
    w = _rand(5, 6, 3, 3) * 0.3
    s = _rand(3, 6) * 0.5 + 1.0
    noise = _rand(3, 5, 8, 8) * 0.1
    got = np.array(modulated_conv2d(
        jnp.array(x), jnp.array(w), jnp.array(s), noise=jnp.array(noise),
        padding=1, demodulate=demodulate))
    want = modulated_conv2d_np(x, w, s, noise=noise, demodulate=demodulate, padding=1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_modulated_conv2d_upsample_shape():
    x = _rand(2, 8, 8, 8)
    w = _rand(4, 8, 3, 3)
    s = _rand(2, 8)
    f = setup_filter([1, 3, 3, 1])
    out = modulated_conv2d(jnp.array(x), jnp.array(w), jnp.array(s),
                           up=2, padding=1, resample_filter=f, flip_weight=False)
    assert out.shape == (2, 4, 16, 16)


def test_modulated_conv2d_demod_unit_norm():
    # With demodulation, unit-variance input/styles give ~unit-variance output.
    x = _rand(4, 64, 16, 16)
    w = _rand(64, 64, 3, 3)
    s = np.ones((4, 64), dtype=np.float32)
    out = np.array(modulated_conv2d(jnp.array(x), jnp.array(w), jnp.array(s), padding=1))
    assert 0.5 < out.std() < 2.0
