"""Pallas kernel parity vs the XLA formulations (interpreter mode on CPU;
the same kernels compile through Mosaic on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from stylemc_tpu.ops import setup_filter, upsample2d, downsample2d
from stylemc_tpu.ops.pallas.upfirdn2d_pallas import (
    upsample2d_pallas, downsample2d_pallas, _canonical_taps,
)


@pytest.fixture(scope="module")
def data():
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 128)
                    .astype(np.float32))
    return x, f


def test_canonical_taps_separable():
    f = setup_filter([1, 3, 3, 1])  # dense 4x4 outer product
    taps = _canonical_taps(np.asarray(f), gain=4.0, flip_filter=False)
    assert taps is not None
    np.testing.assert_allclose(abs(sum(taps)), 2.0, rtol=1e-5)  # |DC gain| = sqrt(4)


def test_canonical_taps_rejects_nonseparable():
    f = np.eye(4, dtype=np.float32)
    assert _canonical_taps(f, 1.0, False) is None


def test_upsample_pallas_matches_xla(data):
    x, f = data
    want = np.asarray(upsample2d(x, f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(upsample2d_pallas(x, f, force=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsample_pallas_matches_xla():
    f = setup_filter([1, 3, 3, 1])
    y = jnp.asarray(np.random.RandomState(1).randn(1, 2, 32, 256)
                    .astype(np.float32))
    want = np.asarray(downsample2d(y, f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(downsample2d_pallas(y, f, force=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample_pallas_gradient(data):
    x, f = data

    def loss_p(z):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(upsample2d_pallas(z, f, force=True) ** 2)

    def loss_x(z):
        return jnp.sum(upsample2d(z, f) ** 2)

    gp = np.asarray(jax.grad(loss_p)(x))
    gx = np.asarray(jax.grad(loss_x)(x))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)


def test_fallback_for_unsupported_shapes():
    f = setup_filter([1, 3, 3, 1])
    # odd width → falls back to XLA path, still correct
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 10, 36)
                    .astype(np.float32))
    want = np.asarray(upsample2d(x, f))
    got = np.asarray(upsample2d_pallas(x, f))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsample_pallas_gradient():
    f = setup_filter([1, 3, 3, 1])
    y = jnp.asarray(np.random.RandomState(3).randn(1, 2, 32, 256)
                    .astype(np.float32))

    def loss_p(z):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(downsample2d_pallas(z, f, force=True) ** 2)

    def loss_x(z):
        return jnp.sum(downsample2d(z, f) ** 2)

    gp = np.asarray(jax.grad(loss_p)(y))
    gx = np.asarray(jax.grad(loss_x)(y))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)


def test_pallas_second_order_gradients():
    # the up/down kernels are each other's VJP, so 2nd-order grads chain
    # up → down → up; compare against pure XLA
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(np.random.RandomState(4).randn(1, 1, 8, 128)
                    .astype(np.float32))
    v = jnp.ones_like(x)

    def loss_p(z):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(upsample2d_pallas(z, f, force=True) ** 3)

    def loss_x(z):
        return jnp.sum(upsample2d(z, f) ** 3)

    hvp_p = jax.grad(lambda z: jnp.vdot(jax.grad(loss_p)(z), v))(x)
    hvp_x = jax.grad(lambda z: jnp.vdot(jax.grad(loss_x)(z), v))(x)
    np.testing.assert_allclose(np.asarray(hvp_p), np.asarray(hvp_x),
                               rtol=1e-4, atol=1e-4)


def test_upsample_pallas_multitile_grid():
    # h > _ROW_TILE exercises the row-tiled grid (the untiled kernel OOM'd
    # scoped VMEM at 512²→1024² on real TPU); h=256 → two row tiles
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(np.random.RandomState(5).randn(1, 1, 256, 128)
                    .astype(np.float32))
    want = np.asarray(upsample2d(x, f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(upsample2d_pallas(x, f, force=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsample_pallas_multitile_grid():
    f = setup_filter([1, 3, 3, 1])
    y = jnp.asarray(np.random.RandomState(6).randn(1, 1, 512, 256)
                    .astype(np.float32))
    want = np.asarray(downsample2d(y, f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(downsample2d_pallas(y, f, force=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample_pallas_multitile_gradient():
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(np.random.RandomState(7).randn(1, 1, 256, 128)
                    .astype(np.float32))

    def loss_p(z):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(upsample2d_pallas(z, f, force=True) ** 2)

    def loss_x(z):
        return jnp.sum(upsample2d(z, f) ** 2)

    gp = np.asarray(jax.grad(loss_p)(x))
    gx = np.asarray(jax.grad(loss_x)(x))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)


def test_pallas_rejects_non_tile_multiple_heights():
    # h=136 passes h % 8 == 0 but is not a _ROW_TILE multiple: the row-tiled
    # grid would floor-divide and silently drop output rows 256..271. The
    # wrappers must fall back to XLA (and so still be exact).
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(np.random.RandomState(8).randn(1, 1, 136, 128)
                    .astype(np.float32))
    want = np.asarray(upsample2d(x, f))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(upsample2d_pallas(x, f, force=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    y = jnp.asarray(np.random.RandomState(9).randn(1, 1, 272, 256)
                    .astype(np.float32))
    want_d = np.asarray(downsample2d(y, f))
    with pltpu.force_tpu_interpret_mode():
        got_d = np.asarray(downsample2d_pallas(y, f, force=True))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)
