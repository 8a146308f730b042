"""Differentiable image-resizing utilities shared by the loss stack."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] matrix reproducing torch AdaptiveAvgPool semantics:
    output[i] = mean(input[floor(i*in/out) : ceil((i+1)*in/out)])."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool2d(x, out_h: int, out_w: int):
    """x: [..., H, W] → [..., out_h, out_w], torch AdaptiveAvgPool2d parity,
    expressed as two dense matmuls (differentiable, MXU-friendly)."""
    h, w = x.shape[-2], x.shape[-1]
    if h == out_h and w == out_w:
        return x
    ky = jnp.asarray(adaptive_avg_pool_matrix(h, out_h))
    kx = jnp.asarray(adaptive_avg_pool_matrix(w, out_w))
    x = jnp.einsum("oh,...hw->...ow", ky.astype(x.dtype), x)
    x = jnp.einsum("ow,...hw->...ho", kx.astype(x.dtype), x)
    return x


def denorm_img(img):
    """[-1,1] CHW float → [0,255] HWC float (reference find_direction.py:44-46)."""
    img = jnp.transpose(img, (1, 2, 0)) * 127.5 + 128.0
    return jnp.clip(img, 0, 255)
