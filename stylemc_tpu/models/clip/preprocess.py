"""Differentiable CLIP image preprocessing.

Behavioral contract: the reference's `unprocess` pipeline
(/root/reference/find_direction.py:49-52 with transf at :258 and
get_mean_std at utils.py:90-97): generator output in [-1, 1] →
(x*127.5+128).clamp(0,255) → Resize(224, bicubic) + CenterCrop(224) →
/255 → normalize(CLIP mean/std).

TPU-first: the bicubic resize is expressed as two dense matmuls
(out = Ky @ img @ Kxᵀ) — fully differentiable, static-shape, rides the MXU.
The default kernel matches torch.nn.functional.interpolate(bicubic,
antialias=False) which is what torchvision's tensor Resize used by the
reference performs; antialias=True selects the area-weighted kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .model import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def _cubic_kernel(x, a=-0.75):
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a, 0.0))


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, antialias: bool = False) -> np.ndarray:
    """Dense [out_size, in_size] bicubic interpolation matrix (edge-clamped),
    matching torch interpolate(align_corners=False)."""
    scale = in_size / out_size
    support = 2.0 * (max(scale, 1.0) if antialias else 1.0)
    filt_scale = max(scale, 1.0) if antialias else 1.0
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support)) + 1
        hi = int(np.floor(center + support)) + 1
        idx = np.arange(lo, hi)
        w = _cubic_kernel((idx - center) / filt_scale)
        w = w / w.sum()
        idx = np.clip(idx, 0, in_size - 1)
        for j, wi in zip(idx, w):
            mat[i, j] += wi
    return mat.astype(np.float32)


def resize_bicubic(x, out_h: int, out_w: int, antialias: bool = False):
    """x: [..., H, W] → [..., out_h, out_w] via two dense matmuls."""
    h, w = x.shape[-2], x.shape[-1]
    ky = jnp.asarray(_resize_matrix(h, out_h, antialias))
    kx = jnp.asarray(_resize_matrix(w, out_w, antialias))
    x = jnp.einsum("oh,...hw->...ow", ky.astype(x.dtype), x)
    x = jnp.einsum("ow,...hw->...ho", kx.astype(x.dtype), x)
    return x


def resize_short_side(x, size: int, antialias: bool = False):
    """torchvision Resize(size) semantics: scale so the short side == size."""
    h, w = x.shape[-2], x.shape[-1]
    if h <= w:
        out_h, out_w = size, max(1, int(round(w * size / h)))
    else:
        out_h, out_w = max(1, int(round(h * size / w))), size
    return resize_bicubic(x, out_h, out_w, antialias)


def center_crop(x, size: int):
    h, w = x.shape[-2], x.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size]


def clip_mean_std(dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype).reshape(3, 1, 1)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype).reshape(3, 1, 1)
    return mean, std


def unprocess(img, img_size: int = 224, antialias: bool = False):
    """Generator output [N,3,H,W] in [-1,1] → CLIP input [N,3,224,224].

    Exact reference arithmetic (find_direction.py:49-52): *127.5+128,
    clamp(0,255), resize+crop, /255, normalize. Differentiable.
    """
    x = jnp.clip(img * 127.5 + 128.0, 0.0, 255.0)
    x = resize_short_side(x, img_size, antialias=antialias)
    x = center_crop(x, img_size)
    mean, std = clip_mean_std(x.dtype)
    return (x / 255.0 - mean) / std
