"""Pad → zero-upsample → FIR filter → downsample for batched 2D images.

TPU-native replacement for the reference CUDA op (behavioral contract:
/root/reference/torch_utils/ops/upfirdn2d.py:120-208 and the fused kernels in
upfirdn2d.cu). Instead of translating the CUDA tiling, the op is expressed as
a single `lax.pad` (interior dilation = zero-upsampling, negative edge padding
= cropping — one XLA HLO covers steps 1+2) followed by valid-mode
`lax.conv_general_dilated` with the window stride carrying the downsample.
Separable filters run as two rank-1 convs. Gradients of arbitrary order fall
out of XLA autodiff, replacing the hand-written transposed re-invocation of
the reference (upfirdn2d.py:246-264).

All public entry points mirror the reference API: `setup_filter`, `upfirdn2d`,
`filter2d`, `upsample2d`, `downsample2d` (upfirdn2d.py:72,120,272,308,347).
Layout is NCHW at the API boundary to keep npz/image interop bit-identical.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_IntOrPair = Union[int, Sequence[int]]


def _parse_scaling(scaling: _IntOrPair):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert isinstance(sx, int) and isinstance(sy, int)
    assert sx >= 1 and sy >= 1
    return sx, sy


def _parse_padding(padding: _IntOrPair):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    assert all(isinstance(p, int) for p in padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _get_filter_size(f) -> tuple:
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a 2D FIR filter for `upfirdn2d` (contract: reference
    upfirdn2d.py:72-116).

    Returns a float32 jnp array of shape [fh, fw] (non-separable) or
    [taps] (separable).
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[jnp.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def setup_filter_np(f, normalize=True, flip_filter=False, gain=1,
                    separable=None) -> np.ndarray:
    """setup_filter computed in numpy — stays concrete inside jit traces
    (needed by the Pallas dispatch, whose tap extraction is static)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]
    f = f * (gain ** (f.ndim / 2))
    return f.astype(np.float32)


def _pad_dilate(x, up, padding):
    """Zero-upsample by `up` and pad/crop, as one lax.pad.

    Matches the reference order exactly: zero-insert (up-1 zeros after every
    pixel, including the last) then edge pad/crop (upfirdn2d.py:183-190).
    lax.pad interior dilation only inserts zeros *between* elements, so the
    up-1 trailing zeros are folded into the high edge padding.
    """
    upx, upy = up
    px0, px1, py0, py1 = padding
    if upx == 1 and upy == 1 and px0 == 0 and px1 == 0 and py0 == 0 and py1 == 0:
        return x
    cfg = [
        (0, 0, 0),
        (0, 0, 0),
        (py0, py1 + upy - 1, upy - 1),
        (px0, px1 + upx - 1, upx - 1),
    ]
    return lax.pad(x, jnp.zeros((), x.dtype), cfg)


def _fir(x, f, down, flip_filter, gain):
    """Valid-mode FIR filtering with stride `down` on an NCHW tensor.

    Channels are folded into the batch so the conv is single-channel: the op
    is bandwidth-bound and this keeps XLA from materializing grouped-conv
    rewrites. Separable filters run as two rank-1 convs (gain applied per
    pass as gain**(ndim/2), matching reference upfirdn2d.py:193).
    """
    downx, downy = down
    n, c, h, w = x.shape
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = f * (gain ** (f.ndim / 2))
    f = f.astype(x.dtype)
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    xr = x.reshape(n * c, 1, h, w)
    dn = ("NCHW", "OIHW", "NCHW")
    if f.ndim == 1:
        taps = f.shape[0]
        ky = f.reshape(1, 1, taps, 1)
        kx = f.reshape(1, 1, 1, taps)
        xr = lax.conv_general_dilated(
            xr, ky, window_strides=(downy, 1), padding="VALID", dimension_numbers=dn
        )
        xr = lax.conv_general_dilated(
            xr, kx, window_strides=(1, downx), padding="VALID", dimension_numbers=dn
        )
    else:
        k = f.reshape(1, 1, *f.shape)
        xr = lax.conv_general_dilated(
            xr, k, window_strides=(downy, downx), padding="VALID", dimension_numbers=dn
        )
    return xr.reshape(n, c, xr.shape[2], xr.shape[3])


def upfirdn2d(x, f, up: _IntOrPair = 1, down: _IntOrPair = 1,
              padding: _IntOrPair = 0, flip_filter=False, gain=1):
    """Pad, upsample, FIR-filter, and downsample a batch of NCHW images.

    Semantics identical to the reference op (upfirdn2d.py:120-158):
      1. zero-upsample by `up`
      2. pad (negative = crop) w.r.t. the upsampled image
      3. convolve with `f` (flip_filter=False → convolution, True → correlation)
      4. keep every `down`-th pixel

    Output shape: [(H*upy + pady0 + pady1 - fh)//downy + 1, ...same for W].
    """
    assert x.ndim == 4, f"expected NCHW, got shape {x.shape}"
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    x = _pad_dilate(x, (upx, upy), (px0, px1, py0, py1))
    x = _fir(x, f, (downx, downy), flip_filter, gain)
    return x


def filter2d(x, f, padding: _IntOrPair = 0, flip_filter=False, gain=1):
    """Filter with an FIR filter, keeping resolution (reference upfirdn2d.py:272)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up: _IntOrPair = 2, padding: _IntOrPair = 0,
               flip_filter=False, gain=1):
    """Upsample by `up` with FIR smoothing (reference upfirdn2d.py:308)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down: _IntOrPair = 2, padding: _IntOrPair = 0,
                 flip_filter=False, gain=1):
    """Downsample by `down` with FIR anti-aliasing (reference upfirdn2d.py:347)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
