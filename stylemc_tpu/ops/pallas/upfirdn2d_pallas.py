"""Pallas TPU kernels for the hot upfirdn2d cases.

Replaces the reference's template-specialized CUDA "small" kernels
(/root/reference/torch_utils/ops/upfirdn2d.cu:97+) for the configurations the
generator actually hits: 2× upsampling (and 2× downsampling) with the 4-tap
binomial filter, separable.

Design: one grid step processes one [H, W] image plane (channels folded into
the batch grid axis) held in VMEM; the polyphase decomposition turns the
zero-stuffed convolution into four shifted VPU multiply-adds per axis:

  out_even[m] = g0·x[m-1] + g2·x[m]
  out_odd[m]  = g1·x[m]   + g3·x[m+1]

(for the canonical padding (2,1) of `upsample2d`), interleaved by a sublane
reshape. No zero-stuffed intermediate is ever materialized.

The public wrappers fall back to the XLA formulation for shapes/filters the
kernel doesn't cover; gradients come from a custom VJP that re-invokes the
transposed resampler (the same trick as the reference's autograd wrapper,
upfirdn2d.py:246-264).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..upfirdn2d import upsample2d as upsample2d_xla
from ..upfirdn2d import downsample2d as downsample2d_xla

# VMEM budget: in-plane + out-plane (4x) in fp32 must fit comfortably.
_MAX_PLANE = 512 * 512


def _shift_down(x, axis):
    """y[m] = x[m-1] with zero boundary."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def _shift_up(x, axis):
    """y[m] = x[m+1] with zero boundary."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (0, 1)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(1, x.shape[axis] + 1)
    return jnp.pad(x, pad)[tuple(sl)]


def _interleave_rows(even, odd):
    """[H, W] pair → [2H, W] row-interleaved (sublane reshape — the only
    interleave Mosaic lowers; the lane axis goes through a transpose)."""
    h, w = even.shape
    return jnp.stack([even, odd], axis=1).reshape(2 * h, w)


def _up1d_rows(x, g):
    g0, g1, g2, g3 = g
    even = g0 * _shift_down(x, 0) + g2 * x
    odd = g1 * x + g3 * _shift_up(x, 0)
    return _interleave_rows(even, odd)


def _upsample2x_plane(x, g: Tuple[float, float, float, float]):
    """[H, W] → [2H, 2W] polyphase up-filter (both axes)."""
    v = _up1d_rows(x, g)            # vertical
    return _up1d_rows(v.T, g).T     # horizontal via transpose


def _make_up_kernel(g):
    def kernel(x_ref, o_ref):
        o_ref[0] = _upsample2x_plane(x_ref[0], g)

    return kernel


def _canonical_taps(f, gain: float, flip_filter: bool):
    """Effective 1D correlation taps the way upfirdn2d applies them."""
    f = np.asarray(f, np.float64)
    if f.ndim == 2:
        # separable check
        u, s, vt = np.linalg.svd(f)
        if s[1] > 1e-6 * s[0] or f.shape != (4, 4):
            return None
        col = u[:, 0] * np.sqrt(s[0])
        row = vt[0] * np.sqrt(s[0])
        if not np.allclose(np.outer(col, row), f, atol=1e-8):
            return None
        if not np.allclose(col, row, atol=1e-8):
            col = np.abs(col)
            row = np.abs(row)
            if not np.allclose(np.outer(col, row), f, atol=1e-7):
                return None
        f1 = col
    else:
        if f.shape[0] != 4:
            return None
        f1 = f
    taps = f1 * np.sqrt(gain)
    if not flip_filter:
        taps = taps[::-1]
    return tuple(float(t) for t in taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample2x_core(x, taps):
    n, c, h, w = x.shape
    planes = x.reshape(n * c, h, w)
    out = pl.pallas_call(
        _make_up_kernel(taps),
        grid=(n * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, 2 * h, 2 * w), x.dtype),
    )(planes)
    return out.reshape(n, c, 2 * h, 2 * w)


def _upsample2x_fwd(x, taps):
    return _upsample2x_core(x, taps), (x.shape,)


def _upsample2x_bwd(taps, res, g):
    """Transpose of zero-stuff+filter = filter (flipped taps) + stride-2
    subsample — the reference's transposed re-invocation trick."""
    (x_shape,) = res
    f = jnp.asarray(np.outer(taps, taps), jnp.float32)
    # forward out[j] = Σ_k g[k] x[(j+k-2)/2]; transpose: dx[i] = Σ over j,k
    # with (j+k-2)=2i → dx[i] = Σ_k g[k] dy[2i+2-k]: correlation of dy with
    # reversed taps at stride 2, offset 2-k... expressed via the XLA
    # upfirdn2d with down=2 and mirrored padding:
    from ..upfirdn2d import upfirdn2d
    dx = upfirdn2d(g, f, down=2, padding=(1, 2, 1, 2), flip_filter=True,
                   gain=1.0)
    return (dx.astype(g.dtype),)


_upsample2x_core.defvjp(_upsample2x_fwd, _upsample2x_bwd)


def upsample2d_pallas(x, f, up: int = 2, padding=0, flip_filter: bool = False,
                      gain: float = 1.0):
    """Drop-in for ops.upsample2d on the hot configuration; XLA fallback
    otherwise."""
    n, c, h, w = x.shape
    usable = (
        up == 2 and padding == 0 and h * w <= _MAX_PLANE
        and h % 8 == 0 and w % 128 == 0
        and jax.default_backend() == "tpu"
    )
    taps = _canonical_taps(np.asarray(f), gain * up * up, flip_filter) \
        if usable else None
    if taps is None:
        return upsample2d_xla(x, f, up=up, padding=padding,
                              flip_filter=flip_filter, gain=gain)
    return _upsample2x_core(x, taps)


# ------------------------------------------------------------- downsample 2x


def _downsample2x_plane(x, g):
    """[2H, 2W] → [H, W]: out[m] = Σ_k g[k]·x[2m + k - 1] per axis
    (canonical downsample2d padding (1,1))."""
    def down_rows(t):
        g0, g1, g2, g3 = g
        te = t[0::2]                       # t[2m]
        to = t[1::2]                       # t[2m+1]
        te_prev = _shift_down(to, 0)       # t[2m-1]
        to_next = _shift_up(te, 0)         # t[2m+2]
        return g0 * te_prev + g1 * te + g2 * to + g3 * to_next

    v = down_rows(x)
    return down_rows(v.T).T


def _make_down_kernel(g):
    def kernel(x_ref, o_ref):
        o_ref[0] = _downsample2x_plane(x_ref[0], g)

    return kernel


def downsample2d_pallas(x, f, down: int = 2, padding=0,
                        flip_filter: bool = False, gain: float = 1.0):
    n, c, h, w = x.shape
    usable = (
        down == 2 and padding == 0 and h * w <= 4 * _MAX_PLANE
        and h % 16 == 0 and w % 256 == 0
        and jax.default_backend() == "tpu"
    )
    taps = _canonical_taps(np.asarray(f), gain, flip_filter) if usable else None
    if taps is None:
        return downsample2d_xla(x, f, down=down, padding=padding,
                                flip_filter=flip_filter, gain=gain)
    planes = x.reshape(n * c, h, w)
    out = pl.pallas_call(
        _make_down_kernel(taps),
        grid=(n * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, h // 2, w // 2), x.dtype),
    )(planes)
    return out.reshape(n, c, h // 2, w // 2)
