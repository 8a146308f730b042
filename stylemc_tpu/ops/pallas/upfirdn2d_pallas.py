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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..upfirdn2d import upsample2d as upsample2d_xla
from ..upfirdn2d import downsample2d as downsample2d_xla

# Largest input plane the up-kernel accepts (the 1024-res generator's biggest
# upsample is 512² → 1024²). The kernels tile over output rows — the full
# padded input plane is the resident VMEM block; per-step scratch is a
# _ROW_TILE-row window — so VMEM use is plane + O(row tile), not O(out plane)
# (an untiled 512²→1024² kernel needed 18.4 MB scoped VMEM > the 16 MB limit).
_MAX_PLANE = 512 * 512
_ROW_TILE = 128


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


def _make_up_kernel(g, hb: int):
    """Row-tiled 2× polyphase upsample: grid step (i, j) writes output rows
    [2·j·hb, 2·(j+1)·hb) of plane i from the 1-row-padded input plane
    (resident across the inner grid axis; only a (hb+2)-row window is read
    per step, so scratch stays O(hb·W) for any plane size)."""
    g0, g1, g2, g3 = g

    def kernel(x_ref, o_ref):
        j = pl.program_id(1)
        # rows x[j·hb - 1 .. j·hb + hb] via the padded plane (zero boundary)
        win = x_ref[0, pl.ds(j * hb, hb + 2), :]
        even = g0 * win[0:hb] + g2 * win[1:hb + 1]
        odd = g1 * win[1:hb + 1] + g3 * win[2:hb + 2]
        v = _interleave_rows(even, odd)       # vertical pass  [2hb, W]
        o_ref[0] = _up1d_rows(v.T, g).T       # horizontal via transpose

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


def _interpret():
    # interpreter on non-TPU backends so CPU tests exercise the REAL kernel
    # body (incl. through custom-VJP backward traces, where a context-manager
    # interpret flag would already be out of scope)
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample2x_core(x, taps):
    n, c, h, w = x.shape
    hb = min(h, _ROW_TILE)
    planes = x.reshape(n * c, h, w)
    padded = jnp.pad(planes, ((0, 0), (1, 1), (0, 0)))
    out = pl.pallas_call(
        _make_up_kernel(taps, hb),
        grid=(n * c, h // hb),
        in_specs=[pl.BlockSpec((1, h + 2, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * hb, 2 * w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, 2 * h, 2 * w), x.dtype),
        interpret=_interpret(),
    )(padded)
    return out.reshape(n, c, 2 * h, 2 * w)


def _upsample2x_fwd(x, taps):
    return _upsample2x_core(x, taps), ()


def _upsample2x_bwd(taps, res, g):
    """Transpose of zero-stuff+filter = filter (reversed taps) + stride-2
    subsample — the reference's transposed re-invocation trick
    (upfirdn2d.py:246-264). Derivation: out[j] = Σ_k t[k]·x[(j+k-2)/2], so
    dx[i] = Σ_k t[k]·dy[2i+2-k] = Σ_k t[3-k]·dy[2i+k-1] — exactly the
    polyphase downsample kernel with reversed taps."""
    del res
    return (_downsample2x_core(g, taps[::-1]).astype(g.dtype),)


_upsample2x_core.defvjp(_upsample2x_fwd, _upsample2x_bwd)


def upsample2d_pallas(x, f, up: int = 2, padding=0, flip_filter: bool = False,
                      gain: float = 1.0, force: bool = False):
    """Drop-in for ops.upsample2d on the hot configuration; XLA fallback
    otherwise. `force=True` takes the Pallas path regardless of backend —
    for interpret-mode tests on CPU (without it the backend gate silently
    reduces those tests to XLA-vs-XLA)."""
    n, c, h, w = x.shape
    usable = (
        up == 2 and padding == 0 and h * w <= _MAX_PLANE
        and h % 8 == 0 and w % 128 == 0
        # row tiling must cover h exactly (grid = h // hb); this condition
        # also covers the backward pass, whose down-kernel re-invocation on
        # the [2h, 2w] cotangent tiles h output rows with the same hb
        and (h <= _ROW_TILE or h % _ROW_TILE == 0)
        and (force or jax.default_backend() == "tpu")
    )
    taps = _canonical_taps(np.asarray(f), gain * up * up, flip_filter) \
        if usable else None
    if taps is None:
        return upsample2d_xla(x, f, up=up, padding=padding,
                              flip_filter=flip_filter, gain=gain)
    return _upsample2x_core(x, taps)


# ------------------------------------------------------------- downsample 2x


def _down_rows(t, g):
    """1-D stride-2 4-tap correlation along axis 0 with zero boundary:
    out[m] = Σ_k g[k]·t[2m + k - 1] (canonical downsample2d padding (1,1)).

    The even/odd phases come from a sublane reshape (the inverse of
    _interleave_rows) — a strided slice t[0::2] would lower to a gather,
    which Mosaic rejects on TPU."""
    g0, g1, g2, g3 = g
    h2 = t.shape[0] // 2
    tt = t.reshape(h2, 2, t.shape[1])
    te = tt[:, 0]                      # t[2m]
    to = tt[:, 1]                      # t[2m+1]
    te_prev = _shift_down(to, 0)       # t[2m-1]
    to_next = _shift_up(te, 0)         # t[2m+2]
    return g0 * te_prev + g1 * te + g2 * to + g3 * to_next


def _make_down_kernel(g, hb: int):
    """Row-tiled 2× polyphase downsample: grid step (i, j) writes output
    rows [j·hb, (j+1)·hb) from a (2hb+2)-row window of the 1-row-padded
    input plane: out[m'] = Σ_k g[k]·win[2m' + k] (win[r] = x[2·j·hb+r-1])."""
    g0, g1, g2, g3 = g

    def kernel(x_ref, o_ref):
        j = pl.program_id(1)
        win = x_ref[0, pl.ds(2 * j * hb, 2 * hb + 2), :]
        a = win[0:2 * hb].reshape(hb, 2, win.shape[1])
        b = win[2:2 * hb + 2].reshape(hb, 2, win.shape[1])
        v = g0 * a[:, 0] + g1 * a[:, 1] + g2 * b[:, 0] + g3 * b[:, 1]
        o_ref[0] = _down_rows(v.T, g).T   # horizontal pass via transpose

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _downsample2x_core(x, taps):
    n, c, h, w = x.shape
    hb = min(h // 2, _ROW_TILE)
    planes = x.reshape(n * c, h, w)
    padded = jnp.pad(planes, ((0, 0), (1, 1), (0, 0)))
    out = pl.pallas_call(
        _make_down_kernel(taps, hb),
        grid=(n * c, (h // 2) // hb),
        in_specs=[pl.BlockSpec((1, h + 2, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb, w // 2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, h // 2, w // 2), x.dtype),
        interpret=_interpret(),
    )(padded)
    return out.reshape(n, c, h // 2, w // 2)


def _downsample2x_fwd(x, taps):
    return _downsample2x_core(x, taps), ()


def _downsample2x_bwd(taps, res, g):
    """Transpose of the stride-2 correlation y[m] = Σ_k t[k]·x[2m+k-1] is
    dx[i] = Σ_k t[k]·dy[(i+1-k)/2] = the polyphase UPSAMPLE with reversed
    taps — the two Pallas kernels are each other's transpose."""
    del res
    return (_upsample2x_core(g, taps[::-1]).astype(g.dtype),)


_downsample2x_core.defvjp(_downsample2x_fwd, _downsample2x_bwd)


def downsample2d_pallas(x, f, down: int = 2, padding=0,
                        flip_filter: bool = False, gain: float = 1.0,
                        force: bool = False):
    """Drop-in for ops.downsample2d on the hot configuration; XLA fallback
    otherwise. Differentiable: custom VJP re-invokes the upsample kernel."""
    n, c, h, w = x.shape
    usable = (
        down == 2 and padding == 0 and h * w <= 4 * _MAX_PLANE
        and h % 16 == 0 and w % 256 == 0
        # row tiling must cover h//2 output rows exactly (grid floor-divides
        # by hb); also covers the backward up-kernel re-invocation on the
        # [h//2, w//2] cotangent, which tiles with the same hb
        and (h // 2 <= _ROW_TILE or (h // 2) % _ROW_TILE == 0)
        and (force or jax.default_backend() == "tpu")
    )
    taps = _canonical_taps(np.asarray(f), gain, flip_filter) if usable else None
    if taps is None:
        return downsample2d_xla(x, f, down=down, padding=padding,
                                flip_filter=flip_filter, gain=gain)
    return _downsample2x_core(x, taps)
