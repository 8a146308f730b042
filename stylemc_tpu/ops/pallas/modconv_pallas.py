"""Pallas TPU kernel: fused modulated 3x3 conv + demodulation + noise +
bias + lrelu + clamp (the StyleGAN2 synthesis layer body, up=1).

Why: .bench/block_breakdown.py measured the unfused XLA pipeline
(ops/modulated_conv.py + bias_act) spending as much time in the
modulation/epilogue elementwise passes as in the conv cores — the
style-scale of x, the dcoef scale of y, the noise/bias/act pass, and
their backwards are each full-resolution HBM round trips XLA cannot fuse
into its conv op. The reference's own answer (per-sample-weight grouped
conv, the fused_modconv path of torch_utils/ops) was measured 2-4x WORSE
on TPU (.bench/grouped_modconv_ab.py). This kernel removes the round
trips: styles and demodulation coefficients fold into the (small) weight
tensor in VMEM, and the epilogue applies in-register before the single
output write.

Layout (the part that makes it fast): tensors flow as [N, C, H·W] — a
FREE reshape of NCHW — so the spatial axis lives entirely in the lane
dimension. Row-tile windows are then lane-aligned HBM slices (W is a
multiple of 128), each 3x3 tap is ONE MXU contraction
[CO,CI] @ [CI,(TH+2)·W] over the whole window (N ≥ 1280 lanes — wide
enough to amortize weight loads), and the tap offset becomes a single
lane-roll plus a column-wrap mask. A first row-at-a-time formulation
(9·TH narrow dots per step) ran at ~17% MFU vs XLA's 36% conv; this
formulation exists because of that measurement.

Backward splits in two pallas_calls so XLA can DCE the weight gradient
when the generator is frozen (find_direction trains only styles):
  bwd_data:   dx (transpose conv, same 9-dot structure with pre-transposed
              taps), dstyles (direct Σ x·dxmod), ddcoefs, dbias, dnoise —
              one kernel, one pass over the tensors.
  bwd_weight: dW via lane-contracted [CO,THW] x [CI,THW] dots.

Matmul precision mirrors JAX's default policy (bfloat16 multiplies, fp32
accumulation) under mxu='default' — the same MXU passes the XLA fp32
path executes under jax_default_matmul_precision='default'
(docs/performance.md); mxu='highest' keeps fp32 operands (parity tests).

Behavioral contract: /root/reference/utils.py:13-53 (modulated_conv2d) +
torch_utils bias_act lrelu/clamp semantics, matching ops/modulated_conv.py
+ ops/bias_act.py (both torch-oracle-tested); parity pinned by
tests/test_modconv_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.2
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret():
    return jax.default_backend() != "tpu"


def _row_tile(h: int) -> int:
    for th in (16, 8, 4, 2):
        if h % th == 0:
            return th
    return 0


def _col_shifts(v, w_sp):
    """The three column-shifted copies of a flat window: out_dj[:, m] =
    v[:, m + dj - 1] with zeros where the 3x3 column halo crosses a row
    boundary. ONE unaligned lane-roll per non-center tap column — the
    row-offset part of a tap shift is tile-aligned and handled by a free
    static slice at the use site (di·W is a multiple of 128). A
    roll-per-tap formulation spent more VPU time shuffling lanes than the
    MXU spent on the taps' contractions."""
    span = v.shape[1]
    colmod = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) % w_sp
    left = jnp.where(colmod >= 1, pltpu.roll(v, 1, axis=1), 0)
    right = jnp.where(colmod <= w_sp - 2, pltpu.roll(v, span - 1, axis=1), 0)
    return (left, v, right)


# ------------------------------------------------------------------ fwd


def _fwd_kernel(th, w_sp, gain, clamp, out_dtype, mxu_dtype,
                xf_ref, w_ref, s_ref, d_ref, noise_ref, b_ref,
                out_ref, xwin, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    thw = th * w_sp
    span = (th + 2) * w_sp
    # lane-aligned fetch: rows [t·TH-1, t·TH+TH+1) of the row-padded plane
    # = flat lanes [t·TH·W, t·TH·W + (TH+2)·W) — offset and size are
    # multiples of 128 because W is
    cp = pltpu.make_async_copy(
        xf_ref.at[n, :, pl.ds(t * thw, span)], xwin, sem)
    cp.start()

    # fold styles and demod coefs into the taps: wm[k][co, ci]
    sv = s_ref[n, :]                               # [CI]
    dv = d_ref[n, :]                               # [CO]
    wm = (w_ref[:] * sv[None, None, :] * dv[None, :, None]).astype(mxu_dtype)
    co = wm.shape[1]

    cp.wait()
    # shift in the input dtype's 32-bit form (Mosaic rotate is 32-bit
    # only), cast each shifted copy for the MXU
    wins = tuple(v.astype(mxu_dtype)
                 for v in _col_shifts(xwin[:].astype(jnp.float32), w_sp))

    acc = jnp.zeros((co, thw), jnp.float32)
    for k in range(9):
        di, dj = k // 3, k % 3
        p = jax.lax.dot_general(
            wm[k], wins[dj], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [CO, (TH+2)·W]
        # row offset: tile-aligned static lane slice (di·W ≡ 0 mod 128)
        acc = acc + p[:, di * w_sp:di * w_sp + thw]

    z1 = acc + noise_ref[0] + b_ref[:]
    y = jnp.where(z1 >= 0, z1, z1 * LRELU_SLOPE) * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    out_ref[0] = y.astype(out_dtype)


def _fwd_call(xf, w_taps, styles, dcoefs, noise, bias2d, h, gain, clamp,
              mxu_dtype):
    n, ci, hw_p = xf.shape
    co = w_taps.shape[1]
    w_sp = noise.shape[1] // h
    th = _row_tile(h)
    kern = functools.partial(_fwd_kernel, th, w_sp, gain, clamp, xf.dtype,
                             mxu_dtype)
    noise = noise.reshape(h // th, 1, th * w_sp)
    out = pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # x flat
            pl.BlockSpec((9, co, ci), lambda n_, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),                # w taps
            pl.BlockSpec(memory_space=pltpu.VMEM),                # styles
            pl.BlockSpec(memory_space=pltpu.VMEM),                # dcoefs
            pl.BlockSpec((1, 1, th * w_sp), lambda n_, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),                # noise rows
            pl.BlockSpec((co, 1), lambda n_, t: (0, 0),
                         memory_space=pltpu.VMEM),                # bias
        ],
        out_specs=pl.BlockSpec((1, co, th * w_sp),
                               lambda n_, t: (n_, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, co, h * w_sp), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((ci, (th + 2) * w_sp), xf.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(xf, w_taps, styles, dcoefs, noise, bias2d)
    return out


# ------------------------------------------------------- bwd (data terms)


def _bwd_data_kernel(th, w_sp, gain, clamp, out_dtype, mxu_dtype,
                     dyf_ref, yf_ref, xf_ref, wt_ref, scol_ref, d_ref,
                     dcol_ref, noise_ref, b_ref,
                     dx_ref, ds_ref, dd_ref, db_ref, dns_ref,
                     dywin, ywin, xwin, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    thw = th * w_sp
    span = (th + 2) * w_sp
    cp0 = pltpu.make_async_copy(
        dyf_ref.at[n, :, pl.ds(t * thw, span)], dywin, sem.at[0])
    cp0.start()
    cp1 = pltpu.make_async_copy(
        yf_ref.at[n, :, pl.ds(t * thw, span)], ywin, sem.at[1])
    cp1.start()
    cpx = pltpu.make_async_copy(
        xf_ref.at[n, :, pl.ds(t * thw, thw)], xwin, sem.at[2])
    cpx.start()

    dv = d_ref[n, :]                               # [CO] lanes
    s_col = scol_ref[n]                            # [CI, 1]
    d_col = dcol_ref[n]                            # [CO, 1]
    # transpose taps pre-flipped outside: wt[k] = w[8-k]^T [CI, CO]
    wt = (wt_ref[:] * dv[None, None, :]).astype(mxu_dtype)
    ci = wt.shape[1]

    cp0.wait()
    cp1.wait()
    dy = dywin[:].astype(jnp.float32)              # [CO, (TH+2)·W]
    yv = ywin[:].astype(jnp.float32)
    g = jnp.where(yv >= 0, gain, gain * LRELU_SLOPE)
    if clamp is not None:
        g = jnp.where(jnp.abs(yv) >= clamp, 0.0, g)
    dzf = dy * g                                   # [CO, (TH+2)·W] f32
    dzs = tuple(v.astype(mxu_dtype) for v in _col_shifts(dzf, w_sp))

    # dx via the transpose conv: dxmod[m] = Σ_k wt[k]·dzp[m + off_k]
    acc = jnp.zeros((ci, thw), jnp.float32)
    for k in range(9):
        di, dj = k // 3, k % 3
        p = jax.lax.dot_general(
            wt[k], dzs[dj], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [CI, (TH+2)·W]
        acc = acc + p[:, di * w_sp:di * w_sp + thw]
    dxmod = acc
    dx_ref[0] = (dxmod * s_col).astype(out_dtype)

    cpx.wait()
    xint = xwin[:].astype(jnp.float32)             # [CI, TH·W]
    ds_acc = jnp.sum(dxmod * xint, axis=1, keepdims=True)

    # interior lanes of the window are [W, W + TH·W)
    dzi = pltpu.roll(dzf, span - w_sp, axis=1)[:, :thw]
    yi = pltpu.roll(yv, span - w_sp, axis=1)[:, :thw]
    a = yi / gain
    z1 = jnp.where(a >= 0, a, a / LRELU_SLOPE)
    noise_t = noise_ref[0]                         # [1, TH·W]
    db_acc = jnp.sum(dzi, axis=1, keepdims=True)
    t1 = jnp.sum(dzi * z1, axis=1, keepdims=True)
    t3 = jnp.sum(dzi * noise_t, axis=1, keepdims=True)
    # dd = Σ dz·c, c = (z1 - b - noise)/d reconstructed from y (exact
    # where dz != 0; clamped positions carry dz == 0 so never count)
    dd_acc = (t1 - b_ref[:] * db_acc - t3) / d_col
    dns_acc = jnp.sum(t3, axis=0, keepdims=True)

    @pl.when(t == 0)
    def _():
        ds_ref[0] = ds_acc
        dd_ref[0] = dd_acc
        db_ref[0] = db_acc
        dns_ref[0] = dns_acc

    @pl.when(t != 0)
    def _():
        ds_ref[0] = ds_ref[0] + ds_acc
        dd_ref[0] = dd_ref[0] + dd_acc
        db_ref[0] = db_ref[0] + db_acc
        dns_ref[0] = dns_ref[0] + dns_acc


def _bwd_data_call(dyf, yf, xf, wt_taps, styles, dcoefs, noise, bias2d,
                   h, gain, clamp, mxu_dtype):
    n, co, _ = dyf.shape
    ci = wt_taps.shape[1]
    w_sp = noise.shape[1] // h
    th = _row_tile(h)
    kern = functools.partial(_bwd_data_kernel, th, w_sp, gain, clamp,
                             xf.dtype, mxu_dtype)
    noise = noise.reshape(h // th, 1, th * w_sp)
    return pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # dy flat
            pl.BlockSpec(memory_space=pl.ANY),                    # y flat
            pl.BlockSpec(memory_space=pl.ANY),                    # x flat
            pl.BlockSpec((9, ci, co), lambda n_, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),                # wT taps
            pl.BlockSpec(memory_space=pltpu.VMEM),                # styles col
            pl.BlockSpec(memory_space=pltpu.VMEM),                # dcoefs
            pl.BlockSpec(memory_space=pltpu.VMEM),                # dcoefs col
            pl.BlockSpec((1, 1, th * w_sp), lambda n_, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),                # noise rows
            pl.BlockSpec((co, 1), lambda n_, t: (0, 0),
                         memory_space=pltpu.VMEM),                # bias
        ],
        out_specs=[
            pl.BlockSpec((1, ci, th * w_sp), lambda n_, t: (n_, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci, 1), lambda n_, t: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda n_, t: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, 1), lambda n_, t: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n_, t: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ci, h * w_sp), xf.dtype),    # dx
            jax.ShapeDtypeStruct((n, ci, 1), jnp.float32),        # ds
            jax.ShapeDtypeStruct((n, co, 1), jnp.float32),        # dd
            jax.ShapeDtypeStruct((n, co, 1), jnp.float32),        # db
            jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),         # dnoise·n
        ],
        scratch_shapes=[
            pltpu.VMEM((co, (th + 2) * w_sp), dyf.dtype),
            pltpu.VMEM((co, (th + 2) * w_sp), yf.dtype),
            pltpu.VMEM((ci, th * w_sp), xf.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(dyf, yf, xf, wt_taps, styles[:, :, None], dcoefs,
      dcoefs[:, :, None], noise, bias2d)


# ----------------------------------------------------------- bwd (weight)


def _bwd_weight_kernel(th, w_sp, gain, clamp, mxu_dtype,
                       dyf_ref, yf_ref, xf_ref, s_ref, dcol_ref,
                       dw_ref, dywin, ywin, xwin, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    thw = th * w_sp
    span = (th + 2) * w_sp
    cp0 = pltpu.make_async_copy(
        dyf_ref.at[n, :, pl.ds(t * thw + w_sp, thw)], dywin, sem.at[0])
    cp0.start()
    cp1 = pltpu.make_async_copy(
        yf_ref.at[n, :, pl.ds(t * thw + w_sp, thw)], ywin, sem.at[1])
    cp1.start()
    cpx = pltpu.make_async_copy(
        xf_ref.at[n, :, pl.ds(t * thw, span)], xwin, sem.at[2])
    cpx.start()

    sv = s_ref[n, :]
    d_col = dcol_ref[n]                            # [CO, 1]
    co = dw_ref.shape[1]
    ci = dw_ref.shape[2]

    cp0.wait()
    cp1.wait()
    dy = dywin[:].astype(jnp.float32)              # [CO, TH·W] interior
    yv = ywin[:].astype(jnp.float32)
    g = jnp.where(yv >= 0, gain, gain * LRELU_SLOPE)
    if clamp is not None:
        g = jnp.where(jnp.abs(yv) >= clamp, 0.0, g)
    dz = (dy * g).astype(mxu_dtype)                # [CO, TH·W]
    cpx.wait()
    xs_c = tuple(v.astype(mxu_dtype)
                 for v in _col_shifts(xwin[:].astype(jnp.float32), w_sp))

    # dW[k] = Σ_m dz[m]·x_window[m + off_k] — shift x, contract over lanes
    for k in range(9):
        di, dj = k // 3, k % 3
        xs = xs_c[dj][:, di * w_sp:di * w_sp + thw]
        contrib = jax.lax.dot_general(
            dz, xs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [CO, CI]
        contrib = contrib * d_col * sv[None, :]

        @pl.when(jnp.logical_and(n == 0, t == 0))
        def _():
            dw_ref[k] = contrib

        @pl.when(jnp.logical_not(jnp.logical_and(n == 0, t == 0)))
        def _():
            dw_ref[k] = dw_ref[k] + contrib


def _bwd_weight_call(dyf, yf, xf, styles, dcoefs, h, gain, clamp, ci,
                     mxu_dtype):
    n, co, _ = dyf.shape
    w_sp = xf.shape[2] // (h + 2)
    th = _row_tile(h)
    kern = functools.partial(_bwd_weight_kernel, th, w_sp, gain, clamp,
                             mxu_dtype)
    return pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # dy flat
            pl.BlockSpec(memory_space=pl.ANY),                    # y flat
            pl.BlockSpec(memory_space=pl.ANY),                    # x flat pad
            pl.BlockSpec(memory_space=pltpu.VMEM),                # styles
            pl.BlockSpec(memory_space=pltpu.VMEM),                # dcoefs col
        ],
        out_specs=pl.BlockSpec((9, co, ci), lambda n_, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, co, ci), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((co, th * w_sp), dyf.dtype),
            pltpu.VMEM((co, th * w_sp), yf.dtype),
            pltpu.VMEM((ci, (th + 2) * w_sp), xf.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(dyf, yf, xf, styles, dcoefs[:, :, None])


# ---------------------------------------------------------------- wrapper


def _dcoefs(w, styles):
    w2 = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(2, 3))  # [O, I]
    s2 = jnp.square(styles.astype(jnp.float32))
    return jax.lax.rsqrt(s2 @ w2.T + 1e-8), w2


def _prep(w):
    """w [CO,CI,3,3] → taps [9, CO, CI] and transposed-flipped
    [9, CI, CO] (tap k of the transpose conv is tap 8-k of the forward)."""
    taps = jnp.transpose(w, (2, 3, 0, 1)).reshape(9, w.shape[0], w.shape[1])
    tflip = jnp.flip(jnp.flip(w, 2), 3)
    wt = jnp.transpose(tflip, (2, 3, 1, 0)).reshape(
        9, w.shape[1], w.shape[0])
    return taps, wt


def _rowpad_flat(x, h, w_sp):
    """[N, C, H, W] → [N, C, (H+2)·W] with one zero row above and below
    (a reshape of the row-padded NCHW tensor — bitwise free in row-major).
    Flat window lanes [t·TH·W, (t·TH+TH+2)·W) then cover rows
    t·TH-1 .. t·TH+TH (the 3x3 row halo) at any aligned offset."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return xp.reshape(x.shape[0], x.shape[1], (h + 2) * w_sp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_layer(x, w, styles, noise, bias, h, gain, clamp, mxu):
    y, _ = _fused_layer_fwd(x, w, styles, noise, bias, h, gain, clamp, mxu)
    return y


def _fused_layer_fwd(x, w, styles, noise, bias, h, gain, clamp, mxu):
    n, ci, _, w_sp = x.shape
    mxu_dtype = jnp.bfloat16 if mxu == "default" else jnp.float32
    dcoefs, _ = _dcoefs(w, styles)
    taps, _ = _prep(w)
    xf = _rowpad_flat(x, h, w_sp)
    noise_f = noise.reshape(1, h * w_sp)
    yflat = _fwd_call(xf, taps, styles.astype(jnp.float32), dcoefs,
                      noise_f, bias.astype(jnp.float32).reshape(-1, 1),
                      h, gain, clamp, mxu_dtype)
    y = yflat.reshape(n, w.shape[0], h, w_sp)
    return y, (x, w, styles, noise, bias, y, dcoefs)


def _fused_layer_bwd(h, gain, clamp, mxu, res, dy):
    x, w, styles, noise, bias, y, dcoefs = res
    n, ci, _, w_sp = x.shape
    co = w.shape[0]
    mxu_dtype = jnp.bfloat16 if mxu == "default" else jnp.float32
    _, wt = _prep(w)
    dyf = _rowpad_flat(dy, h, w_sp)
    yf = _rowpad_flat(y, h, w_sp)
    xflat = x.reshape(n, ci, h * w_sp)
    s32 = styles.astype(jnp.float32)
    b2d = bias.astype(jnp.float32).reshape(-1, 1)
    noise_f = noise.reshape(1, h * w_sp)
    dxf, ds_dir, dd, db, dns = _bwd_data_call(
        dyf, yf, xflat, wt, s32, dcoefs, noise_f, b2d, h, gain, clamp,
        mxu_dtype)
    dx = dxf.reshape(n, ci, h, w_sp)

    # chain through the demod coefs: d = rsqrt(s² @ w2ᵀ + eps)
    # dσ² = dd · (-1/2)·d³ ; ds += 2s·(dσ² @ w2) ; dw2 = s²ᵀ @ dσ²
    w2 = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(2, 3))
    dsig = dd[:, :, 0] * (-0.5) * dcoefs ** 3                     # [N, CO]
    ds = ds_dir[:, :, 0] + 2.0 * s32 * (dsig @ w2)                # [N, CI]

    # weight grad (separate kernel → DCE'd when w is not differentiated)
    xfp = _rowpad_flat(x, h, w_sp)
    dw_taps = _bwd_weight_call(dyf, yf, xfp, s32, dcoefs, h, gain, clamp,
                               ci, mxu_dtype)
    dw = jnp.transpose(dw_taps.reshape(3, 3, co, ci), (2, 3, 0, 1))
    dw2 = (jnp.square(s32).T @ dsig).T                            # [CO, CI]
    dw = dw + 2.0 * w.astype(jnp.float32) * dw2[:, :, None, None]

    # The [H,W] noise input is NON-differentiable through this path (see
    # fused_modulated_layer docstring); only Σ dz·noise is accumulated
    # (the noise_strength chain) and the full cotangent is zeroed.
    del dns
    dbias = db[:, :, 0].sum(axis=0)
    return (dx, dw.astype(w.dtype), ds.astype(styles.dtype),
            jnp.zeros_like(noise), dbias.astype(bias.dtype))


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_modulated_layer(x, w, styles, noise, bias, gain=float(np.sqrt(2)),
                          clamp: Optional[float] = 256.0,
                          mxu: str = "default", force: bool = False,
                          noise_grad: bool = False):
    """Fused modulated-conv synthesis layer (up=1, 3x3, pad 1, demodulate,
    lrelu) — Pallas on TPU, None when the shape/config is not supported
    (caller falls back to the unfused path).

    x [N,CI,H,W]; w [CO,CI,3,3]; styles [N,CI]; noise [H,W] (already
    scaled by noise_strength); bias [CO].

    NOTE the noise input is non-differentiable through this path (its
    cotangent is zeroed): the only trainable consumer in the framework is
    noise_strength, whose gradient callers needing it must take via the
    unfused path. find_direction/coach train styles/encoder/decoder
    weights — noise_strength stays frozen — so this is exact for every
    shipped training loop. A caller that DOES differentiate noise (or
    noise_strength through a scaled-noise input) must pass
    noise_grad=True, which declines the fused path (returns None) instead
    of silently returning a zero cotangent.
    """
    if noise_grad:
        return None  # fused bwd zeroes d(noise) — caller needs the real one
    n, ci, h, w_sp = x.shape
    co = w.shape[0]
    ok = (
        w.shape[2:] == (3, 3) and noise is not None
        and noise.ndim in (2, 4)
        and _row_tile(h) != 0 and w_sp % 128 == 0 and h >= 8
        # VMEM: weight-tap tensors + flat windows must fit comfortably
        and (ci * co * 9 * 8
             + (2 * co + 2 * ci) * (_row_tile(h) + 2) * w_sp * 4) < 64e6
        and (force or jax.default_backend() == "tpu")
    )
    if not ok:
        return None
    if noise.ndim == 4:
        if noise.shape[0] != 1 or noise.shape[1] != 1:
            return None
        noise = noise[0, 0]
    noise = jnp.broadcast_to(noise.astype(jnp.float32), (h, w_sp))
    return _fused_layer(x, w, styles, noise, bias, h, float(gain),
                        None if clamp is None else float(clamp), mxu)
