"""Style-modulated convolution (StyleGAN2).

Behavioral contract: the `modulated_conv2d` embedded in NVIDIA's pickle
networks (layout documented by /root/reference/legacy.py:172-203 and used via
/root/reference/utils.py:13-53): modulate conv weights per-sample by a style
vector, optionally demodulate so each output feature has unit expected norm,
convolve with optional up/downsampling, add noise.

TPU-first design — the reference's `fused_modconv=True` path builds a
[N*out, in, kh, kw] per-sample weight and runs a grouped conv, which maps
terribly onto the MXU (batch-many tiny groups). Here we always use the
mathematically identical unfused decomposition:

    y[b] = dcoef[b] ⊙ conv(x[b] ⊙ s[b], W) (+ noise)

with the demodulation coefficients computed as one small matmul:

    dcoef[b,o] = rsqrt( Σ_{i,k} (W[o,i,k] s[b,i])² + 1e-8 )
               = rsqrt( (s²ᵀ · Σ_k W²)[b,o] + 1e-8 )

which rides the MXU instead of materializing per-sample weights. In exact
arithmetic this equals the fused path; in fp32 the differences are at the
level of summation order.

For low precision (bf16 on TPU, standing in for the reference's fp16 path),
the same magnitude pre-normalization is applied: weights scaled by
1/sqrt(in*kh*kw)/max|W| per output channel and styles by 1/max|s| per sample,
keeping intermediates in range (fp32 path is untouched, exactly like the
reference which gates this on x.dtype==float16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x,                      # [N, C_in, H, W]
    weight,                 # [C_out, C_in, kh, kw]
    styles,                 # [N, C_in]
    noise=None,             # broadcastable to output, or None
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter=None,
    demodulate: bool = True,
    flip_weight: bool = True,
    up_impl=None,
):
    n = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape
    assert styles.shape == (n, in_channels), (styles.shape, (n, in_channels))

    # Pre-normalize for low-precision compute (reference gates on fp16; the
    # TPU-native low precision is bf16).
    if x.dtype in (jnp.bfloat16, jnp.float16) and demodulate:
        wmax = jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True)
        weight = weight * (1.0 / np.sqrt(in_channels * kh * kw) / wmax)
        smax = jnp.max(jnp.abs(styles), axis=1, keepdims=True)
        styles = styles / smax

    dcoefs = None
    if demodulate:
        w2 = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(2, 3))  # [O, I]
        s2 = jnp.square(styles.astype(jnp.float32))                        # [N, I]
        sigma2 = s2 @ w2.T                                                 # [N, O]
        dcoefs = jax.lax.rsqrt(sigma2 + 1e-8)

    # Modulate the input instead of the weight: one shared-weight conv for
    # the whole batch.
    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=padding, flip_weight=flip_weight, up_impl=up_impl,
    )

    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
