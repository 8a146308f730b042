"""2D convolution with fused up/downsampling.

Behavioral contract: /root/reference/torch_utils/ops/conv2d_resample.py:59-154
— padding is performed once w.r.t. the upsampled image; up>1 applies the FIR
with gain up**2; flip_weight=True means correlation (torch conv2d), False
means true convolution.

TPU-first formulation instead of the reference's five CUDA fast paths:

* up-path: the zero-upsample is carried by `lhs_dilation` on the *main* conv
  (one MXU convolution on the un-materialized dilated input — the analogue of
  the reference's transposed-strided-conv path), followed by the FIR. This is
  valid because valid-mode correlations commute: FIR∘conv == conv∘FIR.
* down-path: pad once, main conv, then strided FIR.
* negative padding (cropping) is handled by `lax.pad` inside upfirdn2d /
  a pre-pad here, so every conv below runs in VALID mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .upfirdn2d import _parse_padding, _get_filter_size, upfirdn2d, _pad_dilate


def conv2d_resample(x, w, f=None, up: int = 1, down: int = 1, padding=0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False):
    """Convolve NCHW `x` with OIHW `w`, with optional FIR up/downsampling.

    Args mirror the reference (conv2d_resample.py:59-81). `f` must come from
    `setup_filter`.
    """
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Fold the resampling geometry into the edge padding (identical arithmetic
    # to the reference contract, conv2d_resample.py:94-104).
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

    wk = w if flip_weight else jnp.flip(w, axis=(2, 3))
    wk = wk.astype(x.dtype)
    dn = ("NCHW", "OIHW", "NCHW")

    if up > 1:
        # Main conv directly on the (virtually) zero-upsampled input.
        x = _pad_dilate(x, (up, up), (px0, px1, py0, py1))
        x = lax.conv_general_dilated(
            x, wk, window_strides=(1, 1), padding="VALID",
            feature_group_count=groups, dimension_numbers=dn,
        )
        x = upfirdn2d(x, f, gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        x = _pad_dilate(x, (1, 1), (px0, px1, py0, py1))
        x = lax.conv_general_dilated(
            x, wk, window_strides=(1, 1), padding="VALID",
            feature_group_count=groups, dimension_numbers=dn,
        )
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain conv.
    x = _pad_dilate(x, (1, 1), (px0, px1, py0, py1))
    return lax.conv_general_dilated(
        x, wk, window_strides=(1, 1), padding="VALID",
        feature_group_count=groups, dimension_numbers=dn,
    )
