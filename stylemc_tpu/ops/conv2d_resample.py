"""2D convolution with fused up/downsampling.

Behavioral contract: /root/reference/torch_utils/ops/conv2d_resample.py:59-154
— padding is performed once w.r.t. the upsampled image; up>1 applies the FIR
with gain up**2; flip_weight=True means correlation (torch conv2d), False
means true convolution.

TPU-first formulation instead of the reference's five CUDA fast paths:

* up-path (default, `UP_CONV_IMPL="polyphase"`): the FIR is composed into the
  conv kernel and the fused up-conv runs as ONE low-resolution convolution
  with up²·O output channels whose phases interleave into the output
  (`_polyphase_up_conv`). The alternative `"pad_dilate"` form materializes
  the zero-upsampled input and convolves at high resolution — same forward
  FLOPs, but its autodiff transpose is full-resolution. Both rely on valid
  correlations commuting: FIR∘conv == conv∘FIR.
* down-path: pad once, main conv with the FIR composed in, strided.
* negative padding (cropping) is handled by `lax.pad` inside upfirdn2d /
  a pre-pad here, so every conv below runs in VALID mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .upfirdn2d import _parse_padding, _get_filter_size, upfirdn2d, _pad_dilate


def _compose_kernel_with_fir(wk, f, gain: float, flip_filter: bool):
    """Compose a conv kernel with the FIR filter that would follow it.

    C(C(u, a), b) == C(u, a ⊛ b) for valid correlations, where a ⊛ b is the
    full 2D convolution of the kernels. `b` is the FIR exactly as upfirdn2d
    would apply it: scaled by gain**(ndim/2), flipped unless flip_filter.
    """
    if f.ndim == 1:
        f = jnp.outer(f, f)
    b = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        b = jnp.flip(b, axis=(0, 1))
    o, i, kh, kw = wk.shape
    fh, fw = b.shape
    # full convolution of each (o,i) plane with b == correlation of the
    # (fh-1, fw-1)-padded plane with flip(b)
    a = wk.reshape(o * i, 1, kh, kw)
    rhs = jnp.flip(b, axis=(0, 1))[None, None].astype(wk.dtype)
    m = lax.conv_general_dilated(
        a, rhs, window_strides=(1, 1),
        padding=((fh - 1, fh - 1), (fw - 1, fw - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return m.reshape(o, i, kh + fh - 1, kw + fw - 1)


# Implementation of the fused up-conv: "polyphase" (default) computes one
# low-resolution convolution with up²·O output channels + interleave;
# "pad_dilate" materializes the zero-upsampled input and runs the conv at
# high resolution. Forward FLOPs are identical (XLA's polyphase split of the
# pad_dilate form reaches the same count), but the BACKWARD of pad_dilate is
# a full-resolution transposed conv followed by a strided slice — up²× the
# work — because the transpose of an interior-dilated pad is a strided
# slice that XLA does not fold back into the conv. The polyphase form's
# transpose stays at low resolution. Kept switchable for A/B benchmarks.
# NOTE: read at TRACE time — flipping it does not affect already-jitted
# callers (their cached executables keep the impl they traced with); retrace
# or build a fresh jit after changing it, as .bench/up_conv_ab.py does.
UP_CONV_IMPL = "polyphase"


def _polyphase_up_conv(x, wk, up: int, pads):
    """VALID-corr(pad(zero_interleave(x, up), pads), wk) as ONE low-res conv.

    Output row r = up·m + a of the dilated-pad formulation reads only input
    rows m - s_a + t with kernel taps wk[up·t + c_a], where
    c_a = (py0 - a) mod up and s_a = ⌊(py0 - a)/up⌋ — i.e. each output
    phase is a plain T-tap correlation of x. All up² phases are computed by
    one conv whose output channels are (phase_r, phase_c, O)-blocked, then
    phase-sliced and interleaved. MXU-friendlier than the dilated form
    (up²·O output channels fill the systolic array where StyleGAN2's upper
    blocks are channel-thin) and its autodiff transpose stays low-res.
    """
    n, _, h, w_sp = x.shape
    o, i, kh, kw = wk.shape
    px0, px1, py0, py1 = pads
    th, tw = -(-kh // up), -(-kw // up)  # taps per phase (ceil)
    # dilated length is up·H (up-1 trailing zeros after the last sample,
    # matching _pad_dilate / reference upfirdn2d.py:183-190)
    ho = up * h + py0 + py1 - kh + 1
    wo = up * w_sp + px0 + px1 - kw + 1
    assert ho > 0 and wo > 0, (ho, wo)

    c_r = [(py0 - a) % up for a in range(up)]
    s_r = [(py0 - a - c_r[a]) // up for a in range(up)]
    c_c = [(px0 - b) % up for b in range(up)]
    s_c = [(px0 - b - c_c[b]) // up for b in range(up)]
    big_sr, big_sc = max(s_r), max(s_c)
    mr = -(-ho // up)   # uniform per-phase slice length (final crop trims)
    mc = -(-wo // up)
    rr = mr + big_sr - min(s_r)   # conv output rows needed
    cc = mc + big_sc - min(s_c)

    zero = jnp.zeros((), x.dtype)
    lo_r, hi_r = big_sr, (rr + th - 1) - big_sr - h
    lo_c, hi_c = big_sc, (cc + tw - 1) - big_sc - w_sp
    xp = lax.pad(x, zero, ((0, 0, 0), (0, 0, 0),
                           (lo_r, hi_r, 0), (lo_c, hi_c, 0)))

    # Polyphase kernel [up²·O, I, th, tw], output-channel-blocked (a, b, o).
    wk_pad = lax.pad(wk, jnp.zeros((), wk.dtype),
                     ((0, 0, 0), (0, 0, 0),
                      (0, th * up - kh, 0), (0, tw * up - kw, 0)))
    wkr = wk_pad.reshape(o, i, th, up, tw, up)
    ph = jnp.stack([wkr[:, :, :, c_r[a], :, :] for a in range(up)], axis=0)
    ph = jnp.stack([ph[..., c_c[b]] for b in range(up)], axis=1)
    wk_poly = ph.reshape(up * up * o, i, th, tw)

    out = lax.conv_general_dilated(
        xp, wk_poly, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = out.reshape(n, up, up, o, rr, cc)

    rows = []
    for a in range(up):
        r0 = big_sr - s_r[a]
        cols = []
        for b in range(up):
            c0 = big_sc - s_c[b]
            cols.append(lax.slice(out[:, a, b], (0, 0, r0, c0),
                                  (n, o, r0 + mr, c0 + mc)))
        rows.append(jnp.stack(cols, axis=-1))      # [n, o, mr, mc, up_b]
    y = jnp.stack(rows, axis=3)                    # [n, o, mr, up_a, mc, up_b]
    return y.reshape(n, o, up * mr, up * mc)[:, :, :ho, :wo]


def conv2d_resample(x, w, f=None, up: int = 1, down: int = 1, padding=0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False, up_impl=None):
    """Convolve NCHW `x` with OIHW `w`, with optional FIR up/downsampling.

    Args mirror the reference (conv2d_resample.py:59-81). `f` must come from
    `setup_filter`. `up_impl` overrides the module-level UP_CONV_IMPL for
    this call ("polyphase" | "pad_dilate"; None → the module default) —
    trace-time like the global, but threadable through jit static args
    (GeneratorConfig.up_conv_impl) so differently-configured callers never
    collide in a shared jit cache.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert (up_impl or UP_CONV_IMPL) in ("polyphase", "pad_dilate"), up_impl
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
        # Main conv directly on the (virtually) zero-upsampled input. The FIR
        # is COMPOSED into the conv kernel (valid correlations compose as the
        # full 2D convolution of their kernels): one MXU conv replaces
        # conv + bandwidth-bound depthwise FIR. 3x3 ⊛ 4x4 → 6x6; XLA's
        # polyphase decomposition of lhs_dilation keeps the FLOPs at the
        # 4-subconv level.
        # NOTE: expressing the zero-insertion via native conv lhs_dilation is
        # semantically identical but compiles pathologically slowly on the
        # remote TPU toolchain; the explicit lax.pad below is folded into the
        # convolution by XLA's algebraic simplifier and runs at the same
        # speed with ~20x faster compiles.
        fuse = f is not None and down == 1 and groups == 1
        if fuse:
            wk = _compose_kernel_with_fir(wk, f, gain=up ** 2,
                                          flip_filter=flip_filter)
            if (up_impl or UP_CONV_IMPL) == "polyphase":
                return _polyphase_up_conv(x, wk, up, (px0, px1, py0, py1))
        x = _pad_dilate(x, (up, up), (px0, px1, py0, py1))
        x = lax.conv_general_dilated(
            x, wk, window_strides=(1, 1), padding="VALID",
            feature_group_count=groups, dimension_numbers=dn,
        )
        if fuse:
            return x
        x = upfirdn2d(x, f, gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        x = _pad_dilate(x, (1, 1), (px0, px1, py0, py1))
        if f is not None and groups == 1:
            # compose conv ∘ FIR into one strided conv (the mirror of the
            # up-path fusion): S_d(C(C(u,w),f)) == S_d(C(u, w ⊛ f))
            wk = _compose_kernel_with_fir(wk, f, gain=1.0,
                                          flip_filter=flip_filter)
            return lax.conv_general_dilated(
                x, wk, window_strides=(down, down), padding="VALID",
                feature_group_count=groups, dimension_numbers=dn,
            )
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
