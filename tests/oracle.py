"""Numpy oracles for the ops layer, written directly from the mathematical
definition (pad → zero-upsample → FIR convolve → downsample), independent of
both the JAX implementation under test and the reference code. Intentionally
slow and obvious.
"""

import numpy as np


def upfirdn2d_np(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """x: [N, C, H, W] float; f: [fh, fw] or [taps] or None."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    px0, px1, py0, py1 = padding

    if f is None:
        f = np.ones((1, 1), dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    separable = f.ndim == 1
    if separable:
        f2 = np.outer(f, f) * gain  # gain ** (0.5 * 2) per pass == gain total
    else:
        f2 = f * gain
    if not flip_filter:
        f2 = f2[::-1, ::-1]

    x = np.asarray(x, dtype=np.float64)
    n, c, h, w = x.shape

    # 1. zero-upsample: up-1 zeros after each pixel (including trailing).
    up_h, up_w = h * upy, w * upx
    xu = np.zeros((n, c, up_h, up_w))
    xu[:, :, ::upy, ::upx] = x

    # 2. pad / crop.
    ph, pw = up_h + py0 + py1, up_w + px0 + px1
    xp = np.zeros((n, c, ph, pw))
    src_y0, src_y1 = max(-py0, 0), up_h - max(-py1, 0)
    src_x0, src_x1 = max(-px0, 0), up_w - max(-px1, 0)
    dst_y0, dst_x0 = max(py0, 0), max(px0, 0)
    xp[:, :, dst_y0:dst_y0 + (src_y1 - src_y0), dst_x0:dst_x0 + (src_x1 - src_x0)] = \
        xu[:, :, src_y0:src_y1, src_x0:src_x1]

    # 3. correlate (valid) with f2.
    fh, fw = f2.shape
    oh, ow = ph - fh + 1, pw - fw + 1
    out = np.zeros((n, c, oh, ow))
    for iy in range(fh):
        for ix in range(fw):
            out += f2[iy, ix] * xp[:, :, iy:iy + oh, ix:ix + ow]

    # 4. downsample.
    return out[:, :, ::downy, ::downx]


def conv2d_np(x, w, padding=0, groups=1, flip_weight=True):
    """Plain 2D conv oracle. x [N,Cin,H,W], w [Cout,Cin//g,kh,kw].

    flip_weight=True → correlation (torch conv2d semantics)."""
    x = np.asarray(x, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    if not flip_weight:
        w = w[:, :, ::-1, ::-1]
    if isinstance(padding, int):
        padding = [padding] * 4
    py0, py1, px0, px1 = padding  # note: [y0,y1,x0,x1] here
    n, cin, h, wd = x.shape
    cout, cin_g, kh, kw = w.shape
    xp = np.zeros((n, cin, h + py0 + py1, wd + px0 + px1))
    xp[:, :, py0:py0 + h, px0:px0 + wd] = x
    oh, ow = xp.shape[2] - kh + 1, xp.shape[3] - kw + 1
    out = np.zeros((n, cout, oh, ow))
    cpg_in = cin // groups
    cpg_out = cout // groups
    for g in range(groups):
        xg = xp[:, g * cpg_in:(g + 1) * cpg_in]
        wg = w[g * cpg_out:(g + 1) * cpg_out]
        for iy in range(kh):
            for ix in range(kw):
                out[:, g * cpg_out:(g + 1) * cpg_out] += np.einsum(
                    "nihw,oi->nohw",
                    xg[:, :, iy:iy + oh, ix:ix + ow],
                    wg[:, :, iy, ix],
                )
    return out


def modulated_conv2d_np(x, weight, styles, noise=None, demodulate=True, padding=0):
    """Fused-style oracle: per-sample modulated weights + per-sample conv —
    the *other* decomposition, so a match certifies the algebraic identity."""
    x = np.asarray(x, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    styles = np.asarray(styles, dtype=np.float64)
    n = x.shape[0]
    outs = []
    for b in range(n):
        wmod = weight * styles[b][None, :, None, None]
        if demodulate:
            d = 1.0 / np.sqrt((wmod ** 2).sum(axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * d[:, None, None, None]
        outs.append(conv2d_np(x[b:b + 1], wmod, padding=[padding] * 4))
    out = np.concatenate(outs, axis=0)
    if noise is not None:
        out = out + noise
    return out
