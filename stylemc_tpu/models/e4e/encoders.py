"""e4e / pSp encoders in functional JAX.

Behavioral contract: /root/reference/encoder4editing/models/encoders/
psp_encoders.py — GradualStyleEncoder (FPN over an IR-SE-50 body, 18 style
heads), Encoder4Editing (w0 + progressive per-layer deltas), and
BackboneEncoderUsingLastLayerIntoW; feature taps at body indices 6/20/23,
FPN merge via bilinear align_corners=True upsample + 1x1 lateral conv
(helpers.py:123-140), style heads = log2(spatial) strided convs + LeakyReLU
+ EqualLinear (psp_encoders.py:34-55).

The IR-SE bottleneck math is shared with the ArcFace module (identical
helpers in the reference: id_loss/helpers.py == encoder4editing helpers).
Bilinear align_corners resize is expressed as two dense matmuls.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..arcface import (_bn, _bottleneck_ir_se, _conv, _prelu,
                       ir_se_50_layout)

# Feature-tap indices in the 24-bottleneck IR-50 body (psp_encoders.py:100-107)
TAP_C1, TAP_C2, TAP_C3 = 6, 20, 23
COARSE_IND, MIDDLE_IND = 3, 7


def fpn_tap_indices(layout):
    """FPN tap indices (c1, c2, c3) for a body layout: the last block of
    each of the final three downsampling stages. A stage starts at every
    stride-2 block; for the IR-50 layout this reproduces the reference's
    hardcoded 6/20/23 (psp_encoders.py:100-107). Custom (test-sized)
    layouts with four stride-2 stages keep the 64/32/16 tap spatials the
    style heads assume at 256px input."""
    starts = [i for i, (_, _, s) in enumerate(layout) if s == 2]
    if len(starts) < 3:
        raise ValueError("encoder layout needs >= 3 stride-2 stages")
    ends = [s - 1 for s in starts[1:]] + [len(layout) - 1]
    return tuple(ends[-3:])


def style_count(stylegan_size: int) -> int:
    return 2 * int(math.log2(stylegan_size)) - 2


# ------------------------------------------------------------- primitives


def equal_linear(p, x, lr_mul: float = 1.0, activation: Optional[str] = None):
    """rosinality EqualLinear (model.py:128-157): runtime scale
    (1/sqrt(in))*lr_mul on weight, lr_mul on bias; optional fused lrelu
    (bias → lrelu(0.2) → *sqrt(2))."""
    w = p["weight"]
    scale = (1.0 / np.sqrt(w.shape[1])) * lr_mul
    if activation == "fused_lrelu":
        y = x @ (w * scale).T.astype(x.dtype)
        y = y + (p["bias"] * lr_mul).astype(x.dtype)
        y = jnp.where(y >= 0, y, 0.2 * y) * float(np.sqrt(2))
        return y
    return x @ (w * scale).T.astype(x.dtype) + (p["bias"] * lr_mul).astype(x.dtype)


@functools.lru_cache(maxsize=32)
def _bilinear_ac_matrix(in_size: int, out_size: int) -> np.ndarray:
    """align_corners=True bilinear interpolation matrix [out, in]."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        mat[:, 0] = 1.0
        return mat
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        pos = i * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        mat[i, lo] += 1 - frac
        mat[i, hi] += frac
    return mat


def upsample_add(x, y):
    """F.interpolate(x, size=y.shape, bilinear, align_corners=True) + y
    (reference helpers.py:123-140)."""
    h, w = y.shape[-2], y.shape[-1]
    ky = jnp.asarray(_bilinear_ac_matrix(x.shape[-2], h))
    kx = jnp.asarray(_bilinear_ac_matrix(x.shape[-1], w))
    up = jnp.einsum("oh,nchw->ncow", ky.astype(x.dtype), x)
    up = jnp.einsum("ow,nchw->ncho", kx.astype(x.dtype), up)
    return up + y


def _conv_bias(p, x, stride=1, padding=0):
    y = _conv(x, p["weight"], stride=stride, padding=padding)
    return y + p["bias"][None, :, None, None].astype(x.dtype)


def gradual_style_block(p, x, spatial: int):
    """log2(spatial) stride-2 convs + LeakyReLU(0.01), then EqualLinear
    (psp_encoders.py:34-55)."""
    num_pools = int(np.log2(spatial))
    for i in range(num_pools):
        x = _conv_bias(p[f"conv{i}"], x, stride=2, padding=1)
        x = jnp.where(x >= 0, x, 0.01 * x)
    x = x.reshape(x.shape[0], -1)
    return equal_linear(p["linear"], x)


# ------------------------------------------------------------- body


def _encoder_body(p, x, layout=None):
    """IR-SE trunk with FPN taps. x: [N,3,256,256] → (c1, c2, c3).

    Uniform bottleneck stretches run through lax.scan (arcface.body_runs /
    apply_body_run) — one compiled body per stage instead of 24 inlined
    blocks. The FPN taps (6/20/23 on the default IR-50 layout) each fall
    on a run *boundary*, so the scan grouping never needs to surface an
    intermediate activation. `layout` swaps in a custom body (tests use a
    4-block one — the full 24-bottleneck fwd+bwd compile is minutes-long
    on slow hosts)."""
    from ..arcface import apply_body_run, body_runs

    x = _conv(x, p["input_conv_weight"], padding=1)
    x = _bn(p["input_bn"], x)
    x = _prelu(p["input_prelu"], x)
    layout = list(layout) if layout is not None else ir_se_50_layout()
    t1, t2, t3 = fpn_tap_indices(layout)
    taps = {t1: None, t2: None, t3: None}
    for run in body_runs(layout):
        x = apply_body_run(p["body"], x, run, layout)
        if run[1] - 1 in taps:
            taps[run[1] - 1] = x
    c1, c2, c3 = taps[t1], taps[t2], taps[t3]
    assert c1 is not None and c2 is not None and c3 is not None, \
        "FPN tap indices must land on body_runs boundaries"
    return c1, c2, c3


def _fpn_features(p, c1, c2, c3):
    p2 = upsample_add(c3, _conv_bias(p["latlayer1"], c2))
    p1 = upsample_add(p2, _conv_bias(p["latlayer2"], c1))
    return p1, p2


def _head_spatial(i: int) -> int:
    if i < COARSE_IND:
        return 16
    if i < MIDDLE_IND:
        return 32
    return 64


def _heads_vmapped(p_styles, feat, idxs, spatial):
    """Apply the shape-identical style heads `idxs` to `feat` via one vmap
    over stacked params → [len(idxs), N, 512]. The head body (log2(spatial)
    convs + EqualLinear) is compiled once per group instead of once per
    head (1024: groups of 3/4/11), and the small convs batch together."""
    if len(idxs) == 1:
        return gradual_style_block(p_styles[f"{idxs[0]}"], feat, spatial)[None]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[p_styles[f"{i}"] for i in idxs])
    return jax.vmap(lambda bp: gradual_style_block(bp, feat, spatial))(stacked)


def _head_groups(lo, hi):
    """Split head indices [lo, hi) into runs sharing a feature/spatial."""
    groups = []
    for g_lo, g_hi in ((lo, min(hi, COARSE_IND)),
                       (max(lo, COARSE_IND), min(hi, MIDDLE_IND)),
                       (max(lo, MIDDLE_IND), hi)):
        if g_hi > g_lo:
            groups.append(list(range(g_lo, g_hi)))
    return groups


def gradual_style_encoder(p, x, stylegan_size: int = 1024, layout=None):
    """GradualStyleEncoder forward (psp_encoders.py:95-121) → [N, S, 512]."""
    n_styles = style_count(stylegan_size)
    c1, c2, c3 = _encoder_body(p, x, layout)
    p1, p2 = _fpn_features(p, c1, c2, c3)
    chunks = []
    for idxs in _head_groups(0, n_styles):
        feat = (c3 if idxs[0] < COARSE_IND
                else (p2 if idxs[0] < MIDDLE_IND else p1))
        chunks.append(_heads_vmapped(p["styles"], feat, idxs,
                                     _head_spatial(idxs[0])))
    return jnp.swapaxes(jnp.concatenate(chunks, axis=0), 0, 1)


def encoder4editing(p, x, stylegan_size: int = 1024,
                    progressive_stage: int = 18, layout=None):
    """Encoder4Editing forward (psp_encoders.py:173-200): w0 broadcast +
    per-layer deltas up to `progressive_stage` (static int; 18=Inference)."""
    n_styles = style_count(stylegan_size)
    c1, c2, c3 = _encoder_body(p, x, layout)
    w0 = gradual_style_block(p["styles"]["0"], c3, 16)
    w = jnp.repeat(w0[:, None, :], n_styles, axis=1)

    stop = min(progressive_stage + 1, n_styles)
    p2 = p1 = None
    for idxs in _head_groups(1, stop):
        if idxs[0] < COARSE_IND:
            feat = c3
        elif idxs[0] < MIDDLE_IND:
            if p2 is None:
                p2 = upsample_add(c3, _conv_bias(p["latlayer1"], c2))
            feat = p2
        else:
            if p2 is None:
                p2 = upsample_add(c3, _conv_bias(p["latlayer1"], c2))
            if p1 is None:
                p1 = upsample_add(p2, _conv_bias(p["latlayer2"], c1))
            feat = p1
        deltas = _heads_vmapped(p["styles"], feat, idxs,
                                _head_spatial(idxs[0]))
        w = w.at[:, idxs[0]:idxs[-1] + 1].add(jnp.swapaxes(deltas, 0, 1))
    return w


def backbone_encoder_into_w(p, x, stylegan_size: int = 1024, layout=None):
    """SingleStyleCodeEncoder (psp_encoders.py:229-235)."""
    n_styles = style_count(stylegan_size)
    c1, c2, c3 = _encoder_body(p, x, layout)
    pooled = jnp.mean(c3, axis=(2, 3))
    w = equal_linear(p["linear"], pooled)
    return jnp.repeat(w[:, None, :], n_styles, axis=1)


# ------------------------------------------------------------- init / import


def init_encoder_params(key, stylegan_size: int = 1024,
                        encoder_type: str = "Encoder4Editing",
                        layout=None) -> Dict[str, Any]:
    from ..arcface import init_backbone_params

    n_styles = style_count(stylegan_size)
    base = init_backbone_params(key, input_size=112, layout=layout)
    lay = list(layout) if layout is not None else ir_se_50_layout()
    t1, t2, t3 = fpn_tap_indices(lay)
    # tap channel widths (IR-50: 128/256/512); heads and laterals follow c3
    c1_ch, c2_ch, c3_ch = lay[t1][1], lay[t2][1], lay[t3][1]
    params = {
        "input_conv_weight": base["input_conv_weight"],
        "input_bn": base["input_bn"],
        "input_prelu": base["input_prelu"],
        "body": base["body"],
    }
    ks = iter(jax.random.split(jax.random.fold_in(key, 1),
                               4 + 8 * max(n_styles, 1)))

    def conv_init(cin, cout, k):
        kk = next(ks)
        bound = 1.0 / np.sqrt(cin * k * k)
        return {"weight": jax.random.uniform(kk, (cout, cin, k, k),
                                             minval=-bound, maxval=bound),
                "bias": jnp.zeros((cout,))}

    if encoder_type == "SingleStyleCodeEncoder":
        params["linear"] = {"weight": jax.random.normal(next(ks),
                                                        (512, c3_ch)),
                            "bias": jnp.zeros((512,))}
        return params

    styles = {}
    for i in range(n_styles):
        spatial = _head_spatial(i)
        head = {}
        for j in range(int(np.log2(spatial))):
            head[f"conv{j}"] = conv_init(c3_ch, c3_ch, 3)
        head["linear"] = {"weight": jax.random.normal(next(ks),
                                                      (512, c3_ch)),
                          "bias": jnp.zeros((512,))}
        styles[f"{i}"] = head
    params["styles"] = styles
    params["latlayer1"] = conv_init(c2_ch, c3_ch, 1)
    params["latlayer2"] = conv_init(c1_ch, c3_ch, 1)
    return params


def encoder_params_from_torch_state(state: Dict[str, np.ndarray],
                                    stylegan_size: int = 1024) -> Dict[str, Any]:
    """Map the e4e encoder state_dict (input_layer.*, body.N.*, styles.N.*,
    latlayer{1,2}.*) onto the pytree."""
    t = {k: jnp.asarray(v) for k, v in state.items()}

    def bn(prefix):
        return {k: t[f"{prefix}.{k}"] for k in
                ("weight", "bias", "running_mean", "running_var")}

    params: Dict[str, Any] = {
        "input_conv_weight": t["input_layer.0.weight"],
        "input_bn": bn("input_layer.1"),
        "input_prelu": t["input_layer.2.weight"],
        "body": {},
    }
    for i, (in_c, depth, stride) in enumerate(ir_se_50_layout()):
        pfx = f"body.{i}"
        bp = {
            "bn1": bn(f"{pfx}.res_layer.0"),
            "conv1_weight": t[f"{pfx}.res_layer.1.weight"],
            "prelu": t[f"{pfx}.res_layer.2.weight"],
            "conv2_weight": t[f"{pfx}.res_layer.3.weight"],
            "bn2": bn(f"{pfx}.res_layer.4"),
            "se": {"fc1_weight": t[f"{pfx}.res_layer.5.fc1.weight"],
                   "fc2_weight": t[f"{pfx}.res_layer.5.fc2.weight"]},
        }
        if in_c != depth:
            bp["shortcut_conv_weight"] = t[f"{pfx}.shortcut_layer.0.weight"]
            bp["shortcut_bn"] = bn(f"{pfx}.shortcut_layer.1")
        params["body"][f"{i}"] = bp

    if "linear.weight" in t:  # SingleStyleCodeEncoder
        params["linear"] = {"weight": t["linear.weight"],
                            "bias": t["linear.bias"]}
        return params

    styles = {}
    n_styles = style_count(stylegan_size)
    for i in range(n_styles):
        spatial = _head_spatial(i)
        head = {}
        for j in range(int(np.log2(spatial))):
            head[f"conv{j}"] = {
                "weight": t[f"styles.{i}.convs.{2 * j}.weight"],
                "bias": t[f"styles.{i}.convs.{2 * j}.bias"],
            }
        head["linear"] = {"weight": t[f"styles.{i}.linear.weight"],
                          "bias": t[f"styles.{i}.linear.bias"]}
        styles[f"{i}"] = head
    params["styles"] = styles
    params["latlayer1"] = {"weight": t["latlayer1.weight"],
                           "bias": t["latlayer1.bias"]}
    params["latlayer2"] = {"weight": t["latlayer2.weight"],
                           "bias": t["latlayer2.bias"]}
    return params
