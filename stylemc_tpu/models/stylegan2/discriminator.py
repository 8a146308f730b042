"""StyleGAN2 image discriminator in functional JAX.

Behavioral contract: the rosinality `Discriminator`
(/root/reference/encoder4editing/models/stylegan2/model.py:615-673): conv
stem, residual down-blocks (two 3x3 convs with fused-lrelu, blur-downsampled
skip scaled by 1/√2), minibatch-stddev feature, final conv + 2-layer
EqualLinear head. Channel dict matches the generator (channel_multiplier 2).

Used for adversarial fine-tuning / FID-oriented training loops; weight
import maps the rosinality `d` state dict.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import setup_filter_np, conv2d_resample


def d_channels(size: int, channel_multiplier: int = 2) -> Dict[int, int]:
    return {res: min(int(2 ** 14 * channel_multiplier / res), 512)
            if res >= 64 else 512
            for res in [2 ** i for i in range(2, int(np.log2(size)) + 1)]}


def _equal_conv(x, w, stride=1, padding=0, f=None, down=1):
    """EqualConv2d: runtime scale 1/sqrt(fan_in) (model.py:90-126)."""
    out_c, in_c, kh, kw = w.shape
    scale = 1.0 / np.sqrt(in_c * kh * kw)
    if down > 1:
        return conv2d_resample(x, w * scale, f=jnp.asarray(f), down=down,
                               padding=padding)
    return conv2d_resample(x, w * scale, padding=padding)


def _flrelu(x, bias):
    x = x + bias.reshape((1, -1) + (1,) * (x.ndim - 2)).astype(x.dtype)
    return jnp.where(x >= 0, x, 0.2 * x) * float(np.sqrt(2))


def _equal_linear(p, x, lr_mul=1.0, act=False):
    w = p["weight"]
    scale = (1.0 / np.sqrt(w.shape[1])) * lr_mul
    y = x @ (w * scale).T.astype(x.dtype)
    if act:
        return _flrelu(y, p["bias"] * lr_mul)
    return y + (p["bias"] * lr_mul).astype(x.dtype)


def minibatch_stddev(x, group_size: int = 4):
    """model.py:644-652: per-group feature stddev appended as a channel."""
    n, c, h, w = x.shape
    g = min(n, group_size)
    while n % g != 0:
        g -= 1
    y = x.reshape(g, n // g, 1, c, h, w)
    var = jnp.var(y, axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True).squeeze(2)
    stddev = jnp.tile(stddev, (g, 1, h, w))
    return jnp.concatenate([x, stddev], axis=1)


def discriminator_apply(params, x, blur_kernel=(1, 3, 3, 1)):
    """x: [N, 3, S, S] in [-1,1] → logits [N, 1]."""
    f = setup_filter_np(blur_kernel)
    size = x.shape[-1]
    log_size = int(np.log2(size))

    h = _flrelu(_equal_conv(x, params["stem"]["weight"], padding=0),
                params["stem"]["bias"])
    for i in range(log_size, 2, -1):
        bp = params[f"block{2 ** i}"]
        skip = _equal_conv(h, bp["skip_weight"], f=f, down=2)
        h = _flrelu(_equal_conv(h, bp["conv1"]["weight"], padding=1),
                    bp["conv1"]["bias"])
        h = _flrelu(_equal_conv(h, bp["conv2"]["weight"], padding=1, f=f,
                                down=2), bp["conv2"]["bias"])
        h = (h + skip) / float(np.sqrt(2))

    h = minibatch_stddev(h)
    h = _flrelu(_equal_conv(h, params["final_conv"]["weight"], padding=1),
                params["final_conv"]["bias"])
    h = h.reshape(h.shape[0], -1)
    h = _equal_linear(params["final_linear1"], h, act=True)
    return _equal_linear(params["final_linear2"], h)


def init_discriminator_params(key, size: int = 256,
                              channel_multiplier: int = 2) -> Dict[str, Any]:
    ch = d_channels(size, channel_multiplier)
    ks = iter(jax.random.split(key, 64))

    def conv_init(cin, cout, k):
        return {"weight": jax.random.normal(next(ks), (cout, cin, k, k)),
                "bias": jnp.zeros((cout,))}

    log_size = int(np.log2(size))
    params: Dict[str, Any] = {"stem": conv_init(3, ch[size], 1)}
    in_c = ch[size]
    for i in range(log_size, 2, -1):
        out_c = ch[2 ** (i - 1)] if 2 ** (i - 1) >= 4 else 512
        params[f"block{2 ** i}"] = {
            "conv1": conv_init(in_c, in_c, 3),
            "conv2": conv_init(in_c, out_c, 3),
            "skip_weight": jax.random.normal(next(ks), (out_c, in_c, 1, 1)),
        }
        in_c = out_c
    params["final_conv"] = conv_init(in_c + 1, ch[4], 3)
    params["final_linear1"] = {
        "weight": jax.random.normal(next(ks), (ch[4], ch[4] * 16)),
        "bias": jnp.zeros((ch[4],))}
    params["final_linear2"] = {
        "weight": jax.random.normal(next(ks), (1, ch[4])),
        "bias": jnp.zeros((1,))}
    return params


def d_params_from_ada(state: Dict[str, np.ndarray],
                      size: int) -> Dict[str, Any]:
    """NVIDIA ADA Discriminator state dict → pytree.

    Layout: the `training/networks.py` Discriminator embedded in NVIDIA
    pickles (names documented by /root/reference/legacy.py:268-287):
    `b{res}.fromrgb` (stem, top res only for 'resnet'), per-block
    `b{res}.conv0` (same-res) / `conv1` (down) / `skip`, epilogue
    `b4.conv` / `b4.fc` / `b4.out`. Same architecture and stored-weight
    conventions as the rosinality layout this module implements.
    """
    t = {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in state.items()}
    log_size = int(np.log2(size))
    params: Dict[str, Any] = {
        "stem": {"weight": t[f"b{size}.fromrgb.weight"],
                 "bias": t[f"b{size}.fromrgb.bias"]},
    }
    for i in range(log_size, 2, -1):
        r = 2 ** i
        params[f"block{r}"] = {
            "conv1": {"weight": t[f"b{r}.conv0.weight"],
                      "bias": t[f"b{r}.conv0.bias"]},
            "conv2": {"weight": t[f"b{r}.conv1.weight"],
                      "bias": t[f"b{r}.conv1.bias"]},
            "skip_weight": t[f"b{r}.skip.weight"],
        }
    params["final_conv"] = {"weight": t["b4.conv.weight"],
                            "bias": t["b4.conv.bias"]}
    params["final_linear1"] = {"weight": t["b4.fc.weight"],
                               "bias": t["b4.fc.bias"]}
    params["final_linear2"] = {"weight": t["b4.out.weight"],
                               "bias": t["b4.out.bias"]}
    return params


def d_params_from_rosinality(state: Dict[str, np.ndarray],
                             size: int) -> Dict[str, Any]:
    """rosinality Discriminator state dict → pytree. Layout: convs.0 = stem
    ConvLayer, convs.1..N = ResBlocks, final_conv, final_linear.{0,1}."""
    t = {k: jnp.asarray(v) for k, v in state.items()}
    log_size = int(np.log2(size))
    params: Dict[str, Any] = {
        "stem": {"weight": t["convs.0.0.weight"],
                 "bias": t["convs.0.1.bias"]},
    }
    idx = 1
    for i in range(log_size, 2, -1):
        pfx = f"convs.{idx}"
        params[f"block{2 ** i}"] = {
            "conv1": {"weight": t[f"{pfx}.conv1.0.weight"],
                      "bias": t[f"{pfx}.conv1.1.bias"]},
            "conv2": {"weight": t[f"{pfx}.conv2.1.weight"],
                      "bias": t[f"{pfx}.conv2.2.bias"]},
            "skip_weight": t[f"{pfx}.skip.1.weight"],
        }
        idx += 1
    params["final_conv"] = {"weight": t["final_conv.0.weight"],
                            "bias": t["final_conv.1.bias"]}
    params["final_linear1"] = {"weight": t["final_linear.0.weight"],
                               "bias": t["final_linear.0.bias"]}
    params["final_linear2"] = {"weight": t["final_linear.1.weight"],
                               "bias": t["final_linear.1.bias"]}
    return params
