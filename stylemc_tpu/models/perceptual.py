"""Perceptual feature backbones for LPIPS: AlexNet / VGG16 / SqueezeNet
feature stacks in functional JAX.

Behavioral contract: /root/reference/encoder4editing/criteria/lpips/
networks.py — torchvision `features` sequentials with fixed target-layer
taps and per-tap channel lists; inputs z-scored with the LPIPS shift/scale
buffers; activations unit-normalized per pixel (utils.py:6-8).

Weight import maps torchvision `features.N.{weight,bias}` names.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)

# (conv specs per torchvision features index) — only conv layers carry params;
# relu/maxpool are functional. spec: index → (out_c, kernel, stride, padding)
ALEXNET_CONVS = {0: (64, 11, 4, 2), 3: (192, 5, 1, 2), 6: (384, 3, 1, 1),
                 8: (256, 3, 1, 1), 10: (256, 3, 1, 1)}
ALEXNET_POOLS = {2, 5, 12}        # MaxPool(3, stride 2) AFTER the relu tap
ALEXNET_LEN = 13
ALEXNET_TAPS = (2, 5, 8, 10, 12)  # relu outputs (1-indexed in reference)
ALEXNET_CHANNELS = (64, 192, 384, 256, 256)

VGG16_CONVS = {0: (64, 3, 1, 1), 2: (64, 3, 1, 1), 5: (128, 3, 1, 1),
               7: (128, 3, 1, 1), 10: (256, 3, 1, 1), 12: (256, 3, 1, 1),
               14: (256, 3, 1, 1), 17: (512, 3, 1, 1), 19: (512, 3, 1, 1),
               21: (512, 3, 1, 1), 24: (512, 3, 1, 1), 26: (512, 3, 1, 1),
               28: (512, 3, 1, 1)}
VGG16_POOLS = {4, 9, 16, 23, 30}  # MaxPool(2,2)
VGG16_LEN = 31
VGG16_TAPS = (4, 9, 16, 23, 30)
VGG16_CHANNELS = (64, 128, 256, 512, 512)

# torchvision squeezenet1_1.features (networks.py:66-74): conv0 + Fire modules
# interleaved with ceil-mode MaxPool(3,2). fire spec: idx → (in_c, squeeze,
# expand1x1, expand3x3); output channels = expand1x1 + expand3x3.
SQUEEZE_CONVS = {0: (64, 3, 2, 0)}
SQUEEZE_FIRES = {3: (64, 16, 64, 64), 4: (128, 16, 64, 64),
                 6: (128, 32, 128, 128), 7: (256, 32, 128, 128),
                 9: (256, 48, 192, 192), 10: (384, 48, 192, 192),
                 11: (384, 64, 256, 256), 12: (512, 64, 256, 256)}
SQUEEZE_POOLS = {2, 5, 8}         # MaxPool(3, stride 2, ceil_mode=True)
SQUEEZE_LEN = 13
SQUEEZE_TAPS = (2, 5, 8, 10, 11, 12, 13)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


def _conv(x, p, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"][None, :, None, None].astype(x.dtype)


def _maxpool(x, k, s, ceil_mode=False):
    pad_h = pad_w = 0
    if ceil_mode:
        # torch ceil_mode: out = ceil((H-k)/s)+1; emulate by -inf padding the
        # high side. pad ≤ s-1 < k so the extra window still overlaps input.
        h, w = x.shape[2], x.shape[3]
        pad_h = (-(h - k) % s) if (h - k) % s else 0
        pad_w = (-(w - k) % s) if (w - k) % s else 0
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (0, pad_h), (0, pad_w)])


def _fire(x, p):
    """torchvision Fire: 1x1 squeeze+relu → concat(1x1 expand, 3x3 expand)."""
    s = jnp.maximum(_conv(x, p["squeeze"], 1, 0), 0)
    e1 = jnp.maximum(_conv(s, p["expand1x1"], 1, 0), 0)
    e3 = jnp.maximum(_conv(s, p["expand3x3"], 1, 1), 0)
    return jnp.concatenate([e1, e3], axis=1)


def normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / (norm + eps)


def _z_score(x):
    mean = jnp.asarray(LPIPS_SHIFT, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(LPIPS_SCALE, x.dtype).reshape(1, 3, 1, 1)
    return (x - mean) / std


def _net_spec(net_type: str):
    """→ (convs, fires, pools, length, taps, channels, pool_ks, ceil_mode)."""
    if net_type == "alex":
        return ALEXNET_CONVS, {}, ALEXNET_POOLS, ALEXNET_LEN, ALEXNET_TAPS, \
            ALEXNET_CHANNELS, (3, 2), False
    if net_type == "vgg":
        return VGG16_CONVS, {}, VGG16_POOLS, VGG16_LEN, VGG16_TAPS, \
            VGG16_CHANNELS, (2, 2), False
    if net_type == "squeeze":
        return SQUEEZE_CONVS, SQUEEZE_FIRES, SQUEEZE_POOLS, SQUEEZE_LEN, \
            SQUEEZE_TAPS, SQUEEZE_CHANNELS, (3, 2), True
    raise NotImplementedError(f"net_type {net_type!r} (alex|vgg|squeeze)")


def features(params, x, net_type: str = "alex") -> List[jnp.ndarray]:
    """x: [N,3,H,W] in [-1,1] → list of unit-normalized tap activations.

    Layer walk mirrors the reference BaseNet.forward (networks.py:54-62):
    enumerate from 1, tap AFTER applying the layer when index ∈ taps."""
    convs, fires, pools, length, taps, _, pool_ks, ceil = _net_spec(net_type)
    x = _z_score(x)
    out = []
    for idx in range(length):
        if idx in convs:
            c, k, s, pad = convs[idx]
            x = _conv(x, params[f"features.{idx}"], s, pad)
        elif idx in fires:
            x = _fire(x, params[f"features.{idx}"])
        elif idx in pools:
            x = _maxpool(x, pool_ks[0], pool_ks[1], ceil)
        else:  # ReLU
            x = jnp.maximum(x, 0)
        if (idx + 1) in taps:
            out.append(normalize_activation(x))
        if len(out) == len(taps):
            break
    return out


def lpips_channels(net_type: str = "alex") -> Sequence[int]:
    return _net_spec(net_type)[5]


def init_backbone(key, net_type: str = "alex") -> Dict[str, Any]:
    convs, fires, *_ = _net_spec(net_type)
    params = {}
    in_c = 3
    ks = iter(jax.random.split(key, len(convs) + 3 * len(fires)))

    def _he(shape):
        fan = shape[1] * shape[2] * shape[3]
        return {"weight": jax.random.normal(next(ks), shape) *
                np.sqrt(2.0 / fan), "bias": jnp.zeros((shape[0],))}

    for idx in sorted({**convs, **fires}):
        if idx in convs:
            c, k, s, pad = convs[idx]
            params[f"features.{idx}"] = _he((c, in_c, k, k))
            in_c = c
        else:
            fin, sq, e1, e3 = fires[idx]
            params[f"features.{idx}"] = {
                "squeeze": _he((sq, fin, 1, 1)),
                "expand1x1": _he((e1, sq, 1, 1)),
                "expand3x3": _he((e3, sq, 3, 3)),
            }
            in_c = e1 + e3
    return params


def backbone_from_torch_state(state: Dict[str, np.ndarray],
                              net_type: str = "alex") -> Dict[str, Any]:
    convs, fires, *_ = _net_spec(net_type)
    params = {}
    for idx in sorted(convs):
        params[f"features.{idx}"] = {
            "weight": jnp.asarray(state[f"features.{idx}.weight"]),
            "bias": jnp.asarray(state[f"features.{idx}.bias"]),
        }
    for idx in sorted(fires):
        params[f"features.{idx}"] = {
            part: {"weight": jnp.asarray(state[f"features.{idx}.{part}.weight"]),
                   "bias": jnp.asarray(state[f"features.{idx}.{part}.bias"])}
            for part in ("squeeze", "expand1x1", "expand3x3")
        }
    return params
