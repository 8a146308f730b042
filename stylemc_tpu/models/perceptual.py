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


def _conv(x, p, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"][None, :, None, None].astype(x.dtype)


def _maxpool(x, k, s):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, k, k), (1, 1, s, s), "VALID")


def normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / (norm + eps)


def _z_score(x):
    mean = jnp.asarray(LPIPS_SHIFT, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(LPIPS_SCALE, x.dtype).reshape(1, 3, 1, 1)
    return (x - mean) / std


def _net_spec(net_type: str):
    if net_type == "alex":
        return ALEXNET_CONVS, ALEXNET_POOLS, ALEXNET_LEN, ALEXNET_TAPS, \
            ALEXNET_CHANNELS, (3, 2)
    if net_type == "vgg":
        return VGG16_CONVS, VGG16_POOLS, VGG16_LEN, VGG16_TAPS, \
            VGG16_CHANNELS, (2, 2)
    raise NotImplementedError(f"net_type {net_type!r} (alex|vgg)")


def features(params, x, net_type: str = "alex") -> List[jnp.ndarray]:
    """x: [N,3,H,W] in [-1,1] → list of unit-normalized tap activations.

    Layer walk mirrors the reference BaseNet.forward (networks.py:54-62):
    enumerate from 1, tap AFTER applying the layer when index ∈ taps."""
    convs, pools, length, taps, _, pool_ks = _net_spec(net_type)
    x = _z_score(x)
    out = []
    for idx in range(length):
        if idx in convs:
            c, k, s, pad = convs[idx]
            x = _conv(x, params[f"features.{idx}"], s, pad)
        elif idx in pools:
            x = _maxpool(x, pool_ks[0], pool_ks[1])
        else:  # ReLU
            x = jnp.maximum(x, 0)
        if (idx + 1) in taps:
            out.append(normalize_activation(x))
        if len(out) == len(taps):
            break
    return out


def lpips_channels(net_type: str = "alex") -> Sequence[int]:
    return _net_spec(net_type)[4]


def init_backbone(key, net_type: str = "alex") -> Dict[str, Any]:
    convs, _, _, _, _, _ = _net_spec(net_type)
    params = {}
    in_c = 3
    ks = iter(jax.random.split(key, len(convs)))
    for idx in sorted(convs):
        c, k, s, pad = convs[idx]
        fan = in_c * k * k
        params[f"features.{idx}"] = {
            "weight": jax.random.normal(next(ks), (c, in_c, k, k)) *
            np.sqrt(2.0 / fan),
            "bias": jnp.zeros((c,)),
        }
        in_c = c
    return params


def backbone_from_torch_state(state: Dict[str, np.ndarray],
                              net_type: str = "alex") -> Dict[str, Any]:
    convs = _net_spec(net_type)[0]
    params = {}
    for idx in sorted(convs):
        params[f"features.{idx}"] = {
            "weight": jnp.asarray(state[f"features.{idx}.weight"]),
            "bias": jnp.asarray(state[f"features.{idx}.bias"]),
        }
    return params
