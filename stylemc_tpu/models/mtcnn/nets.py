"""MTCNN P/R/O networks in functional JAX.

Behavioral contract: /root/reference/MTCNN/get_nets.py — three small
conv/PReLU cascades; the flatten transposes H/W before reshaping (get_nets
Flatten, :22 — required by the original Caffe weight layout); ceil-mode max
pooling. Weights load from the in-tree .npy dicts keyed by torch parameter
names (get_nets.py:54-56 et al.).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"][None, :, None, None].astype(x.dtype)


def _prelu(p, x):
    a = p.astype(x.dtype)
    if x.ndim == 4:
        a = a[None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def _maxpool_ceil(x, k, s):
    """MaxPool2d(k, s, ceil_mode=True): pad high edges so ceil division holds."""
    h, w = x.shape[2], x.shape[3]
    out_h = -(-max(h - k, 0) // s) + 1
    out_w = -(-max(w - k, 0) // s) + 1
    pad_h = max((out_h - 1) * s + k - h, 0)
    pad_w = max((out_w - 1) * s + k - w, 0)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                    constant_values=-np.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, k, k), (1, 1, s, s), "VALID")


def _linear(x, p):
    return x @ p["weight"].T.astype(x.dtype) + p["bias"].astype(x.dtype)


def _flatten_caffe(x):
    """transpose(3,2) before flatten (reference Flatten, get_nets.py:10-24)."""
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(x.shape[0], -1)


def pnet_apply(p, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [N,3,H,W] → (offsets [N,4,h,w], probs [N,2,h,w])."""
    x = _prelu(p["features.prelu1.weight"],
               _conv(x, {"weight": p["features.conv1.weight"],
                         "bias": p["features.conv1.bias"]}))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(p["features.prelu2.weight"],
               _conv(x, {"weight": p["features.conv2.weight"],
                         "bias": p["features.conv2.bias"]}))
    x = _prelu(p["features.prelu3.weight"],
               _conv(x, {"weight": p["features.conv3.weight"],
                         "bias": p["features.conv3.bias"]}))
    a = _conv(x, {"weight": p["conv4_1.weight"], "bias": p["conv4_1.bias"]})
    b = _conv(x, {"weight": p["conv4_2.weight"], "bias": p["conv4_2.bias"]})
    return b, jax.nn.softmax(a, axis=1)


def rnet_apply(p, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [N,3,24,24] → (offsets [N,4], probs [N,2])."""
    x = _prelu(p["features.prelu1.weight"],
               _conv(x, {"weight": p["features.conv1.weight"],
                         "bias": p["features.conv1.bias"]}))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(p["features.prelu2.weight"],
               _conv(x, {"weight": p["features.conv2.weight"],
                         "bias": p["features.conv2.bias"]}))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(p["features.prelu3.weight"],
               _conv(x, {"weight": p["features.conv3.weight"],
                         "bias": p["features.conv3.bias"]}))
    x = _flatten_caffe(x)
    x = _prelu(p["features.prelu4.weight"],
               _linear(x, {"weight": p["features.conv4.weight"],
                           "bias": p["features.conv4.bias"]}))
    a = _linear(x, {"weight": p["conv5_1.weight"], "bias": p["conv5_1.bias"]})
    b = _linear(x, {"weight": p["conv5_2.weight"], "bias": p["conv5_2.bias"]})
    return b, jax.nn.softmax(a, axis=1)


def onet_apply(p, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x [N,3,48,48] → (landmarks [N,10], offsets [N,4], probs [N,2])."""
    x = _prelu(p["features.prelu1.weight"],
               _conv(x, {"weight": p["features.conv1.weight"],
                         "bias": p["features.conv1.bias"]}))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(p["features.prelu2.weight"],
               _conv(x, {"weight": p["features.conv2.weight"],
                         "bias": p["features.conv2.bias"]}))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(p["features.prelu3.weight"],
               _conv(x, {"weight": p["features.conv3.weight"],
                         "bias": p["features.conv3.bias"]}))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(p["features.prelu4.weight"],
               _conv(x, {"weight": p["features.conv4.weight"],
                         "bias": p["features.conv4.bias"]}))
    x = _flatten_caffe(x)
    x = _prelu(p["features.prelu5.weight"],
               _linear(x, {"weight": p["features.conv5.weight"],
                           "bias": p["features.conv5.bias"]}))
    a = _linear(x, {"weight": p["conv6_1.weight"], "bias": p["conv6_1.bias"]})
    b = _linear(x, {"weight": p["conv6_2.weight"], "bias": p["conv6_2.bias"]})
    c = _linear(x, {"weight": p["conv6_3.weight"], "bias": p["conv6_3.bias"]})
    return c, b, jax.nn.softmax(a, axis=1)


def load_net_weights(path: str) -> Dict[str, jnp.ndarray]:
    """Load a {p,r,o}net.npy dict (torch-named arrays)."""
    weights = np.load(path, allow_pickle=True)[()]
    return {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in weights.items()}


# Shapes for random init (tests without the weight files).
_PNET_SHAPES = {
    "features.conv1": (10, 3, 3, 3), "features.conv2": (16, 10, 3, 3),
    "features.conv3": (32, 16, 3, 3), "conv4_1": (2, 32, 1, 1),
    "conv4_2": (4, 32, 1, 1),
}
_RNET_SHAPES = {
    "features.conv1": (28, 3, 3, 3), "features.conv2": (48, 28, 3, 3),
    "features.conv3": (64, 48, 2, 2), "features.conv4": (128, 576),
    "conv5_1": (2, 128), "conv5_2": (4, 128),
}
_ONET_SHAPES = {
    "features.conv1": (32, 3, 3, 3), "features.conv2": (64, 32, 3, 3),
    "features.conv3": (64, 64, 3, 3), "features.conv4": (128, 64, 2, 2),
    "features.conv5": (256, 1152),
    "conv6_1": (2, 256), "conv6_2": (4, 256), "conv6_3": (10, 256),
}


def init_net_params(key, which: str) -> Dict[str, jnp.ndarray]:
    shapes = {"pnet": _PNET_SHAPES, "rnet": _RNET_SHAPES,
              "onet": _ONET_SHAPES}[which]
    params = {}
    ks = iter(jax.random.split(key, len(shapes) * 2 + 8))
    for name, shape in shapes.items():
        fan = int(np.prod(shape[1:]))
        params[f"{name}.weight"] = jax.random.normal(next(ks), shape) / np.sqrt(fan)
        params[f"{name}.bias"] = jnp.zeros((shape[0],))
    # PReLU slopes
    prelu_chans = {
        "pnet": {"features.prelu1": 10, "features.prelu2": 16,
                 "features.prelu3": 32},
        "rnet": {"features.prelu1": 28, "features.prelu2": 48,
                 "features.prelu3": 64, "features.prelu4": 128},
        "onet": {"features.prelu1": 32, "features.prelu2": 64,
                 "features.prelu3": 64, "features.prelu4": 128,
                 "features.prelu5": 256},
    }[which]
    for name, c in prelu_chans.items():
        params[f"{name}.weight"] = jnp.full((c,), 0.25)
    return params
