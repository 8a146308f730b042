"""torchvision-style ResNet-50 in functional JAX (MoCo feature backbone).

Behavioral contract: the torchvision resnet50 consumed by
/root/reference/encoder4editing/criteria/moco_loss.py:18-40 (final fc
removed, global average pool output).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

RESNET50_LAYERS = (3, 4, 6, 3)


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None].astype(x.dtype) + \
        bias[None, :, None, None].astype(x.dtype)


def _bottleneck(p, x, stride=1):
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1_weight"])))
    out = jax.nn.relu(_bn(p["bn2"], _conv(out, p["conv2_weight"],
                                          stride=stride, padding=1)))
    out = _bn(p["bn3"], _conv(out, p["conv3_weight"]))
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["1"],
                       _conv(x, p["downsample"]["0_weight"], stride=stride))
    return jax.nn.relu(out + identity)


def resnet50_features(params, x):
    """x: [N,3,224,224] → pooled features [N, 2048]."""
    x = _conv(x, params["conv1_weight"], stride=2, padding=3)
    x = jax.nn.relu(_bn(params["bn1"], x))
    # maxpool 3x3 stride 2 pad 1
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)),
                constant_values=-np.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
    for li, depth in enumerate(RESNET50_LAYERS):
        layer = params[f"layer{li + 1}"]
        stride = 1 if li == 0 else 2
        for bi in range(depth):
            x = _bottleneck(layer[f"{bi}"], x, stride=stride if bi == 0 else 1)
    return jnp.mean(x, axis=(2, 3))


def _bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def init_resnet50_params(key) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 64))

    def he(k, shape):
        fan = int(np.prod(shape[1:]))
        return jax.random.normal(k, shape) * np.sqrt(2.0 / fan)

    params: Dict[str, Any] = {
        "conv1_weight": he(next(ks), (64, 3, 7, 7)),
        "bn1": _bn_init(64),
    }
    cin = 64
    for li, depth in enumerate(RESNET50_LAYERS):
        cmid = 64 * (2 ** li)
        layer = {}
        for bi in range(depth):
            stride = (1 if li == 0 else 2) if bi == 0 else 1
            bp = {
                "conv1_weight": he(next(ks), (cmid, cin, 1, 1)),
                "bn1": _bn_init(cmid),
                "conv2_weight": he(next(ks), (cmid, cmid, 3, 3)),
                "bn2": _bn_init(cmid),
                "conv3_weight": he(next(ks), (cmid * 4, cmid, 1, 1)),
                "bn3": _bn_init(cmid * 4),
            }
            if bi == 0:
                bp["downsample"] = {"0_weight": he(next(ks), (cmid * 4, cin, 1, 1)),
                                    "1": _bn_init(cmid * 4)}
            layer[f"{bi}"] = bp
            cin = cmid * 4
        params[f"layer{li + 1}"] = layer
    return params


def resnet50_from_torch_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map torchvision resnet50 names (after the moco encoder_q prefix strip
    the reference does, moco_loss.py:28-35)."""
    t = {k: jnp.asarray(v) for k, v in state.items()}

    def bn(prefix):
        return {k: t[f"{prefix}.{k}"] for k in
                ("weight", "bias", "running_mean", "running_var")}

    params = {"conv1_weight": t["conv1.weight"], "bn1": bn("bn1")}
    for li, depth in enumerate(RESNET50_LAYERS):
        layer = {}
        for bi in range(depth):
            pfx = f"layer{li + 1}.{bi}"
            bp = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}_weight"] = t[f"{pfx}.conv{ci}.weight"]
                bp[f"bn{ci}"] = bn(f"{pfx}.bn{ci}")
            if f"{pfx}.downsample.0.weight" in t:
                bp["downsample"] = {"0_weight": t[f"{pfx}.downsample.0.weight"],
                                    "1": bn(f"{pfx}.downsample.1")}
            layer[f"{bi}"] = bp
        params[f"layer{li + 1}"] = layer
    return params
