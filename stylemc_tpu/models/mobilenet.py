"""MobileNetV2 + global-depthwise-conv landmark head in functional JAX.

Behavioral contract: /root/reference/mobilenet_facial.py:55-68 —
torchvision mobilenet_v2 features (inverted residuals, ReLU6), then a
linear 7x7 depthwise ConvBlock and a linear 1x1 ConvBlock to 136 outputs
(68 landmarks · 2), flattened. 224² input → 7² final feature map.

Weight import accepts the reference checkpoint namespace
(mobilenet_224_model_best_gdconv_external.pth.tar, saved from a
DataParallel wrapper: 'module.' prefix, with both 'pretrain_net.features.*'
and 'base_net.0.*' aliases).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision MobileNetV2 inverted-residual settings: (t, c, n, s)
MOBILENET_V2_SETTINGS = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


def _conv(x, w, stride=1, padding=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None].astype(x.dtype) + \
        bias[None, :, None, None].astype(x.dtype)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _conv_bn_relu(p, x, stride, groups=1, k=3):
    x = _conv(x, p["conv"], stride=stride, padding=(k - 1) // 2, groups=groups)
    return _relu6(_bn(p["bn"], x))


def _inverted_residual(p, x, t, stride):
    identity = x
    h = x
    if t != 1:
        h = _conv_bn_relu(p["expand"], h, 1, k=1)
    dw_groups = h.shape[1]
    h = _conv_bn_relu(p["dw"], h, stride, groups=dw_groups, k=3)
    h = _bn(p["project_bn"], _conv(h, p["project_conv"]))
    if stride == 1 and identity.shape[1] == h.shape[1]:
        return identity + h
    return h


def _block_layout() -> List[Tuple[int, int]]:
    """(expand_ratio, stride) per inverted-residual block in order."""
    out = []
    for t, c, n, s in MOBILENET_V2_SETTINGS:
        for i in range(n):
            out.append((t, s if i == 0 else 1))
    return out


def mobilenet_gdconv_apply(params, x, num_classes: int = 136):
    """x: [N,3,224,224] ImageNet-normalized → landmarks [N, 136]."""
    x = _conv_bn_relu(params["stem"], x, 2, k=3)
    for i, (t, s) in enumerate(_block_layout()):
        x = _inverted_residual(params["blocks"][f"{i}"], x, t, s)
    x = _conv_bn_relu(params["head"], x, 1, k=1)
    # linear7: depthwise KxK (K = spatial size, 7 for 224 input), BN, linear
    x = _bn(params["linear7"]["bn"],
            _conv(x, params["linear7"]["conv"], groups=x.shape[1]))
    x = _bn(params["linear1"]["bn"], _conv(x, params["linear1"]["conv"]))
    return x.reshape(x.shape[0], -1)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# --------------------------------------------------------------------- init


def _bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def init_mobilenet_gdconv_params(key, num_classes: int = 136,
                                 gd_kernel: int = 7) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 200))

    def he(shape):
        fan = int(np.prod(shape[1:]))
        return jax.random.normal(next(ks), shape) * np.sqrt(2.0 / max(fan, 1))

    params: Dict[str, Any] = {
        "stem": {"conv": he((32, 3, 3, 3)), "bn": _bn_init(32)},
        "blocks": {},
    }
    cin = 32
    i = 0
    for t, c, n, s in MOBILENET_V2_SETTINGS:
        for j in range(n):
            hidden = cin * t
            bp: Dict[str, Any] = {}
            if t != 1:
                bp["expand"] = {"conv": he((hidden, cin, 1, 1)),
                                "bn": _bn_init(hidden)}
            bp["dw"] = {"conv": he((hidden, 1, 3, 3)), "bn": _bn_init(hidden)}
            bp["project_conv"] = he((c, hidden, 1, 1))
            bp["project_bn"] = _bn_init(c)
            params["blocks"][f"{i}"] = bp
            cin = c
            i += 1
    params["head"] = {"conv": he((1280, 320, 1, 1)), "bn": _bn_init(1280)}
    params["linear7"] = {"conv": he((1280, 1, gd_kernel, gd_kernel)),
                         "bn": _bn_init(1280)}
    params["linear1"] = {"conv": he((num_classes, 1280, 1, 1)),
                         "bn": _bn_init(num_classes)}
    return params


# ------------------------------------------------------------- torch import


def params_from_torch_state(state: Dict[str, np.ndarray],
                            num_classes: int = 136) -> Dict[str, Any]:
    # strip DataParallel prefix; prefer base_net aliases.
    t = {}
    for k, v in state.items():
        k = k[len("module."):] if k.startswith("module.") else k
        t[k] = jnp.asarray(v)

    def feat(name):
        for root in ("base_net.0", "pretrain_net.features"):
            key = f"{root}.{name}"
            if key in t:
                return t[key]
        raise KeyError(name)

    def bn(prefix):
        return {k: feat(f"{prefix}.{k}") for k in
                ("weight", "bias", "running_mean", "running_var")}

    params: Dict[str, Any] = {
        "stem": {"conv": feat("0.0.weight"), "bn": bn("0.1")},
        "blocks": {},
    }
    layout = _block_layout()
    for i, (t_ratio, s) in enumerate(layout):
        fi = i + 1  # features index
        bp: Dict[str, Any] = {}
        if t_ratio != 1:
            bp["expand"] = {"conv": feat(f"{fi}.conv.0.0.weight"),
                            "bn": bn(f"{fi}.conv.0.1")}
            bp["dw"] = {"conv": feat(f"{fi}.conv.1.0.weight"),
                        "bn": bn(f"{fi}.conv.1.1")}
            bp["project_conv"] = feat(f"{fi}.conv.2.weight")
            bp["project_bn"] = bn(f"{fi}.conv.3")
        else:
            bp["dw"] = {"conv": feat(f"{fi}.conv.0.0.weight"),
                        "bn": bn(f"{fi}.conv.0.1")}
            bp["project_conv"] = feat(f"{fi}.conv.1.weight")
            bp["project_bn"] = bn(f"{fi}.conv.2")
        params["blocks"][f"{i}"] = bp
    params["head"] = {"conv": feat("18.0.weight"), "bn": bn("18.1")}

    def top(name):
        return t[name]

    params["linear7"] = {"conv": top("linear7.conv.weight"),
                         "bn": {k: top(f"linear7.bn.{k}") for k in
                                ("weight", "bias", "running_mean",
                                 "running_var")}}
    params["linear1"] = {"conv": top("linear1.conv.weight"),
                         "bn": {k: top(f"linear1.bn.{k}") for k in
                                ("weight", "bias", "running_mean",
                                 "running_var")}}
    return params
