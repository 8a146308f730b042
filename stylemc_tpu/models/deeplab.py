"""DeepLabV3 ResNet-101 face parser (weight-standardized convs + GroupNorm)
in functional JAX, plus the CelebAMask mask extraction used for feature
blending.

Behavioral contracts:
  * /root/reference/deeplab.py:26-212 — WS-Conv (per-filter mean/std
    normalization of weights at runtime), GroupNorm(32), ResNet-101 with
    layer4 at stride 1 / dilation 2, ASPP (rates 6/12/18 + image pooling),
    bilinear align_corners upsampling to input size.
  * /root/reference/run_deeplab.py:25-167 — 19 CelebAMask classes, 513²
    ImageNet-normalized input, argmax → nearest-resize to the output
    resolution, morphology-based bg/earring/mouth/teeth masks.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

CLASSES = ["background", "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow",
           "r_brow", "l_ear", "r_ear", "mouth", "u_lip", "l_lip", "hair",
           "hat", "ear_r", "neck_l", "neck", "cloth"]
RESNET101_LAYERS = (3, 4, 23, 3)


def _ws_conv(x, w, stride=1, padding=0, dilation=1, eps=1e-5):
    """Weight-standardized conv (reference deeplab.py:33-43): subtract the
    per-filter mean and divide by the per-filter std (torch std: unbiased)."""
    wf = w.astype(jnp.float32)
    mean = jnp.mean(wf, axis=(1, 2, 3), keepdims=True)
    wf = wf - mean
    n = wf[0].size
    var = jnp.sum(jnp.square(wf), axis=(1, 2, 3), keepdims=True) / (n - 1)
    wf = wf / (jnp.sqrt(var) + eps)
    return jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _group_norm(p, x, num_groups=32, eps=1e-5):
    n, c, h, w = x.shape
    while c % num_groups != 0:  # reduced (test) widths: largest divisor ≤ 32
        num_groups -= 1
    xg = x.reshape(n, num_groups, c // num_groups, h, w)
    mu = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, c, h, w)
    return x * p["weight"][None, :, None, None].astype(x.dtype) + \
        p["bias"][None, :, None, None].astype(x.dtype)


def _bilinear_ac(x, out_h, out_w):
    from ..models.e4e.encoders import _bilinear_ac_matrix

    ky = jnp.asarray(_bilinear_ac_matrix(x.shape[-2], out_h))
    kx = jnp.asarray(_bilinear_ac_matrix(x.shape[-1], out_w))
    x = jnp.einsum("oh,nchw->ncow", ky.astype(x.dtype), x)
    return jnp.einsum("ow,nchw->ncho", kx.astype(x.dtype), x)


def _bottleneck(p, x, stride=1, dilation=1):
    out = jax.nn.relu(_group_norm(p["bn1"], _ws_conv(x, p["conv1_weight"])))
    out = jax.nn.relu(_group_norm(p["bn2"], _ws_conv(
        out, p["conv2_weight"], stride=stride, padding=dilation,
        dilation=dilation)))
    out = _group_norm(p["bn3"], _ws_conv(out, p["conv3_weight"]))
    residual = x
    if "downsample" in p:
        residual = _group_norm(p["downsample"]["1"],
                               _ws_conv(x, p["downsample"]["0_weight"],
                                        stride=stride))
    return jax.nn.relu(out + residual)


def _aspp(p, x, num_classes):
    x1 = jax.nn.relu(_group_norm(p["aspp1_bn"], _ws_conv(x, p["aspp1_weight"])))
    x2 = jax.nn.relu(_group_norm(p["aspp2_bn"], _ws_conv(
        x, p["aspp2_weight"], padding=6, dilation=6)))
    x3 = jax.nn.relu(_group_norm(p["aspp3_bn"], _ws_conv(
        x, p["aspp3_weight"], padding=12, dilation=12)))
    x4 = jax.nn.relu(_group_norm(p["aspp4_bn"], _ws_conv(
        x, p["aspp4_weight"], padding=18, dilation=18)))
    x5 = jnp.mean(x, axis=(2, 3), keepdims=True)
    x5 = jax.nn.relu(_group_norm(p["aspp5_bn"], _ws_conv(x5, p["aspp5_weight"])))
    x5 = jnp.broadcast_to(x5, x5.shape[:2] + x.shape[2:])
    h = jnp.concatenate([x1, x2, x3, x4, x5], axis=1)
    h = jax.nn.relu(_group_norm(p["bn2"], _ws_conv(h, p["conv2_weight"])))
    # conv3 is a PLAIN conv with bias (deeplab.py:74)
    out = jax.lax.conv_general_dilated(
        h, p["conv3_weight"].astype(h.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["conv3_bias"][None, :, None, None].astype(h.dtype)


def deeplab_apply(params, x, num_classes: int = len(CLASSES)):
    """x: [N,3,513,513] ImageNet-normalized → logits [N,19,513,513]."""
    size = (x.shape[2], x.shape[3])
    x = jax.nn.relu(_group_norm(params["bn1"],
                                _ws_conv(x, params["conv1_weight"], stride=2,
                                         padding=3)))
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-np.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
    strides = (1, 2, 2, 1)
    dilations = (1, 1, 1, 2)
    depths = [len(params[f"layer{li + 1}"]) for li in range(4)]
    for li, depth in enumerate(depths):
        layer = params[f"layer{li + 1}"]
        # first block: dilation = max(1, d/2) (deeplab.py:186-189)
        d_first = max(1, dilations[li] // 2)
        x = _bottleneck(layer["0"], x, stride=strides[li], dilation=d_first)
        if depth == 1:
            continue
        # Blocks 1..depth-1 are identical (stride 1, same dilation/channels,
        # no downsample): one lax.scan over stacked params compiles the
        # bottleneck body once per stage instead of inlining it depth-1
        # times (ResNet-101 stage 3: 22 blocks). Identical numerics.
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[layer[f"{bi}"] for bi in range(1, depth)])
        dil = dilations[li]

        def _step(h, bp, _d=dil):
            return _bottleneck(bp, h, stride=1, dilation=_d), None

        x, _ = jax.lax.scan(_step, x, stacked)
    x = _aspp(params["aspp"], x, num_classes)
    return _bilinear_ac(x, size[0], size[1])


# ----------------------------------------------------------------- weights


def params_from_torch_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    t = {k: jnp.asarray(v) for k, v in state.items()}

    def gn(prefix):
        return {"weight": t[f"{prefix}.weight"], "bias": t[f"{prefix}.bias"]}

    params: Dict[str, Any] = {"conv1_weight": t["conv1.weight"],
                              "bn1": gn("bn1")}
    for li, depth in enumerate(RESNET101_LAYERS):
        layer = {}
        for bi in range(depth):
            pfx = f"layer{li + 1}.{bi}"
            bp = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}_weight"] = t[f"{pfx}.conv{ci}.weight"]
                bp[f"bn{ci}"] = gn(f"{pfx}.bn{ci}")
            if f"{pfx}.downsample.0.weight" in t:
                bp["downsample"] = {"0_weight": t[f"{pfx}.downsample.0.weight"],
                                    "1": gn(f"{pfx}.downsample.1")}
            layer[f"{bi}"] = bp
        params[f"layer{li + 1}"] = layer
    aspp = {}
    for i in range(1, 6):
        aspp[f"aspp{i}_weight"] = t[f"aspp.aspp{i}.weight"]
        aspp[f"aspp{i}_bn"] = gn(f"aspp.aspp{i}_bn")
    aspp["conv2_weight"] = t["aspp.conv2.weight"]
    aspp["bn2"] = gn("aspp.bn2")
    aspp["conv3_weight"] = t["aspp.conv3.weight"]
    aspp["conv3_bias"] = t["aspp.conv3.bias"]
    params["aspp"] = aspp
    return params


def init_deeplab_params(key, num_classes: int = len(CLASSES),
                        layers=RESNET101_LAYERS, width: int = 64) -> Dict[str, Any]:
    """Random init (tests / smoke). `layers`/`width` may be reduced."""
    ks = iter(jax.random.split(key, 512))

    def he(shape):
        n = shape[0] * shape[2] * shape[3]
        return jax.random.normal(next(ks), shape) * np.sqrt(2.0 / n)

    def gn_init(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    params: Dict[str, Any] = {"conv1_weight": he((width, 3, 7, 7)),
                              "bn1": gn_init(width)}
    cin = width
    for li, depth in enumerate(layers):
        cmid = width * (2 ** li)
        layer = {}
        for bi in range(depth):
            bp = {
                "conv1_weight": he((cmid, cin, 1, 1)), "bn1": gn_init(cmid),
                "conv2_weight": he((cmid, cmid, 3, 3)), "bn2": gn_init(cmid),
                "conv3_weight": he((cmid * 4, cmid, 1, 1)),
                "bn3": gn_init(cmid * 4),
            }
            if bi == 0:
                bp["downsample"] = {"0_weight": he((cmid * 4, cin, 1, 1)),
                                    "1": gn_init(cmid * 4)}
            layer[f"{bi}"] = bp
            cin = cmid * 4
        params[f"layer{li + 1}"] = layer
    depthc = 256 if width == 64 else width
    aspp = {}
    for i in (1, 5):
        aspp[f"aspp{i}_weight"] = he((depthc, cin, 1, 1))
    for i in (2, 3, 4):
        aspp[f"aspp{i}_weight"] = he((depthc, cin, 3, 3))
    for i in range(1, 6):
        aspp[f"aspp{i}_bn"] = gn_init(depthc)
    aspp["conv2_weight"] = he((depthc, depthc * 5, 1, 1))
    aspp["bn2"] = gn_init(depthc)
    aspp["conv3_weight"] = he((num_classes, depthc, 1, 1))
    aspp["conv3_bias"] = jnp.zeros((num_classes,))
    params["aspp"] = aspp
    return params


# ----------------------------------------------------------- mask extraction


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Segmenter:
    """Host-facing face parser with the reference's mask morphology
    (run_deeplab.py:101-135)."""

    def __init__(self, params, resolution: int = 512, num_groups: int = 32,
                 layers=RESNET101_LAYERS):
        self.params = params
        self.resolution = resolution
        # params routed as a jit argument (weight literals in the HLO break
        # remote-compile request limits)
        self._apply = jax.jit(deeplab_apply)

    def segment(self, img_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC → class-index map at self.resolution (nearest)."""
        from PIL import Image

        img = Image.fromarray(img_u8).resize((513, 513), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        x = jnp.asarray(x.transpose(2, 0, 1)[None], jnp.float32)
        logits = np.asarray(self._apply(self.params, x))
        pred = logits[0].argmax(axis=0).astype(np.uint8)
        mask = Image.fromarray(pred).resize((self.resolution, self.resolution),
                                            Image.NEAREST)
        return np.asarray(mask)

    def get_bg_mask(self, img_u8: np.ndarray) -> np.ndarray:
        import cv2

        mask = self.segment(img_u8)
        hair = (cv2.dilate((mask == CLASSES.index("hair")).astype("float"),
                           np.ones((10, 10))) > 0)
        bg = (mask == CLASSES.index("background")) | \
             (mask == CLASSES.index("cloth"))
        bg = (cv2.erode(bg.astype("float"), np.ones((20, 20))) > 0)
        bg[hair] = 0
        return bg

    def get_earring_mouth_teeth_masks(self, img_u8: np.ndarray,
                                      need_earring_mask: bool = True):
        import cv2

        mask = self.segment(img_u8)
        earring = (cv2.dilate((mask == CLASSES.index("ear_r")).astype("float"),
                              np.ones((15, 15))) > 0)
        mouth = mask == CLASSES.index("mouth")
        lips = (mask == CLASSES.index("u_lip")) | \
               (mask == CLASSES.index("l_lip"))
        teeth = (cv2.erode(mouth.astype("float"), np.ones((3, 3))) > 0)
        mouth = (cv2.dilate((mouth | lips).astype("float"),
                            np.ones((7, 7))) > 0)
        if need_earring_mask:
            return earring, mouth, teeth
        return None, mouth, teeth


def default_segmenter(ckpt_path: Optional[str] = None,
                      resolution: int = 512) -> Segmenter:
    """Load from STYLEMC_DEEPLAB (deeplab_model.pth; 'module.'-prefixed
    state_dict as the reference strips at run_deeplab.py:90)."""
    ckpt_path = ckpt_path or os.environ.get("STYLEMC_DEEPLAB")
    if not ckpt_path or not os.path.exists(ckpt_path):
        raise FileNotFoundError("set STYLEMC_DEEPLAB to deeplab_model.pth")
    from ..io import load_state_dict_numpy

    state = load_state_dict_numpy(ckpt_path, key="state_dict")
    state = {(k[7:] if k.startswith("module.") else k): v
             for k, v in state.items() if "tracked" not in k}
    return Segmenter(params_from_torch_state(state), resolution=resolution)


def read_image_mask(mask_path: str, mask_min_value: float = 0.0,
                    dilation: bool = True) -> np.ndarray:
    """Load a saved parsing mask and binarize for blending
    (reference utils.py:219-228)."""
    import cv2
    from PIL import Image

    segm = np.array(Image.open(mask_path))
    keep = ((segm == 0) | (segm == 13) | (segm == 14) | (segm == 8) |
            (segm == 9) | (segm == 15) | (segm == 16) | (segm == 18))
    out = segm.astype("float")
    out[keep] = mask_min_value
    out[~keep] = 1
    if dilation:
        out = cv2.dilate(out, np.ones((20, 20)), iterations=3)
    return out.astype(np.float32)
