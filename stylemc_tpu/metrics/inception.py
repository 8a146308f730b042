"""InceptionV3 feature extractor in functional JAX (FID/KID/IS detector).

Behavioral contract: the Inception-2015 feature detector consumed by the
reference metrics (/root/reference/metrics/metric_utils.py:40-50 downloads a
TorchScript build of the original TF graph; frechet_inception_distance
.py:22). Two selectable variants share this graph code:

  variant="fid2015" (DEFAULT — matches the reference detector): the
    Inception-2015 TF graph as encoded by the NVIDIA/pytorch-fid port:
    1008-way logits and the TF pooling quirks — A/C blocks and Mixed_7b
    average-pool with count_include_pad=False, Mixed_7c's pool branch is a
    MAX pool. FID numbers from this variant are comparable to
    stylegan2-ada-published / reference-computed FIDs (given the ported
    Inception-2015 weights, e.g. pytorch-fid's pt_inception-2015-12-05
    state dict).
  variant="tv": the torchvision inception_v3 graph (1000-way fc,
    count_include_pad avg pools) for torchvision-weight users. NOT
    comparable to reference FIDs.

Common structure: BasicConv2d = conv + BN(eps 1e-3) + ReLU; A/B/C/D/E
blocks; 2048-d pool3 features; fc logits. Weight import from a
torchvision-layout state dict (pytorch-fid's detector weights use the same
names).

Input: uint8 [N, H, W, 3] → resized to 299² (bilinear) and scaled to
[-1, 1] (TF preprocessing).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, stride=1, padding=0):
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p, x, eps=1e-3):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None].astype(x.dtype) + \
        bias[None, :, None, None].astype(x.dtype)


def _basic(p, x, stride=1, padding=0):
    return jax.nn.relu(_bn(p["bn"], _conv(x, p["conv_weight"], stride, padding)))


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, k, k), (1, 1, s, s), "VALID")


def _avgpool3(x, count_include_pad: bool = True):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1)])
    if count_include_pad:
        return s / 9.0
    # TF 'SAME' avg pooling divides by the number of VALID taps per window
    # (count_include_pad=False) — the Inception-2015 quirk pytorch-fid's
    # FIDInceptionA/C/E_1 reproduce.
    ones = jnp.ones((1, 1, x.shape[2], x.shape[3]), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1)])
    return s / cnt


def _maxpool3s1(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 1, 1),
                                 [(0, 0), (0, 0), (1, 1), (1, 1)])


def _inception_a(p, x, fid: bool = False):
    b1 = _basic(p["branch1x1"], x)
    b5 = _basic(p["branch5x5_1"], x)
    b5 = _basic(p["branch5x5_2"], b5, padding=2)
    b3 = _basic(p["branch3x3dbl_1"], x)
    b3 = _basic(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _basic(p["branch3x3dbl_3"], b3, padding=1)
    bp = _basic(p["branch_pool"], _avgpool3(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, x, fid: bool = False):
    del fid  # no pooling-variant difference in reduction block B
    b3 = _basic(p["branch3x3"], x, stride=2)
    bd = _basic(p["branch3x3dbl_1"], x)
    bd = _basic(p["branch3x3dbl_2"], bd, padding=1)
    bd = _basic(p["branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, x, fid: bool = False):
    b1 = _basic(p["branch1x1"], x)
    b7 = _basic(p["branch7x7_1"], x)
    b7 = _basic(p["branch7x7_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = _basic(p["branch7x7_3"], b7, padding=[(3, 3), (0, 0)])
    bd = _basic(p["branch7x7dbl_1"], x)
    bd = _basic(p["branch7x7dbl_2"], bd, padding=[(3, 3), (0, 0)])
    bd = _basic(p["branch7x7dbl_3"], bd, padding=[(0, 0), (3, 3)])
    bd = _basic(p["branch7x7dbl_4"], bd, padding=[(3, 3), (0, 0)])
    bd = _basic(p["branch7x7dbl_5"], bd, padding=[(0, 0), (3, 3)])
    bp = _basic(p["branch_pool"], _avgpool3(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, x, fid: bool = False):
    del fid  # no pooling-variant difference in reduction block D
    b3 = _basic(p["branch3x3_1"], x)
    b3 = _basic(p["branch3x3_2"], b3, stride=2)
    b7 = _basic(p["branch7x7x3_1"], x)
    b7 = _basic(p["branch7x7x3_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = _basic(p["branch7x7x3_3"], b7, padding=[(3, 3), (0, 0)])
    b7 = _basic(p["branch7x7x3_4"], b7, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, x, fid: bool = False, last: bool = False):
    b1 = _basic(p["branch1x1"], x)
    b3 = _basic(p["branch3x3_1"], x)
    b3a = _basic(p["branch3x3_2a"], b3, padding=[(0, 0), (1, 1)])
    b3b = _basic(p["branch3x3_2b"], b3, padding=[(1, 1), (0, 0)])
    b3 = jnp.concatenate([b3a, b3b], axis=1)
    bd = _basic(p["branch3x3dbl_1"], x)
    bd = _basic(p["branch3x3dbl_2"], bd, padding=1)
    bda = _basic(p["branch3x3dbl_3a"], bd, padding=[(0, 0), (1, 1)])
    bdb = _basic(p["branch3x3dbl_3b"], bd, padding=[(1, 1), (0, 0)])
    bd = jnp.concatenate([bda, bdb], axis=1)
    if fid and last:
        # Inception-2015's Mixed_7c pool branch is a MAX pool (pytorch-fid
        # FIDInceptionE_2 — "patch ... to match the TF implementation")
        pool = _maxpool3s1(x)
    else:
        pool = _avgpool3(x, count_include_pad=not fid)
    bp = _basic(p["branch_pool"], pool)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def _inception_e_last(p, x, fid: bool = False):
    return _inception_e(p, x, fid=fid, last=True)


_BLOCKS = [
    ("Mixed_5b", _inception_a), ("Mixed_5c", _inception_a),
    ("Mixed_5d", _inception_a), ("Mixed_6a", _inception_b),
    ("Mixed_6b", _inception_c), ("Mixed_6c", _inception_c),
    ("Mixed_6d", _inception_c), ("Mixed_6e", _inception_c),
    ("Mixed_7a", _inception_d), ("Mixed_7b", _inception_e),
    ("Mixed_7c", _inception_e_last),
]

VARIANTS = ("fid2015", "tv")


def inception_features(params, images_u8, return_logits: bool = False,
                       variant: str = "fid2015"):
    """images_u8: uint8/float [N, H, W, 3] → pool features [N, 2048]
    (or softmax probs [N, num_classes] with return_logits).

    variant="fid2015" reproduces the Inception-2015 TF-graph pooling the
    reference detector encodes; "tv" is plain torchvision inception_v3."""
    assert variant in VARIANTS, f"unknown detector variant {variant!r}"
    fid = variant == "fid2015"
    x = jnp.asarray(images_u8, jnp.float32).transpose(0, 3, 1, 2)
    if x.shape[-1] != 299:
        # torchvision FID convention: bilinear resize to 299
        ky = jnp.asarray(_resize_matrix_bilinear(x.shape[-2], 299))
        kx = jnp.asarray(_resize_matrix_bilinear(x.shape[-1], 299))
        x = jnp.einsum("oh,nchw->ncow", ky, x)
        x = jnp.einsum("ow,nchw->ncho", kx, x)
    x = x / 127.5 - 1.0

    p = params
    x = _basic(p["Conv2d_1a_3x3"], x, stride=2)
    x = _basic(p["Conv2d_2a_3x3"], x)
    x = _basic(p["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool(x)
    x = _basic(p["Conv2d_3b_1x1"], x)
    x = _basic(p["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    for name, fn in _BLOCKS:
        x = fn(p[name], x, fid=fid)
    feats = jnp.mean(x, axis=(2, 3))
    if return_logits:
        logits = feats @ p["fc"]["weight"].T.astype(feats.dtype) + \
            p["fc"]["bias"].astype(feats.dtype)
        return jax.nn.softmax(logits, axis=-1)
    return feats


import functools


@functools.lru_cache(maxsize=16)
def _resize_matrix_bilinear(in_size: int, out_size: int) -> np.ndarray:
    """align_corners=False bilinear resize matrix."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        pos = (i + 0.5) * scale - 0.5
        lo = int(np.floor(pos))
        frac = pos - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        mat[i, lo_c] += 1 - frac
        mat[i, hi_c] += frac
    return mat


# --------------------------------------------------------------------- init


_STEM_SPECS = {
    "Conv2d_1a_3x3": (32, 3, 3), "Conv2d_2a_3x3": (32, 32, 3),
    "Conv2d_2b_3x3": (64, 32, 3), "Conv2d_3b_1x1": (80, 64, 1),
    "Conv2d_4a_3x3": (192, 80, 3),
}


def _a_specs(cin, pool):
    return {"branch1x1": (64, cin, 1), "branch5x5_1": (48, cin, 1),
            "branch5x5_2": (64, 48, 5), "branch3x3dbl_1": (64, cin, 1),
            "branch3x3dbl_2": (96, 64, 3), "branch3x3dbl_3": (96, 96, 3),
            "branch_pool": (pool, cin, 1)}


def _b_specs(cin):
    return {"branch3x3": (384, cin, 3), "branch3x3dbl_1": (64, cin, 1),
            "branch3x3dbl_2": (96, 64, 3), "branch3x3dbl_3": (96, 96, 3)}


def _c_specs(cin, c7):
    return {"branch1x1": (192, cin, 1),
            "branch7x7_1": (c7, cin, 1), "branch7x7_2": (c7, c7, (1, 7)),
            "branch7x7_3": (192, c7, (7, 1)),
            "branch7x7dbl_1": (c7, cin, 1), "branch7x7dbl_2": (c7, c7, (7, 1)),
            "branch7x7dbl_3": (c7, c7, (1, 7)), "branch7x7dbl_4": (c7, c7, (7, 1)),
            "branch7x7dbl_5": (192, c7, (1, 7)),
            "branch_pool": (192, cin, 1)}


def _d_specs(cin):
    return {"branch3x3_1": (192, cin, 1), "branch3x3_2": (320, 192, 3),
            "branch7x7x3_1": (192, cin, 1), "branch7x7x3_2": (192, 192, (1, 7)),
            "branch7x7x3_3": (192, 192, (7, 1)), "branch7x7x3_4": (192, 192, 3)}


def _e_specs(cin):
    return {"branch1x1": (320, cin, 1), "branch3x3_1": (384, cin, 1),
            "branch3x3_2a": (384, 384, (1, 3)), "branch3x3_2b": (384, 384, (3, 1)),
            "branch3x3dbl_1": (448, cin, 1), "branch3x3dbl_2": (384, 448, 3),
            "branch3x3dbl_3a": (384, 384, (1, 3)),
            "branch3x3dbl_3b": (384, 384, (3, 1)),
            "branch_pool": (192, cin, 1)}


_BLOCK_SPECS = {
    "Mixed_5b": _a_specs(192, 32), "Mixed_5c": _a_specs(256, 64),
    "Mixed_5d": _a_specs(288, 64), "Mixed_6a": _b_specs(288),
    "Mixed_6b": _c_specs(768, 128), "Mixed_6c": _c_specs(768, 160),
    "Mixed_6d": _c_specs(768, 160), "Mixed_6e": _c_specs(768, 192),
    "Mixed_7a": _d_specs(768), "Mixed_7b": _e_specs(1280),
    "Mixed_7c": _e_specs(2048),
}


def _bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def init_inception_params(key, num_classes: int = 1008) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 256))

    def basic(spec):
        cout, cin, k = spec
        kh, kw = (k, k) if isinstance(k, int) else k
        fan = cin * kh * kw
        return {"conv_weight": jax.random.normal(next(ks), (cout, cin, kh, kw))
                * np.sqrt(2.0 / fan), "bn": _bn_init(cout)}

    params: Dict[str, Any] = {}
    for name, spec in _STEM_SPECS.items():
        params[name] = basic(spec)
    for bname, specs in _BLOCK_SPECS.items():
        params[bname] = {k: basic(v) for k, v in specs.items()}
    params["fc"] = {"weight": jax.random.normal(next(ks), (num_classes, 2048))
                    * 0.02, "bias": jnp.zeros((num_classes,))}
    return params


def params_from_torch_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision inception_v3 state dict → pytree."""
    t = {k: jnp.asarray(v) for k, v in state.items()}

    def basic(prefix):
        return {"conv_weight": t[f"{prefix}.conv.weight"],
                "bn": {k: t[f"{prefix}.bn.{k}"] for k in
                       ("weight", "bias", "running_mean", "running_var")}}

    params: Dict[str, Any] = {}
    for name in _STEM_SPECS:
        params[name] = basic(name)
    for bname, specs in _BLOCK_SPECS.items():
        params[bname] = {k: basic(f"{bname}.{k}") for k in specs}
    if "fc.weight" in t:
        params["fc"] = {"weight": t["fc.weight"], "bias": t["fc.bias"]}
    else:
        params["fc"] = {"weight": jnp.zeros((1008, 2048)),
                        "bias": jnp.zeros((1008,))}
    return params
