"""ArcFace IR-SE backbone (InsightFace) in functional JAX.

Behavioral contract: /root/reference/id_loss/model_irse.py:10-49 +
helpers.py:29-119 — IR-SE-50: 3x3 stem conv + BN + PReLU, four stages of
bottleneck_IR_SE units (BN → 3x3 conv → PReLU → strided 3x3 conv → BN → SE,
plus a 1x1-conv/BN or strided-identity shortcut), then BN → flatten →
Linear(512·7·7→512) → BN1d(affine=False) → L2 normalize. Inference-mode
(running BN stats, dropout off) and differentiable — it sits inside the
find_direction jit graph as the ID loss.

Weight import: `params_from_torch_state` maps the torch Sequential integer
namespace (body.N.res_layer.M.*) onto this pytree.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ir_se_50_layout() -> List[Tuple[int, int, int]]:
    """(in_channel, depth, stride) per bottleneck, IR-50 layout
    (reference helpers.py:30-36)."""
    blocks = []
    for in_c, depth, units in ((64, 64, 3), (64, 128, 4), (128, 256, 14),
                               (256, 512, 3)):
        blocks.append((in_c, depth, 2))
        blocks.extend((depth, depth, 1) for _ in range(units - 1))
    return blocks


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


def _bn1d(p, x, eps=1e-5):
    scale = jax.lax.rsqrt(p["running_var"] + eps)
    if "weight" in p and p["weight"] is not None:
        scale = scale * p["weight"]
        bias = p.get("bias", 0.0) - p["running_mean"] * scale
    else:
        bias = -p["running_mean"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _prelu(p, x):
    a = p.astype(x.dtype)[None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def _se(p, x, r=16):
    s = jnp.mean(x, axis=(2, 3), keepdims=True)
    s = jax.nn.relu(_conv(s, p["fc1_weight"]))
    s = jax.nn.sigmoid(_conv(s, p["fc2_weight"]))
    return x * s


def _strided_identity(x, stride):
    # MaxPool2d(1, stride): keep every stride-th pixel.
    if stride == 1:
        return x
    return x[:, :, ::stride, ::stride]


def _bottleneck_ir_se(p, x, in_c, depth, stride):
    if in_c == depth:
        shortcut = _strided_identity(x, stride)
    else:
        shortcut = _bn(p["shortcut_bn"], _conv(x, p["shortcut_conv_weight"],
                                               stride=stride))
    r = _bn(p["bn1"], x)
    r = _conv(r, p["conv1_weight"], padding=1)
    r = _prelu(p["prelu"], r)
    r = _conv(r, p["conv2_weight"], stride=stride, padding=1)
    r = _bn(p["bn2"], r)
    r = _se(p["se"], r)
    return r + shortcut


def body_runs(layout):
    """Group bottleneck indices into maximal runs of identical uniform
    blocks (in==depth, stride 1) and singleton non-uniform blocks.
    Returns [(lo, hi, depth_or_None)]; depth is set for scannable runs of
    length >= 2."""
    runs = []
    i = 0
    while i < len(layout):
        in_c, depth, stride = layout[i]
        j = i + 1
        if in_c == depth and stride == 1:
            while j < len(layout) and layout[j] == (depth, depth, 1):
                j += 1
        if j - i >= 2:
            runs.append((i, j, depth))
        else:
            runs.append((i, j, None))
        i = j
    return runs


def apply_body_run(p_body, x, run, layout):
    """Apply one body_runs() group. Uniform runs go through one lax.scan
    over stacked per-block params — the bottleneck body is compiled ONCE
    per stage instead of inlined per block (IR-SE-50: 24 inlined
    bottlenecks -> 4 singletons + 4 scan bodies), a large XLA compile-time
    cut with identical numerics; autodiff flows through scan."""
    lo, hi, depth = run
    if depth is None:
        for i in range(lo, hi):
            x = _bottleneck_ir_se(p_body[f"{i}"], x, *layout[i])
        return x
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[p_body[f"{i}"] for i in range(lo, hi)])

    def step(h, bp):
        return _bottleneck_ir_se(bp, h, depth, depth, 1), None

    x, _ = jax.lax.scan(step, x, stacked)
    return x


def backbone_apply(params, x, layout=None, scan_blocks=True):
    """x: [N, 3, S, S] in [-1, 1] → L2-normalized embeddings [N, 512].

    layout: list of (in_channel, depth, stride) bottleneck specs; defaults to
    the IR-SE-50 layout. Tests / dryruns may pass a reduced layout.
    scan_blocks: run uniform bottleneck stretches through lax.scan (see
    apply_body_run) — same numerics, much smaller XLA graph."""
    p = params
    layout = layout if layout is not None else ir_se_50_layout()
    x = _conv(x, p["input_conv_weight"], padding=1)
    x = _bn(p["input_bn"], x)
    x = _prelu(p["input_prelu"], x)
    if scan_blocks:
        for run in body_runs(layout):
            x = apply_body_run(p["body"], x, run, layout)
    else:
        for i, (in_c, depth, stride) in enumerate(layout):
            x = _bottleneck_ir_se(p["body"][f"{i}"], x, in_c, depth, stride)
    x = _bn(p["output_bn"], x)
    n = x.shape[0]
    x = x.reshape(n, -1)
    x = x @ p["output_linear"]["weight"].T.astype(x.dtype) + \
        p["output_linear"]["bias"].astype(x.dtype)
    x = _bn1d(p["output_bn1d"], x)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


# ----------------------------------------------------------------------- init


def _bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def init_backbone_params(key, input_size: int = 112, layout=None) -> Dict[str, Any]:
    layout = layout if layout is not None else ir_se_50_layout()
    ks = iter(jax.random.split(key, 8 + 3 * len(layout)))

    def he(k, shape):
        fan_in = int(np.prod(shape[1:]))
        return jax.random.normal(k, shape) * np.sqrt(2.0 / fan_in)

    stem_c = layout[0][0]
    params: Dict[str, Any] = {
        "input_conv_weight": he(next(ks), (stem_c, 3, 3, 3)),
        "input_bn": _bn_init(stem_c),
        "input_prelu": jnp.full((stem_c,), 0.25),
        "body": {},
    }
    for i, (in_c, depth, stride) in enumerate(layout):
        bp = {
            "bn1": _bn_init(in_c),
            "conv1_weight": he(next(ks), (depth, in_c, 3, 3)),
            "prelu": jnp.full((depth,), 0.25),
            "conv2_weight": he(next(ks), (depth, depth, 3, 3)),
            "bn2": _bn_init(depth),
            "se": {"fc1_weight": he(next(ks), (max(depth // 16, 1), depth, 1, 1)),
                   "fc2_weight": jnp.zeros((depth, max(depth // 16, 1), 1, 1))},
        }
        if in_c != depth:
            bp["shortcut_conv_weight"] = he(next(ks), (depth, in_c, 1, 1))
            bp["shortcut_bn"] = _bn_init(depth)
        params["body"][f"{i}"] = bp
    final_c = layout[-1][1]
    n_stride2 = sum(1 for (_, _, st) in layout if st == 2)
    feat = input_size // (2 ** n_stride2)
    params["output_bn"] = _bn_init(final_c)
    params["output_linear"] = {
        "weight": jax.random.normal(next(ks), (512, final_c * feat * feat)) * 0.01,
        "bias": jnp.zeros((512,)),
    }
    params["output_bn1d"] = {"weight": None, "bias": None,
                             "running_mean": jnp.zeros((512,)),
                             "running_var": jnp.ones((512,))}
    return params


# -------------------------------------------------------------- weight import


def params_from_torch_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the torch Backbone state_dict (model_ir_se50.pth namespace:
    input_layer.{0,1,2}, body.N.{shortcut_layer,res_layer}.M, output_layer)
    onto the pytree."""
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
    params["output_bn"] = bn("output_layer.0")
    params["output_linear"] = {"weight": t["output_layer.3.weight"],
                               "bias": t["output_layer.3.bias"]}
    params["output_bn1d"] = {
        "weight": t.get("output_layer.4.weight"),
        "bias": t.get("output_layer.4.bias"),
        "running_mean": t["output_layer.4.running_mean"],
        "running_var": t["output_layer.4.running_var"],
    }
    return params
