"""OpenAI CLIP (ViT-B/32, ViT-B/16, RN50) in functional JAX.

Behavioral contract: the `clip` pip package consumed by the reference
(/root/reference/clip_loss.py:11-13, clip_loss_nada.py) — image/text encoders
with QuickGELU activations, pre-LN transformer blocks, causal text mask, and
EOT-token text pooling. Weight import maps the torch state_dict namespace
(visual.*, transformer.*, token_embedding, ...) onto this pytree via
`params_from_torch_state`.

TPU-first notes: attention is a pair of batched einsums (rides the MXU);
everything is differentiable end-to-end so find_direction can backprop
through the image encoder in the same jit graph as the generator. Default
compute dtype fp32; pass dtype=jnp.bfloat16 for speed (the reference runs
fp16 on CUDA).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    # vision
    image_resolution: int
    vision_layers: Any           # int (ViT) or tuple (ResNet stage depths)
    vision_width: int
    vision_patch_size: Optional[int]  # None → ModifiedResNet
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return self.vision_patch_size is not None

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64 if self.is_vit else self.vision_width * 32 // 64


CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig(embed_dim=512, image_resolution=224, vision_layers=12,
                           vision_width=768, vision_patch_size=32),
    "ViT-B/16": CLIPConfig(embed_dim=512, image_resolution=224, vision_layers=12,
                           vision_width=768, vision_patch_size=16),
    "RN50": CLIPConfig(embed_dim=1024, image_resolution=224,
                       vision_layers=(3, 4, 6, 3), vision_width=64,
                       vision_patch_size=None),
}


# ------------------------------------------------------------------ primitives


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p, x, eps=1e-5):
    # stats in fp32, result cast back to the compute dtype — the reference's
    # LayerNorm subclass does exactly this under fp16 (CLIP/clip/model.py:157).
    # Without the final astype, fp32 weights would silently upcast a bf16
    # activation stream back to fp32 at every LN.
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (xn * p["weight"] + p["bias"]).astype(dt)


def _linear(p, x):
    return x @ p["weight"].T.astype(x.dtype) + p["bias"].astype(x.dtype)


def multi_head_attention(p, x, n_heads: int, attn_mask=None):
    """torch.nn.MultiheadAttention-compatible self-attention.

    p: {in_proj_weight [3D,D], in_proj_bias [3D], out_proj: {weight, bias}}
    x: [B, L, D].
    """
    b, l, d = x.shape
    qkv = x @ p["in_proj_weight"].T.astype(x.dtype) + p["in_proj_bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // n_heads

    def heads(t):
        return t.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    # float(): a np.float64 scalar is strongly typed and would promote a
    # bf16 tower to fp32 mid-layer (breaking the scan carry dtype); a
    # Python float is weak and preserves the compute dtype.
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / float(np.sqrt(hd))
    if attn_mask is not None:
        scores = scores + attn_mask.astype(scores.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    return _linear(p["out_proj"], out)


def residual_block(p, x, n_heads, attn_mask=None):
    x = x + multi_head_attention(p["attn"], layer_norm(p["ln_1"], x), n_heads,
                                 attn_mask)
    h = _linear(p["mlp"]["c_fc"], layer_norm(p["ln_2"], x))
    x = x + _linear(p["mlp"]["c_proj"], quick_gelu(h))
    return x


def transformer(p, x, n_layers, n_heads, attn_mask=None):
    """All n_layers resblocks are shape-identical, so run them through one
    lax.scan over stacked params: the block body compiles ONCE instead of
    being inlined n_layers times (two 12-layer towers sit inside the
    find_direction jit graph — a large XLA compile-time cut; numerics and
    autodiff are unchanged)."""
    if n_layers == 1:
        return residual_block(p["resblock0"], x, n_heads, attn_mask)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[p[f"resblock{i}"] for i in range(n_layers)])

    def step(h, bp):
        return residual_block(bp, h, n_heads, attn_mask), None

    x, _ = jax.lax.scan(step, x, stacked)
    return x


# ----------------------------------------------------------------- ViT vision


def encode_image_vit(params, cfg: CLIPConfig, image):
    """image: [N, 3, R, R], CLIP-normalized. → [N, embed_dim].

    The patch embedding (stride == kernel size) is a space-to-depth reshape
    + one matmul rather than a strided conv: on TPU, XLA's gradient of a
    3-input-channel patchify conv whose input is produced by any fused
    elementwise op (the CLIP preprocessing) lowers to a pathological
    conv-transpose — measured 77.6 ms vs 5.8 ms for the identical matmul
    at batch 4 / 224px / ps=16 on a v5e. The matmul is also the
    MXU-idiomatic form; results match the conv to fp32 sum-order (2e-4)."""
    vp = params["visual"]
    ps = cfg.vision_patch_size
    n, c, r, _ = image.shape
    g = r // ps
    wgt = vp["conv1_weight"].astype(image.dtype)  # [width, 3, ps, ps]
    w = wgt.shape[0]
    xb = image.reshape(n, c, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
    x = xb.reshape(n, g * g, c * ps * ps) @ wgt.reshape(w, -1).T  # [N, g², width]
    cls = jnp.broadcast_to(vp["class_embedding"].astype(x.dtype), (n, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"].astype(x.dtype)
    x = layer_norm(vp["ln_pre"], x)
    x = transformer(vp["transformer"], x, cfg.vision_layers, cfg.vision_heads)
    x = layer_norm(vp["ln_post"], x[:, 0, :])
    return x @ vp["proj"].astype(x.dtype)


# ------------------------------------------------------- ModifiedResNet (RN50)


def _conv(p, x, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, p.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p, x, eps=1e-5):
    # inference-mode batchnorm (running stats)
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None].astype(x.dtype) + \
        bias[None, :, None, None].astype(x.dtype)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID") / (k * k)


def _bottleneck(p, x, stride=1):
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1_weight"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2_weight"], out, padding=1)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3_weight"], out))
    identity = x
    if "downsample" in p:
        identity = x if stride == 1 else _avg_pool(x, stride)
        identity = _bn(p["downsample"]["1"], _conv(p["downsample"]["0_weight"], identity))
    return jax.nn.relu(out + identity)


def _attention_pool(p, x, n_heads):
    n, c, h, w = x.shape
    x = x.reshape(n, c, h * w).transpose(2, 0, 1)  # [HW, N, C]
    x = jnp.concatenate([x.mean(axis=0, keepdims=True), x], axis=0)
    x = x + p["positional_embedding"][:, None, :].astype(x.dtype)
    l, _, d = x.shape
    q = x[:1] @ p["q_proj"]["weight"].T.astype(x.dtype) + p["q_proj"]["bias"].astype(x.dtype)
    k = x @ p["k_proj"]["weight"].T.astype(x.dtype) + p["k_proj"]["bias"].astype(x.dtype)
    v = x @ p["v_proj"]["weight"].T.astype(x.dtype) + p["v_proj"]["bias"].astype(x.dtype)
    hd = d // n_heads

    def heads(t):
        return t.transpose(1, 0, 2).reshape(n, -1, n_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / float(np.sqrt(hd))
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(n, 1, d)[:, 0]
    return out @ p["c_proj"]["weight"].T.astype(x.dtype) + p["c_proj"]["bias"].astype(x.dtype)


def encode_image_resnet(params, cfg: CLIPConfig, image):
    vp = params["visual"]
    x = image
    for i in (1, 2, 3):
        x = jax.nn.relu(_bn(vp[f"bn{i}"], _conv(vp[f"conv{i}_weight"], x,
                                                stride=2 if i == 1 else 1, padding=1)))
    x = _avg_pool(x, 2)
    strides = (1, 2, 2, 2)
    for li, depth in enumerate(cfg.vision_layers):
        layer = vp[f"layer{li + 1}"]
        for bi in range(depth):
            x = _bottleneck(layer[f"{bi}"], x, stride=strides[li] if bi == 0 else 1)
    return _attention_pool(vp["attnpool"], x, cfg.vision_heads)


# ----------------------------------------------------------------------- text


def build_causal_mask(length: int):
    mask = jnp.full((length, length), -jnp.inf)
    return jnp.triu(mask, k=1)


def encode_text(params, cfg: CLIPConfig, tokens):
    """tokens: [N, context_length] int32. → [N, embed_dim]."""
    x = params["token_embedding"][tokens]
    x = x + params["positional_embedding"].astype(x.dtype)
    mask = build_causal_mask(cfg.context_length)
    x = transformer(params["transformer"], x, cfg.transformer_layers,
                    cfg.transformer_heads, attn_mask=mask)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ params["text_projection"].astype(x.dtype)


def encode_image(params, cfg: CLIPConfig, image):
    if cfg.is_vit:
        return encode_image_vit(params, cfg, image)
    return encode_image_resnet(params, cfg, image)


# ----------------------------------------------------------------------- init


def _ln_init(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _linear_init(key, din, dout, std=0.02):
    k1, _ = jax.random.split(key)
    return {"weight": jax.random.normal(k1, (dout, din)) * std,
            "bias": jnp.zeros((dout,))}


def _block_init(key, d, heads):
    ks = jax.random.split(key, 4)
    return {
        "attn": {
            "in_proj_weight": jax.random.normal(ks[0], (3 * d, d)) * (d ** -0.5),
            "in_proj_bias": jnp.zeros((3 * d,)),
            "out_proj": _linear_init(ks[1], d, d, std=d ** -0.5),
        },
        "ln_1": _ln_init(d),
        "ln_2": _ln_init(d),
        "mlp": {
            "c_fc": _linear_init(ks[2], d, 4 * d, std=(2 * d) ** -0.5),
            "c_proj": _linear_init(ks[3], 4 * d, d, std=(4 * d) ** -0.5),
        },
    }


def init_clip_params(key, cfg: CLIPConfig) -> Dict[str, Any]:
    """Random init with CLIP's scheme; for tests and from-scratch training.
    Real use imports OpenAI weights via `params_from_torch_state`."""
    keys = jax.random.split(key, 16 + 2 * (cfg.transformer_layers +
                                           (cfg.vision_layers if cfg.is_vit else 8)))
    ki = iter(keys)
    params: Dict[str, Any] = {}

    if cfg.is_vit:
        w = cfg.vision_width
        grid = cfg.image_resolution // cfg.vision_patch_size
        visual = {
            "conv1_weight": jax.random.normal(
                next(ki), (w, 3, cfg.vision_patch_size, cfg.vision_patch_size)) * (w ** -0.5),
            "class_embedding": jax.random.normal(next(ki), (w,)) * (w ** -0.5),
            "positional_embedding": jax.random.normal(next(ki), (grid * grid + 1, w)) * (w ** -0.5),
            "ln_pre": _ln_init(w),
            "ln_post": _ln_init(w),
            "proj": jax.random.normal(next(ki), (w, cfg.embed_dim)) * (w ** -0.5),
            "transformer": {f"resblock{i}": _block_init(next(ki), w, cfg.vision_heads)
                            for i in range(cfg.vision_layers)},
        }
    else:
        w = cfg.vision_width
        embed = cfg.embed_dim

        def bn_init(c):
            return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                    "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

        def bneck_init(key, cin, cmid, stride):
            ks = jax.random.split(key, 4)
            p = {
                "conv1_weight": jax.random.normal(ks[0], (cmid, cin, 1, 1)) * (cin ** -0.5),
                "bn1": bn_init(cmid),
                "conv2_weight": jax.random.normal(ks[1], (cmid, cmid, 3, 3)) * ((cmid * 9) ** -0.5),
                "bn2": bn_init(cmid),
                "conv3_weight": jax.random.normal(ks[2], (cmid * 4, cmid, 1, 1)) * (cmid ** -0.5),
                "bn3": bn_init(cmid * 4),
            }
            if stride > 1 or cin != cmid * 4:
                p["downsample"] = {
                    "0_weight": jax.random.normal(ks[3], (cmid * 4, cin, 1, 1)) * (cin ** -0.5),
                    "1": bn_init(cmid * 4),
                }
            return p

        visual = {
            "conv1_weight": jax.random.normal(next(ki), (w // 2, 3, 3, 3)) * 0.05,
            "bn1": bn_init(w // 2),
            "conv2_weight": jax.random.normal(next(ki), (w // 2, w // 2, 3, 3)) * 0.05,
            "bn2": bn_init(w // 2),
            "conv3_weight": jax.random.normal(next(ki), (w, w // 2, 3, 3)) * 0.05,
            "bn3": bn_init(w),
        }
        cin = w
        for li, depth in enumerate(cfg.vision_layers):
            cmid = w * (2 ** li)
            layer = {}
            for bi in range(depth):
                layer[f"{bi}"] = bneck_init(next(ki), cin, cmid,
                                            stride=(2 if (bi == 0 and li > 0) else 1)
                                            if bi == 0 else 1)
                cin = cmid * 4
            visual[f"layer{li + 1}"] = layer
        spacial = cfg.image_resolution // 32
        visual["attnpool"] = {
            "positional_embedding": jax.random.normal(next(ki), (spacial ** 2 + 1, cin)) * (cin ** -0.5),
            "q_proj": _linear_init(next(ki), cin, cin),
            "k_proj": _linear_init(next(ki), cin, cin),
            "v_proj": _linear_init(next(ki), cin, cin),
            "c_proj": _linear_init(next(ki), cin, embed),
        }

    params["visual"] = visual
    tw = cfg.transformer_width
    params["token_embedding"] = jax.random.normal(next(ki), (cfg.vocab_size, tw)) * 0.02
    params["positional_embedding"] = jax.random.normal(next(ki), (cfg.context_length, tw)) * 0.01
    params["transformer"] = {f"resblock{i}": _block_init(next(ki), tw, cfg.transformer_heads)
                             for i in range(cfg.transformer_layers)}
    params["ln_final"] = _ln_init(tw)
    params["text_projection"] = jax.random.normal(next(ki), (tw, cfg.embed_dim)) * (tw ** -0.5)
    params["logit_scale"] = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    return params


# -------------------------------------------------------------- weight import


def params_from_torch_state(state: Dict[str, np.ndarray], cfg: CLIPConfig):
    """Map an OpenAI CLIP torch state_dict (numpy values) onto the pytree."""
    t = {k: jnp.asarray(v) for k, v in state.items()}

    def block(prefix):
        return {
            "attn": {
                "in_proj_weight": t[f"{prefix}.attn.in_proj_weight"],
                "in_proj_bias": t[f"{prefix}.attn.in_proj_bias"],
                "out_proj": {"weight": t[f"{prefix}.attn.out_proj.weight"],
                             "bias": t[f"{prefix}.attn.out_proj.bias"]},
            },
            "ln_1": {"weight": t[f"{prefix}.ln_1.weight"], "bias": t[f"{prefix}.ln_1.bias"]},
            "ln_2": {"weight": t[f"{prefix}.ln_2.weight"], "bias": t[f"{prefix}.ln_2.bias"]},
            "mlp": {
                "c_fc": {"weight": t[f"{prefix}.mlp.c_fc.weight"],
                         "bias": t[f"{prefix}.mlp.c_fc.bias"]},
                "c_proj": {"weight": t[f"{prefix}.mlp.c_proj.weight"],
                           "bias": t[f"{prefix}.mlp.c_proj.bias"]},
            },
        }

    params: Dict[str, Any] = {}
    if cfg.is_vit:
        visual = {
            "conv1_weight": t["visual.conv1.weight"],
            "class_embedding": t["visual.class_embedding"],
            "positional_embedding": t["visual.positional_embedding"],
            "ln_pre": {"weight": t["visual.ln_pre.weight"], "bias": t["visual.ln_pre.bias"]},
            "ln_post": {"weight": t["visual.ln_post.weight"], "bias": t["visual.ln_post.bias"]},
            "proj": t["visual.proj"],
            "transformer": {
                f"resblock{i}": block(f"visual.transformer.resblocks.{i}")
                for i in range(cfg.vision_layers)
            },
        }
    else:
        visual = {}
        for i in (1, 2, 3):
            visual[f"conv{i}_weight"] = t[f"visual.conv{i}.weight"]
            visual[f"bn{i}"] = {k: t[f"visual.bn{i}.{k}"] for k in
                                ("weight", "bias", "running_mean", "running_var")}
        for li, depth in enumerate(cfg.vision_layers):
            layer = {}
            for bi in range(depth):
                pfx = f"visual.layer{li + 1}.{bi}"
                p = {}
                for ci in (1, 2, 3):
                    p[f"conv{ci}_weight"] = t[f"{pfx}.conv{ci}.weight"]
                    p[f"bn{ci}"] = {k: t[f"{pfx}.bn{ci}.{k}"] for k in
                                    ("weight", "bias", "running_mean", "running_var")}
                if f"{pfx}.downsample.0.weight" in t:
                    p["downsample"] = {
                        "0_weight": t[f"{pfx}.downsample.0.weight"],
                        "1": {k: t[f"{pfx}.downsample.1.{k}"] for k in
                              ("weight", "bias", "running_mean", "running_var")},
                    }
                layer[f"{bi}"] = p
            visual[f"layer{li + 1}"] = layer
        visual["attnpool"] = {
            "positional_embedding": t["visual.attnpool.positional_embedding"],
            **{name: {"weight": t[f"visual.attnpool.{name}.weight"],
                      "bias": t[f"visual.attnpool.{name}.bias"]}
               for name in ("q_proj", "k_proj", "v_proj", "c_proj")},
        }
    params["visual"] = visual
    params["token_embedding"] = t["token_embedding.weight"]
    params["positional_embedding"] = t["positional_embedding"]
    params["transformer"] = {f"resblock{i}": block(f"transformer.resblocks.{i}")
                             for i in range(cfg.transformer_layers)}
    params["ln_final"] = {"weight": t["ln_final.weight"], "bias": t["ln_final.bias"]}
    params["text_projection"] = t["text_projection"]
    params["logit_scale"] = t.get("logit_scale", jnp.asarray(np.log(1 / 0.07)))
    return params


def config_from_torch_state(state: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer the CLIPConfig from a state dict (mirrors clip.model.build_model)."""
    if "visual.conv1.weight" in state and state["visual.conv1.weight"].shape[-1] > 3:
        vw = state["visual.conv1.weight"].shape[0]
        patch = state["visual.conv1.weight"].shape[-1]
        grid = int(round((state["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        layers = len({k.split(".")[3] for k in state
                      if k.startswith("visual.transformer.resblocks.")})
        return CLIPConfig(
            embed_dim=state["text_projection"].shape[1],
            image_resolution=grid * patch, vision_layers=layers,
            vision_width=vw, vision_patch_size=patch,
            transformer_width=state["ln_final.weight"].shape[0],
            transformer_heads=state["ln_final.weight"].shape[0] // 64,
            transformer_layers=len({k.split(".")[2] for k in state
                                    if k.startswith("transformer.resblocks.")}),
        )
    counts = []
    for li in range(1, 5):
        n = len({k.split(".")[2] for k in state if k.startswith(f"visual.layer{li}.")})
        counts.append(n)
    vw = state["visual.conv1.weight"].shape[0] * 2
    spacial = int(round((state["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
    return CLIPConfig(
        embed_dim=state["visual.attnpool.c_proj.weight"].shape[0],
        image_resolution=spacial * 32, vision_layers=tuple(counts),
        vision_width=vw, vision_patch_size=None,
        transformer_width=state["ln_final.weight"].shape[0],
        transformer_heads=state["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in state
                                if k.startswith("transformer.resblocks.")}),
    )
