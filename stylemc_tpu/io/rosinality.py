"""Import rosinality-format StyleGAN2 weights (the e4e decoder format) into
the ADA-layout params pytree consumed by our generator.

Equivalence argument (why pure renaming suffices):
  * EqualLinear (rosinality model.py:128-157) and the ADA
    FullyConnectedLayer apply the identical runtime scaling
    (weight·lr_mul/sqrt(in), bias·lr_mul) — style MLP maps 1:1.
  * Demodulated convs: rosinality scales the weight by 1/sqrt(in·k²)
    *before* demodulation, which renormalizes the product — the scale
    cancels exactly, so the raw weight can be copied.
  * ToRGB: rosinality applies the 1/sqrt(in) scale to the weight; ADA
    applies it to the style — same product.
  * Up-conv geometry: rosinality conv_transpose(stride 2, pad 0) + Blur
    (pad (1,1), kernel·4) equals ADA conv2d_resample(up=2, padding=1)
    (pads (1,1) after the transposed conv, gain 4) — verified by expanding
    both padding arithmetics.
  * ToRGB skip upsample: rosinality Upsample pads (2,1) with kernel·4 ==
    ADA upsample2d pads ((4+1)//2, (4-2)//2) gain 4.
  * FusedLeakyReLU(bias, 0.2)·sqrt(2) == bias_act lrelu defaults; rosinality
    has NO conv clamp, so the converted config sets conv_clamp=None.

Name map (rosinality → ours), for resolution R with L = log2(R):
  style.{i+1}.*              → mapping.fc{i}.*
  input.input [1,C,4,4]      → synthesis.b4.const
  conv1.*                    → synthesis.b4.conv1.*
  to_rgb1.*                  → synthesis.b4.torgb.*
  convs.{2m}/{2m+1}.*        → synthesis.b{2^(m+3)}.conv0/.conv1.*
  to_rgbs.{m}.*              → synthesis.b{2^(m+3)}.torgb.*
  noises.noise_{k}           → per-layer noise_const (layer order)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.stylegan2.generator import GeneratorConfig


def config_for_rosinality(size: int, channel_multiplier: int = 2,
                          n_mlp: int = 8) -> GeneratorConfig:
    """rosinality channel dict {64: 256·cm, ...} == ADA channel_base 16384·cm
    for cm=2 (min(32768/res, 512))."""
    return GeneratorConfig(
        img_resolution=size,
        channel_base=16384 * channel_multiplier,
        channel_max=512,
        conv_clamp=None,
        num_fp16_res=0,
        mapping_layers=n_mlp,
    )


def generator_params_from_rosinality(
        state: Dict[str, np.ndarray], size: int,
        channel_multiplier: int = 2) -> Tuple[GeneratorConfig, Dict[str, Any]]:
    import jax.numpy as jnp

    n_mlp = len({k.split(".")[1] for k in state
                 if k.startswith("style.") and k.endswith(".weight")})
    cfg = config_for_rosinality(size, channel_multiplier, n_mlp=n_mlp or 8)
    t = {k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in state.items()}

    mapping = {}
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = {"weight": t[f"style.{i + 1}.weight"],
                             "bias": t[f"style.{i + 1}.bias"]}
    # rosinality g_ema has no w_avg inside the module; latent_avg ships
    # alongside in e4e checkpoints — caller may overwrite.
    mapping["w_avg"] = t.get("w_avg", jnp.zeros((cfg.w_dim,)))

    def conv_layer(pfx, noise_idx, res):
        return {
            "affine": {"weight": t[f"{pfx}.conv.modulation.weight"],
                       "bias": t[f"{pfx}.conv.modulation.bias"]},
            "weight": t[f"{pfx}.conv.weight"][0],
            "bias": t[f"{pfx}.activate.bias"],
            "noise_strength": t[f"{pfx}.noise.weight"].reshape(()),
            "noise_const": _noise_const(t, noise_idx, res),
        }

    def _noise_const(t, idx, res):
        key = f"noises.noise_{idx}"
        if key in t:
            return t[key].reshape(res, res)
        return jnp.zeros((res, res), jnp.float32)

    def torgb_layer(pfx):
        return {
            "affine": {"weight": t[f"{pfx}.conv.modulation.weight"],
                       "bias": t[f"{pfx}.conv.modulation.bias"]},
            "weight": t[f"{pfx}.conv.weight"][0],
            "bias": t[f"{pfx}.bias"].reshape(-1),
        }

    synthesis = {"b4": {
        "const": t["input.input"][0],
        "conv1": conv_layer("conv1", 0, 4),
        "torgb": torgb_layer("to_rgb1"),
    }}
    noise_idx = 1
    for m, res in enumerate(cfg.block_resolutions[1:]):
        synthesis[f"b{res}"] = {
            "conv0": conv_layer(f"convs.{2 * m}", noise_idx, res),
            "conv1": conv_layer(f"convs.{2 * m + 1}", noise_idx + 1, res),
            "torgb": torgb_layer(f"to_rgbs.{m}"),
        }
        noise_idx += 2
    return cfg, {"mapping": mapping, "synthesis": synthesis}


def infer_rosinality_size(state: Dict[str, np.ndarray]) -> int:
    n_torgbs = len({k.split(".")[1] for k in state if k.startswith("to_rgbs.")})
    return 4 * (2 ** n_torgbs)


def load_rosinality_pt(path: str,
                       key: Optional[str] = None
                       ) -> Tuple[GeneratorConfig, Dict[str, Any]]:
    """Load a rosinality-layout generator .pt checkpoint.

    Accepts the rosinality train.py checkpoint dict ({"g_ema"/"g": state},
    optional "latent_avg") or a bare state dict; size and mapping depth are
    inferred from the keys. Counterpart of io.export.save_rosinality_pt."""
    import jax.numpy as jnp
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    latent_avg = None
    if isinstance(obj, dict):
        la = obj.get("latent_avg")
        if la is not None and hasattr(la, "numpy"):
            latent_avg = la.detach().cpu().numpy()
        for k in ([key] if key else ("g_ema", "g", "generator", "state_dict")):
            if k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    state = {n: v.detach().cpu().numpy() for n, v in obj.items()
             if hasattr(v, "detach")}
    assert any(n.startswith("convs.") or n == "input.input" for n in state), \
        f"{path} does not look like a rosinality generator checkpoint"
    cfg, params = generator_params_from_rosinality(
        state, infer_rosinality_size(state))
    if latent_avg is not None:
        params["mapping"]["w_avg"] = jnp.asarray(latent_avg, jnp.float32)
    return cfg, params
