"""Checkpoint EXPORT: write torch-ecosystem formats from our pytrees.

The import layer (io/{pickle_loader,rosinality,tf_legacy}) reads the
reference on-disk formats; this module writes them back, so generators and
e4e encoders trained or edited in this framework are directly loadable by
rosinality-StyleGAN2 / encoder4editing torch tooling:

  - `ada_to_rosinality_state` — ADA-layout generator pytree → rosinality
    g_ema state-dict namespace (model.py:362-543 of the reference's
    encoder4editing/models/stylegan2). Numerics oracle-tested: the in-tree
    torch Generator loaded with this state matches our synthesis
    (tests/test_reference_parity.py::test_rosinality_generator_vs_torch).
  - `save_rosinality_pt` — rosinality train.py checkpoint layout
    ({"g_ema": state, optional "latent_avg"}).
  - `encoder_to_torch_state` / `save_e4e_pt` — the e4e_ffhq_encode.pt
    format (state_dict with encoder./decoder. prefixes + latent_avg +
    opts; reference encoder4editing/models/psp.py:41-55).

Exports use torch.save — the targets ARE torch checkpoints. Roundtrip
(save → io.rosinality / models.e4e.psp import) is tested in
tests/test_pickle_loader.py and tests/test_e4e.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..models.stylegan2.generator import GeneratorConfig


def encoder_to_torch_state(p, n_styles: int = 14) -> Dict[str, np.ndarray]:
    """e4e encoder pytree → reference torch namespace (psp_encoders.py:
    input_layer.*, body.N.*, styles.N.*, latlayer{1,2}.*)."""
    from ..models.arcface import ir_se_50_layout

    state = {}
    state["input_layer.0.weight"] = np.array(p["input_conv_weight"])
    for k in ("weight", "bias", "running_mean", "running_var"):
        state[f"input_layer.1.{k}"] = np.array(p["input_bn"][k])
    state["input_layer.2.weight"] = np.array(p["input_prelu"])
    for i, (in_c, depth, stride) in enumerate(ir_se_50_layout()):
        bp = p["body"][f"{i}"]
        for k in ("weight", "bias", "running_mean", "running_var"):
            state[f"body.{i}.res_layer.0.{k}"] = np.array(bp["bn1"][k])
            state[f"body.{i}.res_layer.4.{k}"] = np.array(bp["bn2"][k])
        state[f"body.{i}.res_layer.1.weight"] = np.array(bp["conv1_weight"])
        state[f"body.{i}.res_layer.2.weight"] = np.array(bp["prelu"])
        state[f"body.{i}.res_layer.3.weight"] = np.array(bp["conv2_weight"])
        state[f"body.{i}.res_layer.5.fc1.weight"] = np.array(
            bp["se"]["fc1_weight"])
        state[f"body.{i}.res_layer.5.fc2.weight"] = np.array(
            bp["se"]["fc2_weight"])
        if in_c != depth:
            state[f"body.{i}.shortcut_layer.0.weight"] = \
                np.array(bp["shortcut_conv_weight"])
            for k in ("weight", "bias", "running_mean", "running_var"):
                state[f"body.{i}.shortcut_layer.1.{k}"] = \
                    np.array(bp["shortcut_bn"][k])
    for i in range(n_styles):
        hp = p["styles"][f"{i}"]
        n_convs = len([k for k in hp if k.startswith("conv")])
        for j in range(n_convs):
            state[f"styles.{i}.convs.{2 * j}.weight"] = \
                np.array(hp[f"conv{j}"]["weight"])
            state[f"styles.{i}.convs.{2 * j}.bias"] = \
                np.array(hp[f"conv{j}"]["bias"])
        state[f"styles.{i}.linear.weight"] = np.array(hp["linear"]["weight"])
        state[f"styles.{i}.linear.bias"] = np.array(hp["linear"]["bias"])
    for name in ("latlayer1", "latlayer2"):
        state[f"{name}.weight"] = np.array(p[name]["weight"])
        state[f"{name}.bias"] = np.array(p[name]["bias"])
    return state


def ada_to_rosinality_state(cfg: GeneratorConfig,
                            params) -> Dict[str, np.ndarray]:
    """ADA-layout generator pytree → rosinality g_ema namespace."""
    state = {}
    for i in range(cfg.mapping_layers):
        state[f"style.{i + 1}.weight"] = np.array(
            params["mapping"][f"fc{i}"]["weight"])
        state[f"style.{i + 1}.bias"] = np.array(
            params["mapping"][f"fc{i}"]["bias"])
    syn = params["synthesis"]
    state["input.input"] = np.array(syn["b4"]["const"])[None]

    def put_conv(pfx, lp, noise_idx, res):
        state[f"{pfx}.conv.weight"] = np.array(lp["weight"])[None]
        state[f"{pfx}.conv.modulation.weight"] = np.array(
            lp["affine"]["weight"])
        state[f"{pfx}.conv.modulation.bias"] = np.array(lp["affine"]["bias"])
        state[f"{pfx}.noise.weight"] = np.array(
            lp["noise_strength"]).reshape(1)
        state[f"{pfx}.activate.bias"] = np.array(lp["bias"])
        state[f"noises.noise_{noise_idx}"] = np.array(
            lp["noise_const"])[None, None]

    def put_torgb(pfx, lp):
        state[f"{pfx}.conv.weight"] = np.array(lp["weight"])[None]
        state[f"{pfx}.conv.modulation.weight"] = np.array(
            lp["affine"]["weight"])
        state[f"{pfx}.conv.modulation.bias"] = np.array(lp["affine"]["bias"])
        state[f"{pfx}.bias"] = np.array(lp["bias"]).reshape(1, 3, 1, 1)

    put_conv("conv1", syn["b4"]["conv1"], 0, 4)
    put_torgb("to_rgb1", syn["b4"]["torgb"])
    ni = 1
    for m, res in enumerate(cfg.block_resolutions[1:]):
        put_conv(f"convs.{2 * m}", syn[f"b{res}"]["conv0"], ni, res)
        put_conv(f"convs.{2 * m + 1}", syn[f"b{res}"]["conv1"], ni + 1, res)
        put_torgb(f"to_rgbs.{m}", syn[f"b{res}"]["torgb"])
        ni += 2
    return state


def save_rosinality_pt(path: str, cfg: GeneratorConfig, params,
                       latent_avg=None) -> str:
    """Write a rosinality-layout generator checkpoint ({"g_ema": state}
    plus "latent_avg" [512] when given — our mapping's w_avg by default)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in ada_to_rosinality_state(cfg, params).items()}
    if latent_avg is None:
        latent_avg = params.get("mapping", {}).get("w_avg")
    ckpt = {"g_ema": state}
    if latent_avg is not None:
        ckpt["latent_avg"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(latent_avg, np.float32)))
    torch.save(ckpt, path)
    return path


def save_e4e_pt(path: str, encoder_params, decoder_cfg: GeneratorConfig,
                decoder_params, latent_avg,
                opts: Optional[Dict] = None) -> str:
    """Write the e4e_ffhq_encode.pt checkpoint format (psp.py:41-55)."""
    import torch

    from ..models.e4e.encoders import style_count

    n_styles = style_count(decoder_cfg.img_resolution)
    state = {}
    for k, v in encoder_to_torch_state(encoder_params,
                                       n_styles=n_styles).items():
        state["encoder." + k] = torch.from_numpy(np.ascontiguousarray(v))
    for k, v in ada_to_rosinality_state(decoder_cfg,
                                        decoder_params).items():
        state["decoder." + k] = torch.from_numpy(np.ascontiguousarray(v))
    ckpt = {
        "state_dict": state,
        "latent_avg": torch.from_numpy(
            np.ascontiguousarray(np.asarray(latent_avg, np.float32))),
        "opts": {"stylegan_size": decoder_cfg.img_resolution,
                 "encoder_type": "Encoder4Editing", **(opts or {})},
    }
    torch.save(ckpt, path)
    return path
