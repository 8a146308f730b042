"""Checkpoint fabrication helpers shared by the loader/pipeline tests.

Builds checkpoints in the reference on-disk formats (NVIDIA persistence
.pkl via test_pickle_loader.fabricate_pkl; rosinality-layout e4e .pt here)
from OUR randomly initialized pytrees, so the import layer and the full CLI
pipeline can be exercised end-to-end from files without real weights.
"""

import numpy as np


def encoder_to_torch_state(p, n_styles: int = 14):
    """Export an e4e encoder pytree into the reference torch namespace
    (encoder4editing psp_encoders.py: input_layer.*, body.N.*, styles.N.*,
    latlayer{1,2}.*)."""
    from stylemc_tpu.models.arcface import ir_se_50_layout

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
        state[f"body.{i}.res_layer.5.fc1.weight"] = np.array(bp["se"]["fc1_weight"])
        state[f"body.{i}.res_layer.5.fc2.weight"] = np.array(bp["se"]["fc2_weight"])
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


def ada_to_rosinality_state(cfg, params):
    """Export our ADA-layout pytree into the rosinality g_ema namespace."""
    state = {}
    for i in range(cfg.mapping_layers):
        state[f"style.{i + 1}.weight"] = np.array(params["mapping"][f"fc{i}"]["weight"])
        state[f"style.{i + 1}.bias"] = np.array(params["mapping"][f"fc{i}"]["bias"])
    syn = params["synthesis"]
    state["input.input"] = np.array(syn["b4"]["const"])[None]

    def put_conv(pfx, lp, noise_idx, res):
        state[f"{pfx}.conv.weight"] = np.array(lp["weight"])[None]
        state[f"{pfx}.conv.modulation.weight"] = np.array(lp["affine"]["weight"])
        state[f"{pfx}.conv.modulation.bias"] = np.array(lp["affine"]["bias"])
        state[f"{pfx}.noise.weight"] = np.array(lp["noise_strength"]).reshape(1)
        state[f"{pfx}.activate.bias"] = np.array(lp["bias"])
        state[f"noises.noise_{noise_idx}"] = np.array(lp["noise_const"])[None, None]

    def put_torgb(pfx, lp):
        state[f"{pfx}.conv.weight"] = np.array(lp["weight"])[None]
        state[f"{pfx}.conv.modulation.weight"] = np.array(lp["affine"]["weight"])
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


def fabricate_e4e_pt(path: str, stylegan_size: int = 32, seed: int = 0) -> str:
    """Write a rosinality-layout e4e checkpoint (e4e_ffhq_encode.pt format:
    state_dict with encoder./decoder. key-split + latent_avg + opts,
    reference psp.py:41-55) from randomly initialized pytrees."""
    import jax
    import torch

    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.e4e.encoders import (init_encoder_params,
                                                 style_count)
    from stylemc_tpu.models.stylegan2.generator import init_generator_params

    enc = init_encoder_params(jax.random.PRNGKey(seed),
                              stylegan_size=stylegan_size)
    dec_cfg = config_for_rosinality(stylegan_size)
    dec_params = init_generator_params(jax.random.PRNGKey(seed + 1), dec_cfg)

    n_styles = style_count(stylegan_size)
    state = {}
    for k, v in encoder_to_torch_state(enc, n_styles=n_styles).items():
        state["encoder." + k] = torch.from_numpy(np.ascontiguousarray(v))
    for k, v in ada_to_rosinality_state(dec_cfg, dec_params).items():
        state["decoder." + k] = torch.from_numpy(np.ascontiguousarray(v))

    rng = np.random.RandomState(seed)
    ckpt = {
        "state_dict": state,
        "latent_avg": torch.from_numpy(
            rng.randn(512).astype(np.float32) * 0.1),
        "opts": {"stylegan_size": stylegan_size,
                 "encoder_type": "Encoder4Editing"},
    }
    torch.save(ckpt, path)
    return path
