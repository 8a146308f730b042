"""Checkpoint fabrication helpers shared by the loader/pipeline tests.

Builds checkpoints in the reference on-disk formats (NVIDIA persistence
.pkl via test_pickle_loader.fabricate_pkl; rosinality-layout e4e .pt here)
from OUR randomly initialized pytrees, so the import layer and the full CLI
pipeline can be exercised end-to-end from files without real weights.

The state-dict export maps now live in the package (stylemc_tpu/io/
export.py — they are a user-facing interop feature, not just test
plumbing); this module re-exports them for the tests and keeps the
random-init e4e fabrication wrapper.
"""

import numpy as np

from stylemc_tpu.io.export import (  # noqa: F401  (re-exported for tests)
    ada_to_rosinality_state,
    encoder_to_torch_state,
)


def fabricate_e4e_pt(path: str, stylegan_size: int = 32, seed: int = 0) -> str:
    """Write a rosinality-layout e4e checkpoint (e4e_ffhq_encode.pt format:
    state_dict with encoder./decoder. key-split + latent_avg + opts,
    reference psp.py:41-55) from randomly initialized pytrees."""
    import jax

    from stylemc_tpu.io.export import save_e4e_pt
    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.e4e.encoders import init_encoder_params
    from stylemc_tpu.models.stylegan2.generator import init_generator_params

    enc = init_encoder_params(jax.random.PRNGKey(seed),
                              stylegan_size=stylegan_size)
    dec_cfg = config_for_rosinality(stylegan_size)
    dec_params = init_generator_params(jax.random.PRNGKey(seed + 1), dec_cfg)

    rng = np.random.RandomState(seed)
    latent_avg = rng.randn(512).astype(np.float32) * 0.1
    return save_e4e_pt(path, enc, dec_cfg, dec_params, latent_avg)


def clip_params_to_torch_state(cfg, params):
    """Serialize a CLIP pytree into the OpenAI state-dict namespace (the
    exact inverse of models/clip/model.py params_from_torch_state — same
    mapping test_clip.py's roundtrip test pins)."""
    state = {}

    def put(name, v):
        state[name] = np.array(v)

    vp = params["visual"]
    put("visual.conv1.weight", vp["conv1_weight"])
    put("visual.class_embedding", vp["class_embedding"])
    put("visual.positional_embedding", vp["positional_embedding"])
    for lnn in ("ln_pre", "ln_post"):
        put(f"visual.{lnn}.weight", vp[lnn]["weight"])
        put(f"visual.{lnn}.bias", vp[lnn]["bias"])
    put("visual.proj", vp["proj"])

    def put_block(prefix, bp):
        put(f"{prefix}.attn.in_proj_weight", bp["attn"]["in_proj_weight"])
        put(f"{prefix}.attn.in_proj_bias", bp["attn"]["in_proj_bias"])
        put(f"{prefix}.attn.out_proj.weight", bp["attn"]["out_proj"]["weight"])
        put(f"{prefix}.attn.out_proj.bias", bp["attn"]["out_proj"]["bias"])
        for lnn in ("ln_1", "ln_2"):
            put(f"{prefix}.{lnn}.weight", bp[lnn]["weight"])
            put(f"{prefix}.{lnn}.bias", bp[lnn]["bias"])
        for mm in ("c_fc", "c_proj"):
            put(f"{prefix}.mlp.{mm}.weight", bp["mlp"][mm]["weight"])
            put(f"{prefix}.mlp.{mm}.bias", bp["mlp"][mm]["bias"])

    for i in range(cfg.vision_layers):
        put_block(f"visual.transformer.resblocks.{i}",
                  vp["transformer"][f"resblock{i}"])
    for i in range(cfg.transformer_layers):
        put_block(f"transformer.resblocks.{i}",
                  params["transformer"][f"resblock{i}"])
    put("token_embedding.weight", params["token_embedding"])
    put("positional_embedding", params["positional_embedding"])
    put("ln_final.weight", params["ln_final"]["weight"])
    put("ln_final.bias", params["ln_final"]["bias"])
    put("text_projection", params["text_projection"])
    put("logit_scale", params["logit_scale"])
    return state


def fabricate_clip_dir(dirname: str, resolution: int = 64,
                       seed: int = 0) -> str:
    """Write tiny ViT-B-32.pt / ViT-B-16.pt plain-state-dict checkpoints
    (the format models/clip/load.py accepts alongside TorchScript archives)
    plus a minimal bpe_simple_vocab gz, into `dirname`."""
    import gzip
    import os

    import jax
    import torch

    from stylemc_tpu.models.clip import CLIPConfig, init_clip_params

    os.makedirs(dirname, exist_ok=True)
    for fname, patch, s in (("ViT-B-32.pt", 32, seed),
                            ("ViT-B-16.pt", 16, seed + 1)):
        cfg = CLIPConfig(embed_dim=32, image_resolution=resolution,
                         vision_layers=1, vision_width=64,
                         vision_patch_size=patch, transformer_width=64,
                         transformer_heads=1, transformer_layers=1)
        params = init_clip_params(jax.random.PRNGKey(s), cfg)
        state = clip_params_to_torch_state(cfg, params)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state.items()},
                   os.path.join(dirname, fname))
    bpe = os.path.join(dirname, "bpe_simple_vocab_16e6.txt.gz")
    merges = ["#version: fabricated"] + [
        f"{a} {b}</w>" for a, b in
        (("t", "h"), ("a", "n"), ("i", "n"), ("o", "f"), ("r", "e"),
         ("f", "a"), ("c", "e"), ("m", "a"), ("w", "o"), ("e", "d"))]
    with gzip.open(bpe, "wt") as f:
        f.write("\n".join(merges) + "\n")
    return dirname


def fabricate_arcface_pth(path: str, seed: int = 0) -> str:
    """Write a model_ir_se50.pth-format checkpoint via the reference torch
    Backbone (id_loss/model_irse.py — the module IDLoss itself constructs),
    randomly initialized."""
    import os
    import sys

    import torch

    ref = os.environ.get("STYLEMC_REFERENCE", "/root/reference")
    if ref not in sys.path:
        sys.path.append(ref)
    from id_loss.model_irse import Backbone

    net = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    g = torch.Generator().manual_seed(seed)
    state = net.state_dict()
    for k, v in state.items():
        if not torch.is_floating_point(v):
            continue  # num_batches_tracked
        if k.endswith("running_var"):
            # variances must stay positive or BN rsqrt goes NaN
            state[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            state[k] = torch.randn(v.shape, generator=g) * 0.05
    torch.save(state, path)
    return path
