"""CLIP oracle vs an INDEPENDENT implementation (HuggingFace transformers).

The reference consumes OpenAI's pip `clip` package (clip_loss.py:10-13),
which is not installable here; our CLIP is a from-scratch JAX ViT/text
tower importing the OpenAI state-dict namespace. transformers' CLIPModel is
an independent, widely-validated implementation of the same architecture —
a random-init tiny CLIPModel, renamed into the OpenAI namespace and loaded
through our importer, must produce the same image/text features. This
cross-checks attention, quick-gelu MLPs, pre/post layernorms, class-token
pooling, causal masking, and EOT pooling against code we did not write.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stylemc_tpu.models.clip.model import (
    CLIPConfig, params_from_torch_state, encode_image, encode_text,
)

transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow  # ~85 s: HF model init + three compiles


VOCAB = 1000
EOS = VOCAB - 1  # also the max token id → argmax pooling == EOS pooling


def _tiny_hf_clip():
    cfg = transformers.CLIPConfig(
        projection_dim=32,
        vision_config={
            "hidden_size": 128, "intermediate_size": 512,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 56, "patch_size": 14, "hidden_act": "quick_gelu",
        },
        text_config={
            "hidden_size": 64, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 77, "vocab_size": VOCAB,
            "hidden_act": "quick_gelu", "eos_token_id": EOS,
            "bos_token_id": EOS - 1, "pad_token_id": 0,
        },
    )
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval()


def _hf_to_openai_state(model) -> dict:
    """Rename the HF CLIPModel state dict into the OpenAI `clip` namespace
    our params_from_torch_state consumes."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {}

    def block(src, dst):
        for i in ("1", "2"):
            out[f"{dst}.ln_{i}.weight"] = sd[f"{src}.layer_norm{i}.weight"]
            out[f"{dst}.ln_{i}.bias"] = sd[f"{src}.layer_norm{i}.bias"]
        out[f"{dst}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.weight"] for n in "qkv"])
        out[f"{dst}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.bias"] for n in "qkv"])
        out[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        out[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        out[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
        out[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
        out[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
        out[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]

    # vision tower
    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].T
    n_v = model.config.vision_config.num_hidden_layers
    for i in range(n_v):
        block(f"vision_model.encoder.layers.{i}",
              f"visual.transformer.resblocks.{i}")
    # text tower
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].T
    out["logit_scale"] = sd["logit_scale"]
    n_t = model.config.text_config.num_hidden_layers
    for i in range(n_t):
        block(f"text_model.encoder.layers.{i}", f"transformer.resblocks.{i}")
    return out


@pytest.fixture(scope="module")
def clip_pair():
    hf = _tiny_hf_clip()
    cfg = CLIPConfig(embed_dim=32, image_resolution=56, vision_layers=2,
                     vision_width=128, vision_patch_size=14,
                     context_length=77, vocab_size=VOCAB,
                     transformer_width=64, transformer_heads=2,
                     transformer_layers=2)
    params = params_from_torch_state(_hf_to_openai_state(hf), cfg)
    return hf, cfg, params


def test_image_features_match_hf(clip_pair):
    hf, cfg, params = clip_pair
    rng = np.random.RandomState(0)
    pixels = rng.randn(3, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(pixels))
    ours = encode_image(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=2e-5)


def test_text_features_match_hf(clip_pair):
    hf, cfg, params = clip_pair
    rng = np.random.RandomState(1)
    # tokens: ids < EOS everywhere, one EOS per row (so OpenAI argmax
    # pooling and HF eos pooling select the same position)
    tokens = rng.randint(1, EOS - 1, size=(4, 77))
    eot_pos = rng.randint(5, 76, size=(4,))
    for r, p in enumerate(eot_pos):
        tokens[r, p] = EOS
        tokens[r, p + 1:] = 0
    with torch.no_grad():
        ref = hf.get_text_features(input_ids=torch.from_numpy(tokens),
                                   attention_mask=torch.ones_like(
                                       torch.from_numpy(tokens)))
    ours = encode_text(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=2e-5)


def test_cosine_similarity_matrix_matches_hf(clip_pair):
    # the quantity the StyleMC CLIP losses actually consume
    hf, cfg, params = clip_pair
    rng = np.random.RandomState(2)
    pixels = rng.randn(2, 3, 56, 56).astype(np.float32)
    tokens = rng.randint(1, EOS - 1, size=(2, 77))
    tokens[:, 10] = EOS
    tokens[:, 11:] = 0
    with torch.no_grad():
        i_ref = hf.get_image_features(pixel_values=torch.from_numpy(pixels)).numpy()
        t_ref = hf.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T

    i_ours = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    t_ours = np.asarray(encode_text(params, cfg, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(cos(i_ours, t_ours), cos(i_ref, t_ref),
                               rtol=0, atol=1e-5)
