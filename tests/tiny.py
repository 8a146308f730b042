"""Shared tiny model fixtures for trainer tests (CPU-sized)."""

import jax

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params,
)
from stylemc_tpu.models.clip import CLIPConfig, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params

TINY_ARCFACE_LAYOUT = [(8, 8, 2), (8, 16, 2), (16, 16, 1), (16, 32, 2),
                       (32, 32, 2)]

# 4-block e4e encoder body: four stride-2 stages like IR-50, so the FPN
# tap spatials (64/32/16 at 256px input) the style heads assume are kept;
# the full 24-bottleneck fwd+bwd compile is minutes-long on slow hosts.
TINY_E4E_LAYOUT = [(16, 16, 2), (16, 32, 2), (32, 48, 2), (48, 64, 2)]


def tiny_gen(resolution=32):
    cfg = GeneratorConfig(img_resolution=resolution, channel_base=2048,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def tiny_clip_models():
    cfg32 = CLIPConfig(embed_dim=32, image_resolution=224, vision_layers=1,
                       vision_width=64, vision_patch_size=56,
                       transformer_width=64, transformer_heads=2,
                       transformer_layers=1)
    cfg16 = CLIPConfig(embed_dim=32, image_resolution=224, vision_layers=1,
                       vision_width=64, vision_patch_size=112,
                       transformer_width=64, transformer_heads=2,
                       transformer_layers=1)
    return {
        "ViT-B/32": (cfg32, init_clip_params(jax.random.PRNGKey(1), cfg32)),
        "ViT-B/16": (cfg16, init_clip_params(jax.random.PRNGKey(2), cfg16)),
    }


def tiny_arcface():
    return init_backbone_params(jax.random.PRNGKey(3), input_size=112,
                                layout=TINY_ARCFACE_LAYOUT)
