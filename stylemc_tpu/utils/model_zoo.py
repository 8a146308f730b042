"""Perception-model loading with explicit local paths (zero-egress design).

The reference downloads CLIP via the pip package and reads ArcFace /
MobileNet checkpoints from the working directory (find_direction.py:275,
id_loss/id_loss.py:12). Here every weight file resolves from env vars or
explicit paths; --allow_random_init substitutes random weights so pipelines
stay smoke-testable offline.

Env vars:
  STYLEMC_CLIP_DIR      dir with OpenAI CLIP .pt files
  STYLEMC_CLIP_BPE      bpe_simple_vocab_16e6.txt.gz
  STYLEMC_ARCFACE       model_ir_se50.pth
  STYLEMC_MOBILENET     mobilenet_224_model_best_gdconv_external.pth.tar
  STYLEMC_MTCNN_DIR     dir with pnet/rnet/onet .npy weight files
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax


def load_clip_models(clip_type: str, allow_random_init: bool = False,
                     clip_dir: Optional[str] = None):
    """→ ({'ViT-B/32': (cfg, params), ...}, tokenizer)."""
    from ..models.clip import CLIP_CONFIGS, init_clip_params
    from ..models.clip.load import load_clip, resolve_clip_path
    from ..models.clip.tokenizer import SimpleTokenizer, FallbackTokenizer

    names = {"double": ["ViT-B/32", "ViT-B/16"],
             "large": ["ViT-B/16"],
             "small": ["ViT-B/32"]}[clip_type]

    models: Dict[str, Tuple] = {}
    for i, name in enumerate(names):
        path = resolve_clip_path(name, clip_dir)
        if path is not None:
            models[name] = load_clip(path)
        elif allow_random_init:
            cfg = CLIP_CONFIGS[name]
            models[name] = (cfg, init_clip_params(jax.random.PRNGKey(i), cfg))
        else:
            raise FileNotFoundError(
                f"CLIP weights for {name} not found (set STYLEMC_CLIP_DIR, "
                "or pass --allow_random_init for smoke tests)")
    try:
        tokenizer = SimpleTokenizer()
    except FileNotFoundError:
        if not allow_random_init:
            raise FileNotFoundError(
                "CLIP BPE vocab not found (set STYLEMC_CLIP_BPE, or pass "
                "--allow_random_init for smoke tests)")
        tokenizer = FallbackTokenizer()
    return models, tokenizer


def load_arcface(path: Optional[str] = None, allow_random_init: bool = False):
    from ..models import arcface

    path = path or os.environ.get("STYLEMC_ARCFACE")
    if path and os.path.exists(path):
        from ..io import load_state_dict_numpy
        return arcface.params_from_torch_state(load_state_dict_numpy(path))
    if allow_random_init:
        return arcface.init_backbone_params(jax.random.PRNGKey(42))
    raise FileNotFoundError(
        "ArcFace weights not found (set STYLEMC_ARCFACE to model_ir_se50.pth, "
        "or pass --allow_random_init for smoke tests)")
