"""Load OpenAI CLIP checkpoints (TorchScript .pt archives or plain state
dicts) into (CLIPConfig, params). The reference gets these via
clip.load("ViT-B/32") downloads (/root/reference/clip_loss.py:11-13); here
the file path is supplied explicitly (or via STYLEMC_CLIP_DIR)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from .model import CLIPConfig, config_from_torch_state, params_from_torch_state

_MODEL_FILES = {
    "ViT-B/32": "ViT-B-32.pt",
    "ViT-B/16": "ViT-B-16.pt",
    "RN50": "RN50.pt",
}


def _state_dict_from_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd:
            sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().float().numpy()
    # TorchScript archives prefix context_length etc as buffers; drop scalars
    # that aren't part of the functional params.
    out.pop("input_resolution", None)
    out.pop("context_length", None)
    out.pop("vocab_size", None)
    return out


def resolve_clip_path(name: str, clip_dir: Optional[str] = None) -> Optional[str]:
    clip_dir = clip_dir or os.environ.get("STYLEMC_CLIP_DIR")
    if clip_dir is None:
        return None
    fname = _MODEL_FILES.get(name, name.replace("/", "-") + ".pt")
    path = os.path.join(clip_dir, fname)
    return path if os.path.exists(path) else None


def load_clip(name_or_path: str, clip_dir: Optional[str] = None
              ) -> Tuple[CLIPConfig, Dict]:
    """name_or_path: 'ViT-B/32' | 'ViT-B/16' | 'RN50' | explicit file path."""
    path = name_or_path if os.path.exists(name_or_path) else \
        resolve_clip_path(name_or_path, clip_dir)
    if path is None:
        raise FileNotFoundError(
            f"CLIP checkpoint {name_or_path!r} not found; set STYLEMC_CLIP_DIR "
            "to a directory containing the OpenAI .pt files")
    state = _state_dict_from_file(path)
    cfg = config_from_torch_state(state)
    return cfg, params_from_torch_state(state, cfg)
