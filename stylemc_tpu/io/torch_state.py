"""Read torch `.pth`/`.pt` state dicts into numpy, without trusting pickled
code (torch.load(weights_only=True)). Used for ArcFace / e4e / MobileNet /
DeepLab checkpoint import (reference loads: id_loss/id_loss.py:12,
find_direction.py:275, encoder4editing/models/psp.py:41)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_state_dict_numpy(path: str, key: str | None = None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint as {name: np.ndarray}.

    Args:
      path: .pth/.pt/.tar file.
      key: optional sub-dict key (e.g. 'state_dict' for the MobileNet tar).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if key is not None:
        obj = obj[key]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for name, val in obj.items():
        if hasattr(val, "detach"):
            out[name] = val.detach().cpu().numpy()
        elif isinstance(val, np.ndarray):
            out[name] = val
    return out


def strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Filter to keys under `prefix` and strip it (the e4e key-split pattern,
    psp.py:11)."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in state.items() if k.startswith(prefix)}
