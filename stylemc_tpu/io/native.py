"""Framework-native checkpoint format: one .npz holding the flattened param
pytree plus a JSON-encoded GeneratorConfig. Loads with zero pickle exposure.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple

import numpy as np

from ..models.stylegan2.generator import GeneratorConfig


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif v is not None:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    import jax.numpy as jnp

    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_native(path: str, cfg: GeneratorConfig, params) -> None:
    flat = _flatten(params)
    cfg_dict = dataclasses.asdict(cfg)
    np.savez(path, __config__=json.dumps(cfg_dict), **flat)


def load_native(path: str) -> Tuple[GeneratorConfig, Dict]:
    data = np.load(path, allow_pickle=False)
    cfg_dict = json.loads(str(data["__config__"]))
    if isinstance(cfg_dict.get("resample_filter"), list):
        cfg_dict["resample_filter"] = tuple(cfg_dict["resample_filter"])
    cfg = GeneratorConfig(**cfg_dict)
    flat = {k: data[k] for k in data.files if k != "__config__"}
    return cfg, _unflatten(flat)
