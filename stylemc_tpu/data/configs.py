"""Dataset registry + per-task transform configs.

Behavioral contract: /root/reference/encoder4editing/configs/
{paths_config,data_configs,transforms_config}.py — dataset types map to
source/target roots and transform sets. Paths resolve from a user-editable
registry (env var STYLEMC_DATASETS_JSON or defaults below).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional


@dataclasses.dataclass
class TransformsConfig:
    size: int = 256
    train_flip: bool = True


@dataclasses.dataclass
class DatasetSpec:
    train_source_root: str = ""
    train_target_root: str = ""
    test_source_root: str = ""
    test_target_root: str = ""
    transforms: TransformsConfig = dataclasses.field(
        default_factory=TransformsConfig)


DATASETS: Dict[str, DatasetSpec] = {
    "ffhq_encode": DatasetSpec(),
    "celeba_encode": DatasetSpec(),
    "cars_encode": DatasetSpec(transforms=TransformsConfig(size=256)),
    "church_encode": DatasetSpec(),
    "horse_encode": DatasetSpec(),
}


def load_registry(path: Optional[str] = None) -> Dict[str, DatasetSpec]:
    """Overlay dataset roots from a JSON registry file
    ({dataset_type: {train_source_root: ..., ...}})."""
    path = path or os.environ.get("STYLEMC_DATASETS_JSON")
    out = dict(DATASETS)
    if path and os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        for name, spec in data.items():
            base = dataclasses.asdict(out.get(name, DatasetSpec()))
            tf = base.pop("transforms")
            base.update({k: v for k, v in spec.items() if k != "transforms"})
            if "transforms" in spec:
                tf.update(spec["transforms"])
            out[name] = DatasetSpec(transforms=TransformsConfig(**tf), **base)
    return out


# model-weight path registry (reference paths_config.model_paths)
model_paths = {
    "stylegan_ffhq": os.environ.get("STYLEMC_STYLEGAN_FFHQ", ""),
    "ir_se50": os.environ.get("STYLEMC_ARCFACE", ""),
    "moco": os.environ.get("STYLEMC_MOCO", ""),
    "deeplab": os.environ.get("STYLEMC_DEEPLAB", ""),
    "mtcnn_dir": os.environ.get("STYLEMC_MTCNN_DIR", ""),
    "mobilenet": os.environ.get("STYLEMC_MOBILENET", ""),
    "clip_dir": os.environ.get("STYLEMC_CLIP_DIR", ""),
    "inception": os.environ.get("STYLEMC_INCEPTION", ""),
}
