"""Experiment logging: wandb when installed, JSONL + image files otherwise.

Behavioral contract: the reference's wandb usage (find_direction.py:249,
326-331; train_latent_mapper.py:93,179-184) — run config capture, scalar
logging with step, image logging every 100 iterations. In zero-egress
deployments the JSONL backend records the same stream to
{outdir}/wandb_log.jsonl + images/.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class RunLogger:
    def __init__(self, project: str, config: Optional[Dict] = None,
                 outdir: str = ".", use_wandb: Optional[bool] = None):
        self.outdir = outdir
        self._wandb = None
        if use_wandb is not False:
            try:
                import wandb  # noqa: F401
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except ImportError:
                if use_wandb is True:
                    raise
        if self._wandb is None:
            os.makedirs(outdir, exist_ok=True)
            self._file = open(os.path.join(outdir, "wandb_log.jsonl"), "a")
            self._file.write(json.dumps(
                {"event": "init", "project": project, "time": time.time(),
                 "config": config or {}}) + "\n")
            self._file.flush()
            os.makedirs(os.path.join(outdir, "images"), exist_ok=True)

    def log(self, values: Dict[str, Any], step: Optional[int] = None):
        scalars = {}
        for k, v in values.items():
            if isinstance(v, np.ndarray) and v.ndim >= 2:
                self.log_image(k, v, step)
            else:
                try:
                    scalars[k] = float(v)
                except (TypeError, ValueError):
                    scalars[k] = str(v)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        else:
            self._file.write(json.dumps({"step": step, **scalars}) + "\n")
            self._file.flush()

    def log_image(self, name: str, img_u8: np.ndarray,
                  step: Optional[int] = None):
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(img_u8)}, step=step)
            return
        from PIL import Image
        path = os.path.join(self.outdir, "images",
                            f"{name.replace('/', '_')}_{step or 0:06d}.png")
        Image.fromarray(np.asarray(img_u8, np.uint8)).save(path)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        elif hasattr(self, "_file"):
            self._file.close()
