"""Latent-codes discriminator + W pool.

Behavioral contracts:
  * LatentCodesDiscriminator — 4-layer LeakyReLU(0.2) MLP over single w
    vectors (/root/reference/encoder4editing/models/discriminator.py:4-20).
  * LatentCodesPool — image-pool trick over W codes
    (/root/reference/encoder4editing/models/latent_codes_pool.py:21-55).
"""

from __future__ import annotations

import random
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_discriminator_params(key, style_dim: int = 512,
                              n_mlp: int = 4) -> Dict[str, Any]:
    params = {}
    dims = [style_dim] * n_mlp + [1]
    ks = jax.random.split(key, n_mlp + 1)
    for i in range(n_mlp + 1):
        bound = 1.0 / np.sqrt(dims[max(i - 1, 0)] if i else style_dim)
        params[f"fc{i}"] = {
            "weight": jax.random.uniform(ks[i], (dims[i],
                                                 style_dim if i == 0 else dims[i - 1]),
                                         minval=-bound, maxval=bound),
            "bias": jnp.zeros((dims[i],)),
        }
    return params


def discriminator_apply(params, w, n_mlp: int = 4):
    """w: [N, 512] → logits [N, 1]."""
    x = w
    for i in range(n_mlp + 1):
        p = params[f"fc{i}"]
        x = x @ p["weight"].T.astype(x.dtype) + p["bias"].astype(x.dtype)
        if i < n_mlp:
            x = jnp.where(x >= 0, x, 0.2 * x)
    return x


class LatentCodesPool:
    """Query-replace pool (reference latent_codes_pool.py). Host-side."""

    def __init__(self, pool_size: int):
        self.pool_size = pool_size
        self.num_ws = 0
        self.ws = []

    def query(self, ws):
        if self.pool_size == 0:
            return ws
        ws = np.asarray(ws)
        return_ws = []
        for w in ws:  # [num_ws, 512] or [512]
            if w.ndim == 2:
                i = random.randint(0, len(w) - 1)
                w = w[i]
            self._handle_w(w, return_ws)
        return np.stack(return_ws, axis=0)

    def _handle_w(self, w, return_ws):
        if self.num_ws < self.pool_size:
            self.num_ws += 1
            self.ws.append(w)
            return_ws.append(w)
        else:
            p = random.uniform(0, 1)
            if p > 0.5:
                random_id = random.randint(0, self.pool_size - 1)
                tmp = self.ws[random_id].copy()
                self.ws[random_id] = w
                return_ws.append(tmp)
            else:
                return_ws.append(w)
