"""ArcFace identity loss.

Behavioral contract: /root/reference/id_loss/id_loss.py:7-39 — adaptive-pool
to 256² if needed, crop rows 35:223 / cols 32:220, adaptive-pool to 112²,
IR-SE-50 embed, loss = mean(1 − ⟨f(edited), stop_grad(f(original))⟩).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.arcface import backbone_apply
from ..utils.image import adaptive_avg_pool2d


def extract_feats(arcface_params, x, layout=None):
    """x: [N,3,H,W] in [-1,1] → L2-normalized [N,512]."""
    if x.shape[2] != 256:
        x = adaptive_avg_pool2d(x, 256, 256)
    x = x[:, :, 35:223, 32:220]
    x = adaptive_avg_pool2d(x, 112, 112)
    return backbone_apply(arcface_params, x, layout=layout)


def id_loss(arcface_params, y_hat, y, layout=None):
    """y_hat: edited image, y: original (features detached, matching
    reference y_feats.detach() at id_loss.py:30)."""
    f_y = jax.lax.stop_gradient(extract_feats(arcface_params, y, layout))
    f_hat = extract_feats(arcface_params, y_hat, layout)
    return jnp.mean(1.0 - jnp.sum(f_hat * f_y, axis=1))
