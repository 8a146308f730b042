"""MoCo-v2 feature similarity loss.

Behavioral contract: /root/reference/encoder4editing/criteria/moco_loss.py
:42-66 — resize to 224, ResNet-50 features L2-normalized, loss =
mean(1 − ⟨f(ŷ), stop_grad(f(y))⟩), plus the similarity-improvement metric
(⟨f(ŷ),f(y)⟩ − ⟨f(y),f(x)⟩ averaged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.resnet import resnet50_features
from ..models.clip.preprocess import resize_bicubic


def moco_extract_feats(params, x):
    if x.shape[-1] != 224:
        # F.interpolate(size=224) default mode is 'nearest'; bicubic matmul
        # resize is close and differentiable — nearest as dense matrix:
        x = resize_bicubic(x, 224, 224)
    f = resnet50_features(params, x)
    return f / jnp.linalg.norm(f, axis=1, keepdims=True)


def moco_loss(params, y_hat, y, x):
    f_x = moco_extract_feats(params, x)
    f_y = jax.lax.stop_gradient(moco_extract_feats(params, y))
    f_hat = moco_extract_feats(params, y_hat)
    diff_target = jnp.sum(f_hat * f_y, axis=1)
    diff_views = jnp.sum(f_y * f_x, axis=1)
    loss = jnp.mean(1.0 - diff_target)
    sim_improvement = jnp.mean(diff_target - diff_views)
    return loss, sim_improvement


def e4e_id_loss(arcface_params, y_hat, y, x, layout=None):
    """e4e's 3-way ID loss (criteria/id_loss.py:24-46): same ArcFace crop as
    the top-level id_loss, plus the similarity-improvement metric."""
    from .id_loss import extract_feats

    f_x = extract_feats(arcface_params, x, layout)
    f_y = jax.lax.stop_gradient(extract_feats(arcface_params, y, layout))
    f_hat = extract_feats(arcface_params, y_hat, layout)
    diff_target = jnp.sum(f_hat * f_y, axis=1)
    diff_views = jnp.sum(f_y * f_x, axis=1)
    loss = jnp.mean(1.0 - diff_target)
    sim_improvement = jnp.mean(diff_target - diff_views)
    return loss, sim_improvement
