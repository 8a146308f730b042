"""W-norm regularizer (reference encoder4editing/criteria/w_norm.py:5-14):
mean squared distance of latents from latent_avg (or from 0)."""

from __future__ import annotations

import jax.numpy as jnp


def w_norm_loss(latent, latent_avg=None, start_from_latent_avg: bool = True):
    if start_from_latent_avg and latent_avg is not None:
        latent = latent - latent_avg.astype(latent.dtype)
    return jnp.sum(jnp.square(latent)) / latent.shape[0]
