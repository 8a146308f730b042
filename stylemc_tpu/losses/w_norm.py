"""W-norm regularizer (reference encoder4editing/criteria/w_norm.py:5-14):
mean over the batch of the per-sample L2 norm of (latent - latent_avg),
the norm taken over the (style, channel) dims — `latent.norm(2, dim=(1, 2))`
summed and divided by N (torch-oracle-tested)."""

from __future__ import annotations

import jax.numpy as jnp


def w_norm_loss(latent, latent_avg=None, start_from_latent_avg: bool = True):
    if start_from_latent_avg and latent_avg is not None:
        latent = latent - latent_avg.astype(latent.dtype)
    per_sample = jnp.sqrt(jnp.sum(jnp.square(latent), axis=(1, 2)))
    return jnp.sum(per_sample) / latent.shape[0]
