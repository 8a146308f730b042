"""StyleMC CLIP loss (the default `clip_loss_type`).

Behavioral contract: /root/reference/clip_loss.py:7-34 — text direction is
E_T(prompt) − E_T(negative_prompt), normalized once at setup; per step the
image direction E_I(edited) − E_I(source) is normalized and the loss is the
mean of (1 − cosine similarity) against the text direction.

Pure-function design: `make_text_direction` runs once outside jit;
`clip_directional_loss` is traced into the training graph (the CLIP image
encoder backprops end-to-end).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.clip import encode_image, encode_text


def make_text_direction(clip_params, clip_cfg, tokens_pos, tokens_neg):
    """→ normalized [1, embed_dim] text direction."""
    f_pos = encode_text(clip_params, clip_cfg, tokens_pos)
    f_neg = encode_text(clip_params, clip_cfg, tokens_neg)
    d = f_pos - f_neg
    return d / jnp.linalg.norm(d, axis=1, keepdims=True)


def clip_directional_loss(clip_params, clip_cfg, src_image, tgt_image,
                          text_direction):
    """src/tgt_image: CLIP-preprocessed [N,3,224,224]. → scalar loss."""
    f_src = encode_image(clip_params, clip_cfg, src_image)
    f_tgt = encode_image(clip_params, clip_cfg, tgt_image)
    d = f_tgt - f_src
    # norm clamped: a zero edit direction (identical images — e.g. a zero
    # delta under 'const' noise) must yield loss 1 with finite grads, not NaN
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    cos = jnp.sum(d * text_direction.astype(d.dtype), axis=1) / \
        jnp.linalg.norm(text_direction, axis=1)
    return jnp.mean(1.0 - cos)
