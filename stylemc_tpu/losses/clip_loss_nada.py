"""StyleGAN-NADA CLIP loss suite.

Behavioral contract: /root/reference/clip_loss_nada.py:12-346 — template-
averaged text directions (27 imagenet templates), directional loss
(1 − cos of image-pair direction vs text direction), global contrastive loss
(1 − logits/100), manifold/angle loss (L1 between image-pair cosine and
text-pair cosine), texture loss (MSE between RN50 embeddings), patch losses.

Pure-function design: text features are precomputed into a `NADATextAnchors`
bundle outside jit; the per-step losses are jit-traceable. The reference's
NADA preprocessing ((x+1)/2 → resize 224 bicubic → center crop → CLIP
normalize, clip_loss_nada.py:72-75) is `preprocess_nada`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import encode_image, encode_text, tokenize
from ..models.clip.preprocess import (resize_short_side, center_crop,
                                      clip_mean_std)

# reference clip_loss_nada.py:12-40
imagenet_templates_small = [
    "a photo of a {}.", "a rendering of a {}.", "a cropped photo of the {}.",
    "the photo of a {}.", "a photo of a clean {}.", "a photo of a dirty {}.",
    "a dark photo of the {}.", "a photo of my {}.", "a photo of the cool {}.",
    "a close-up photo of a {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a photo of the {}.", "a good photo of the {}.",
    "a photo of one {}.", "a close-up photo of the {}.", "a rendition of the {}.",
    "a photo of the clean {}.", "a rendition of a {}.", "a photo of a nice {}.",
    "a good photo of a {}.", "a photo of the nice {}.",
    "a photo of the small {}.", "a photo of the weird {}.",
    "a photo of the large {}.", "a photo of a cool {}.",
    "a photo of a small {}.",
]


def preprocess_nada(img, img_size: int = 224):
    """GAN output [-1,1] → CLIP input (no 0..255 clamp, unlike unprocess)."""
    x = (img + 1.0) / 2.0
    x = resize_short_side(x, img_size)
    x = center_crop(x, img_size)
    mean, std = clip_mean_std(x.dtype)
    return (x - mean) / std


def direction_loss(x, y, loss_type: str = "cosine"):
    """reference DirectionLoss (clip_loss_nada.py:43-59)."""
    if loss_type == "cosine":
        cos = jnp.sum(x * y, axis=-1) / (
            jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1))
        return jnp.mean(1.0 - cos)
    if loss_type == "mse":
        return jnp.mean(jnp.square(x - y))
    if loss_type == "mae":
        return jnp.mean(jnp.abs(x - y))
    raise ValueError(loss_type)


def compose_text_with_templates(text: str, templates=imagenet_templates_small):
    return [t.format(text) for t in templates]


def get_text_features(clip_params, clip_cfg, class_str: str, tokenizer=None,
                      templates=imagenet_templates_small, norm: bool = True):
    tokens = jnp.asarray(tokenize(compose_text_with_templates(class_str, templates),
                                  tokenizer=tokenizer))
    f = encode_text(clip_params, clip_cfg, tokens)
    if norm:
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    return f


def compute_text_direction(clip_params, clip_cfg, source_class: str,
                           target_class: str, tokenizer=None):
    src = get_text_features(clip_params, clip_cfg, source_class, tokenizer)
    tgt = get_text_features(clip_params, clip_cfg, target_class, tokenizer)
    d = jnp.mean(tgt - src, axis=0, keepdims=True)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@dataclasses.dataclass
class NADATextAnchors:
    """Precomputed text features for one (source_class, target_class) pair."""
    target_direction: jnp.ndarray           # [1, D]
    src_text_features: jnp.ndarray          # [1, D]
    target_text_features: jnp.ndarray       # [1, D]
    global_tokens: jnp.ndarray              # [1, 77] for "a {target_class}"

    @classmethod
    def create(cls, clip_params, clip_cfg, source_class: str, target_class: str,
               tokenizer=None):
        src = get_text_features(clip_params, clip_cfg, source_class, tokenizer)
        tgt = get_text_features(clip_params, clip_cfg, target_class, tokenizer)
        d = jnp.mean(tgt - src, axis=0, keepdims=True)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sm = jnp.mean(src, axis=0, keepdims=True)
        tm = jnp.mean(tgt, axis=0, keepdims=True)
        return cls(
            target_direction=d,
            src_text_features=sm / jnp.linalg.norm(sm, axis=-1, keepdims=True),
            target_text_features=tm / jnp.linalg.norm(tm, axis=-1, keepdims=True),
            global_tokens=jnp.asarray(tokenize([f"a {target_class}"],
                                               tokenizer=tokenizer)),
        )


def _image_features(clip_params, clip_cfg, img):
    f = encode_image(clip_params, clip_cfg,
                     preprocess_nada(img, clip_cfg.image_resolution))
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def clip_directional_loss_nada(clip_params, clip_cfg, src_img, target_img,
                               anchors: NADATextAnchors,
                               direction_loss_type: str = "cosine"):
    src = _image_features(clip_params, clip_cfg, src_img)
    tgt = _image_features(clip_params, clip_cfg, target_img)
    edit = tgt - src
    edit = edit / jnp.maximum(jnp.linalg.norm(edit, axis=-1, keepdims=True),
                              1e-6)
    return direction_loss(edit, anchors.target_direction.astype(edit.dtype),
                          direction_loss_type)


def global_clip_loss(clip_params, clip_cfg, img, anchors: NADATextAnchors):
    """(1 - logits/100).mean() with logit_scale-weighted contrastive logits
    (reference clip_loss_nada.py:220-229)."""
    image_f = encode_image(clip_params, clip_cfg,
                           preprocess_nada(img, clip_cfg.image_resolution))
    text_f = encode_text(clip_params, clip_cfg, anchors.global_tokens)
    image_f = image_f / jnp.linalg.norm(image_f, axis=-1, keepdims=True)
    text_f = text_f / jnp.linalg.norm(text_f, axis=-1, keepdims=True)
    logit_scale = jnp.exp(clip_params["logit_scale"])
    logits = logit_scale * image_f @ text_f.T
    return jnp.mean(1.0 - logits / 100.0)


def clip_angle_loss(clip_params, clip_cfg, src_img, target_img,
                    anchors: NADATextAnchors):
    cos_text = anchors.target_text_features @ anchors.src_text_features.T
    src = _image_features(clip_params, clip_cfg, src_img)[:, :, None]
    tgt = _image_features(clip_params, clip_cfg, target_img)[:, None, :]
    cos_img = jnp.clip(tgt @ src, -1.0, 1.0)
    cos_text_b = jnp.broadcast_to(cos_text[None], cos_img.shape)
    return jnp.mean(jnp.abs(cos_img - cos_text_b))


def cnn_feature_loss(rn_params, rn_cfg, src_img, target_img):
    """RN50 embedding MSE (texture loss, clip_loss_nada.py:318-322)."""
    f_src = encode_image(rn_params, rn_cfg,
                         preprocess_nada(src_img, rn_cfg.image_resolution))
    f_tgt = encode_image(rn_params, rn_cfg,
                         preprocess_nada(target_img, rn_cfg.image_resolution))
    return jnp.mean(jnp.square(f_src - f_tgt))


def nada_loss(clip_params, clip_cfg, src_img, target_img,
              anchors: NADATextAnchors,
              lambda_direction: float = 1.0, lambda_global: float = 0.0,
              lambda_manifold: float = 0.0,
              rn_params=None, rn_cfg=None, texture_image=None,
              lambda_texture: float = 0.0,
              direction_loss_type: str = "cosine"):
    """Composite NADA loss (reference forward, clip_loss_nada.py:324-346).
    Patch losses are provided separately (see patch_directional_loss) since
    they need random patch centers from the host."""
    loss = 0.0
    if lambda_global:
        loss += lambda_global * global_clip_loss(clip_params, clip_cfg,
                                                 target_img, anchors)
    if lambda_direction:
        loss += lambda_direction * clip_directional_loss_nada(
            clip_params, clip_cfg, src_img, target_img, anchors,
            direction_loss_type)
    if lambda_manifold:
        loss += lambda_manifold * clip_angle_loss(clip_params, clip_cfg,
                                                  src_img, target_img, anchors)
    if lambda_texture and texture_image is not None and rn_params is not None:
        loss += lambda_texture * cnn_feature_loss(rn_params, rn_cfg,
                                                  texture_image, target_img)
    return loss


def generate_patches(img, patch_centers, size: int):
    """Static-shape patch extraction via dynamic_slice; patch_centers
    [N*P, 2] (x, y) ints (reference clip_loss_nada.py:241-260)."""
    n = img.shape[0]
    num_patches = patch_centers.shape[0] // n
    half = size // 2
    patches = []
    for b in range(n):
        for p in range(num_patches):
            cx = patch_centers[b * num_patches + p, 0]
            cy = patch_centers[b * num_patches + p, 1]
            patch = jax.lax.dynamic_slice(
                img[b], (0, cy - half, cx - half),
                (img.shape[1], size, size))
            patches.append(patch)
    return jnp.stack(patches, axis=0)


def patch_directional_loss(clip_params, clip_cfg, src_img, target_img,
                           patch_text_directions, patch_centers,
                           patch_size: int = 510):
    """reference clip_loss_nada.py:286-316."""
    src_p = generate_patches(src_img, patch_centers, patch_size)
    tgt_p = generate_patches(target_img, patch_centers, patch_size)
    f_src = _image_features(clip_params, clip_cfg, src_p)
    f_tgt = _image_features(clip_params, clip_cfg, tgt_p)
    edit = f_tgt - f_src
    edit = edit / jnp.linalg.norm(edit, axis=-1, keepdims=True)
    ptd = patch_text_directions.astype(edit.dtype)
    cos = (edit[:, None, :] * ptd[None, :, :]).sum(-1)
    cosine_dists = 1.0 - cos
    scores = cosine_dists * jax.nn.softmax(edit @ ptd.T, axis=-1)
    return jnp.mean(scores)
