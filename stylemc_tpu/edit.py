"""S-space edit application (the generate_fromS pipeline as a library).

Behavioral contract: /root/reference/generate_fromS.py:58-209 — per item,
render [original | edited] where edited styles = styles + direction ·
change_power; the direction comes from a saved global direction or a Mapper
(with |δ|<0.1 thresholding + STOPLIST zeroing when use_whitelist,
generate_fromS.py:149-162); optional DeepLab feature blending regenerates
the edited image with earring(32)/bg(64)/teeth(64) masks; optional second
generator renders the edited image (domain transfer).

TPU-first: rendering is batched across items in one jit'd synthesis call
(the reference loops item-by-item); blending masks are resized host-side
(cv2 INTER_AREA parity) and fed as arrays.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.stylegan2.generator import (
    GeneratorConfig, synthesis, N_STYLE_CHANNELS, STYLE_DIM,
    S_TRAINABLE_SPACE_CHANNELS,
)
from .models.mapper import mapper_apply

# reference generate_fromS.py:30-35
WHITELIST_S_IDS = [3405, 5886, 1713, 4934, 4845, 3216, 3583, 4878, 6605, 5711,
                   6487, 4223, 3264, 3122, 5644, 5700, 4595, 4821, 4815, 6289,
                   6388, 4844, 4838, 4982, 5822, 6301, 3447, 1827, 5836, 3203,
                   6264, 4866, 6047, 1718, 4842, 5807, 3262, 4750, 6129, 4353,
                   6293, 3134, 4752, 3352, 3116, 5748, 5091, 3266, 6326, 6504,
                   3103, 1917, 3359, 3176, 3349, 4848, 6461, 3267, 1968, 3153,
                   3351, 5673, 4351, 6452, 4676]
STOPLIST_S_IDS = [4863, 6247, 4943, 4724, 3114, 4623, 4726]

TRAINABLE = list(S_TRAINABLE_SPACE_CHANNELS)


def mapper_direction(mapper_params, styles_item, neg_slope: float = 0.01,
                     use_whitelist: bool = False):
    """Per-item direction from a Mapper (reference generate_fromS.py:149-162).

    styles_item: [26, 512] → direction [1, 26, 512]."""
    delta = mapper_apply(mapper_params, styles_item[None, TRAINABLE], neg_slope)
    if use_whitelist:
        delta = jnp.where(jnp.abs(delta) < 0.1, 0.0, delta)
    direction = jnp.zeros((1, N_STYLE_CHANNELS, STYLE_DIM), delta.dtype)
    direction = direction.at[:, TRAINABLE].set(delta)
    if use_whitelist:
        flat_ids = np.asarray(STOPLIST_S_IDS)
        mask = np.zeros(N_STYLE_CHANNELS * STYLE_DIM, dtype=bool)
        mask[flat_ids] = True
        direction = jnp.where(jnp.asarray(mask.reshape(1, N_STYLE_CHANNELS,
                                                       STYLE_DIM)),
                              0.0, direction)
    return direction


def mapper_directions_batched(mapper_params, styles, neg_slope: float = 0.01,
                              use_whitelist: bool = False):
    """Batched per-item mapper directions: styles [N, 26, 512] →
    directions [N, 26, 512] in one mapper_apply call (the reference computes
    them one item at a time, generate_fromS.py:147-162)."""
    delta = mapper_apply(mapper_params, styles[:, TRAINABLE], neg_slope)
    if use_whitelist:
        delta = jnp.where(jnp.abs(delta) < 0.1, 0.0, delta)
    n = styles.shape[0]
    directions = jnp.zeros((n, N_STYLE_CHANNELS, STYLE_DIM), delta.dtype)
    directions = directions.at[:, TRAINABLE].set(delta)
    if use_whitelist:
        mask = np.zeros(N_STYLE_CHANNELS * STYLE_DIM, dtype=bool)
        mask[np.asarray(STOPLIST_S_IDS)] = True
        directions = jnp.where(
            jnp.asarray(mask.reshape(1, N_STYLE_CHANNELS, STYLE_DIM)),
            0.0, directions)
    return directions


def to_u8_nhwc(img) -> jnp.ndarray:
    """[N,3,H,W] in [-1,1] → uint8 [N,H,W,3], traceable (jit-safe).

    THE framework-wide [-1,1]→uint8 convention (reference
    generate_fromS.py:174-175: img·127.5+128, clamp, round-to-zero cast).
    Inside a jit this runs on device — a quarter of the fp32 NCHW bytes
    over the host link."""
    return jnp.clip(jnp.transpose(img, (0, 2, 3, 1)) * 127.5 + 128,
                    0, 255).astype(jnp.uint8)


def to_uint8_hwc(img) -> np.ndarray:
    """Host-side to_u8_nhwc: fetches the result as a numpy array."""
    return np.asarray(to_u8_nhwc(img))


def resize_mask_area(mask: np.ndarray, res: int) -> np.ndarray:
    """cv2.resize(..., INTER_AREA) parity for blending masks
    (reference utils.py:191-198)."""
    import cv2
    return cv2.resize(mask.astype("float"), (res, res),
                      interpolation=cv2.INTER_AREA)


def apply_edit_batch(gen_params, gen_cfg: GeneratorConfig, styles,
                     direction, change_power: float,
                     noise_mode: str = "const",
                     gen2: Optional[Tuple] = None):
    """Batched [original | edited] rendering.

    styles: [N, 26, 512]; direction: [N or 1, 26, 512].
    Returns (orig_imgs, edited_imgs) float [-1,1] NCHW."""
    from .models.stylegan2.generator import synthesis_jit
    e_params, e_cfg = gen2 if gen2 is not None else (gen_params, gen_cfg)
    orig = synthesis_jit(gen_params, gen_cfg, styles, noise_mode=noise_mode)
    edited = synthesis_jit(e_params, e_cfg, styles + direction * change_power,
                           noise_mode=noise_mode)
    return orig, edited


def apply_edit_item_with_blending(gen_params, gen_cfg: GeneratorConfig,
                                  styles_item, direction,
                                  change_power: float,
                                  segmenter,
                                  text_prompt: str = "",
                                  noise_mode: str = "const",
                                  gen2: Optional[Tuple] = None):
    """Full reference flow for one item with DeepLab feature blending
    (generate_fromS.py:138-204). `segmenter` must provide
    get_bg_mask(img_u8) and get_earring_mouth_teeth_masks(img_u8,
    need_earring_mask) on uint8 HWC images.

    Returns (orig_u8, edited_u8) HWC uint8."""
    e_params, e_cfg = gen2 if gen2 is not None else (gen_params, gen_cfg)
    s = styles_item[None]

    xs_original, img0 = synthesis(gen_params, gen_cfg, s,
                                  noise_mode=noise_mode, return_features=True)
    orig_u8 = to_uint8_hwc(img0)[0]
    bg_mask = segmenter.get_bg_mask(orig_u8)

    s2 = s + direction * change_power
    img1 = synthesis(e_params, e_cfg, s2, noise_mode=noise_mode)
    edited_u8 = to_uint8_hwc(img1)[0]
    earring_mask, mouth_mask, teeth_mask = \
        segmenter.get_earring_mouth_teeth_masks(
            edited_u8, need_earring_mask="face of a man" not in text_prompt)

    blend_masks: Dict[int, List] = {}
    if earring_mask is not None:
        blend_masks.setdefault(32, []).append(
            jnp.asarray(resize_mask_area(earring_mask, 32))[None, None])
    masks64 = []
    if bg_mask is not None:
        masks64.append(jnp.asarray(resize_mask_area(bg_mask, 64))[None, None])
    if teeth_mask is not None:
        masks64.append(jnp.asarray(resize_mask_area(teeth_mask, 64))[None, None])
    if masks64:
        blend_masks[64] = masks64

    img1b = synthesis(e_params, e_cfg, s2, noise_mode=noise_mode,
                      blend_masks=blend_masks, xs_original=xs_original)
    return orig_u8, to_uint8_hwc(img1b)[0]
