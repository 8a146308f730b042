"""Differentiable image ops for perception-in-the-loop losses.

`crop_resize_bilinear` reproduces the reference's host-side face crop
(warp_images.py:71-110 crop_face: square box, zero border outside the
image, cv2.resize INTER_LINEAR to 224²) as a jit-safe, fully
differentiable device op: per-sample separable bilinear sampling expressed
as two batched matmuls (MXU-friendly; no gathers). Out-of-bounds sample
positions receive zero weight — exactly the cv2.copyMakeBorder(0) + resize
composition.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_weights(starts, stops, in_size: int, out_size: int):
    """[B, out, in] bilinear weights for sampling [start, stop) → out
    pixels with cv2's half-pixel convention: src = start + (j+0.5)·scale
    − 0.5, scale = (stop−start)/out, src CLAMPED into the crop
    [start, stop−1] (cv2.resize replicates the crop's border); rows
    outside [0, in) contribute nothing (the crop's zero border)."""
    j = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    scale = (stops - starts) / out_size                       # [B]
    src = j[None, :] * scale[:, None] - 0.5                    # crop frame
    src = jnp.clip(src, 0.0, (stops - starts)[:, None] - 1.0)
    src = src + starts[:, None]                                # image frame
    r = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - r[None, None, :]))


def crop_resize_bilinear(img, boxes, out_size: int = 224):
    """img: [B, C, H, W] float. boxes: [B, 4] (x1, y1, x2, y2) float pixel
    coords, MAY extend past the borders (outside reads as 0). Returns
    [B, C, out, out]. Differentiable w.r.t. img (boxes are data, not
    sample positions that move — matching the host pipeline where MTCNN
    boxes come from the frozen original images)."""
    B, C, H, W = img.shape
    boxes = jnp.asarray(boxes, jnp.float32)
    wy = _axis_weights(boxes[:, 1], boxes[:, 3], H, out_size)  # [B, out, H]
    wx = _axis_weights(boxes[:, 0], boxes[:, 2], W, out_size)  # [B, out, W]
    return jnp.einsum("boh,bchw,bpw->bcop", wy, img.astype(jnp.float32), wx)


def square_crop_box(face_box, margin: float = 1.2) -> np.ndarray:
    """The crop_face box rule (warp_images.py:77-85), float form: a square
    of side min(w, h)·margin centered on the integer box center. face_box:
    (x1, y1, x2, y2[, score]). Returns np [4]."""
    x1, y1, x2, y2 = [float(v) for v in face_box[:4]]
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    size = int(min(w, h) * margin)
    cx = x1 + w // 2
    cy = y1 + h // 2
    nx1 = cx - size // 2
    ny1 = cy - size // 2
    return np.asarray([nx1, ny1, nx1 + size, ny1 + size], np.float32)
