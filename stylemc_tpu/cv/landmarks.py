"""Host-side landmark detection pipeline: MTCNN detect → crop_face →
MobileNet landmarker → un-crop to image coordinates.

Behavioral contracts: /root/reference/warp_images.py:71-110 (crop_face:
1.2x square crop around the best box, zero border, resize 224) and
find_direction.py:55-97 / align_faces.py:26-58 (landmark coordinate
mapping lm·crop_size + bbox_origin).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def crop_face(img: np.ndarray, faces, out_size: int = 224):
    """img: uint8 HWC. faces: [n,5] boxes (first is used).
    → (cropped uint8 [out,out,3], orig_crop_size, bbox)."""
    import cv2

    height, width = img.shape[:2]
    x1, y1, x2, y2 = faces[0][:4]
    w = x2 - x1 + 1
    h = y2 - y1 + 1
    size = int(min([w, h]) * 1.2)
    cx = x1 + w // 2
    cy = y1 + h // 2
    x1 = cx - size // 2
    x2 = x1 + size
    y1 = cy - size // 2
    y2 = y1 + size

    dx = max(0, -x1)
    dy = max(0, -y1)
    x1 = max(0, x1)
    y1 = max(0, y1)
    edx = max(0, x2 - width)
    edy = max(0, y2 - height)
    x2 = min(width, x2)
    y2 = min(height, y2)
    new_bbox = list(map(int, [x1, y1, x2, y2]))

    cropped = img[new_bbox[1]:new_bbox[3], new_bbox[0]:new_bbox[2]]
    if dx > 0 or dy > 0 or edx > 0 or edy > 0:
        cropped = cv2.copyMakeBorder(cropped, int(dy), int(edy), int(dx),
                                     int(edx), cv2.BORDER_CONSTANT, 0)
    cropped_face = cv2.resize(cropped, (out_size, out_size))
    return cropped_face, cropped.shape[0], new_bbox


class Landmarker:
    """MTCNN + MobileNet-GDConv landmark pipeline."""

    def __init__(self, mtcnn, mobilenet_params, out_size: int = 224):
        import jax

        from ..models.mobilenet import (mobilenet_gdconv_apply,
                                        IMAGENET_MEAN, IMAGENET_STD)

        self.mtcnn = mtcnn
        self.out_size = out_size
        mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
        std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)

        self._params = mobilenet_params
        self._run_jit = jax.jit(mobilenet_gdconv_apply)

        def run(x):
            return self._run_jit(self._params, x)

        self._run = run
        self._mean, self._std = mean, std

    def detect(self, image: np.ndarray) -> Optional[np.ndarray]:
        """image: uint8 HWC → [68, 2] landmarks in image coords, or None.
        Uses the highest-confidence face (align_faces.py:38-40)."""
        from ..models.mtcnn.detect import detect_faces
        import jax.numpy as jnp

        faces, _ = detect_faces(image, self.mtcnn)
        if len(faces) == 0:
            return None
        best = faces[np.argmax(faces[:, 4])]
        cropped, orig_size, bbox = crop_face(image, [best], self.out_size)
        x = cropped.astype(np.float32).transpose(2, 0, 1)[None]
        x = (x / 255.0 - self._mean) / self._std
        lm = np.asarray(self._run(jnp.asarray(x))).reshape(-1, 2)
        return lm * orig_size + np.asarray([bbox[0], bbox[1]])[None]

    def detect_batch(self, images: List[np.ndarray]) -> Optional[np.ndarray]:
        """Per-image detection; None if any image has no face (matching
        detect_landmarks, find_direction.py:55-97)."""
        out = []
        for img in images:
            lm = self.detect(img)
            if lm is None:
                return None
            out.append(lm)
        return np.stack(out)


def default_landmarker(weights_dir: Optional[str] = None,
                       mobilenet_path: Optional[str] = None) -> Landmarker:
    """Build from STYLEMC_MTCNN_DIR / STYLEMC_MOBILENET env weights."""
    from ..models.mtcnn.detect import MTCNN
    from ..models import mobilenet as mb
    from ..io import load_state_dict_numpy

    weights_dir = weights_dir or os.environ.get("STYLEMC_MTCNN_DIR")
    mobilenet_path = mobilenet_path or os.environ.get("STYLEMC_MOBILENET")
    if not weights_dir or not os.path.isdir(weights_dir):
        raise FileNotFoundError("set STYLEMC_MTCNN_DIR to the MTCNN .npy dir")
    if not mobilenet_path or not os.path.exists(mobilenet_path):
        raise FileNotFoundError(
            "set STYLEMC_MOBILENET to mobilenet_224_model_best_gdconv_external.pth.tar")
    mtcnn = MTCNN.from_weights_dir(weights_dir)
    state = load_state_dict_numpy(mobilenet_path, key="state_dict")
    params = mb.params_from_torch_state(state)
    return Landmarker(mtcnn, params)
