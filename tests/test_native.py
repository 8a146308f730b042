"""Native host-ops: build, ABI, and numpy-parity tests."""

import numpy as np
import pytest

from stylemc_tpu.native import (
    build_host_ops, get_host_ops, native_available, nms_native,
    extract_image_boxes_native, resize_bilinear_u8_native,
    u8_to_chw_norm_native,
)


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def test_build_is_cached():
    p1 = build_host_ops()
    p2 = build_host_ops()
    assert p1 == p2
    assert p1.endswith(".so")


def test_nms_matches_numpy():
    from stylemc_tpu.models.mtcnn import detect as d
    rng = np.random.RandomState(0)
    base = rng.rand(40, 2) * 80
    boxes = np.concatenate([base, base + 10 + rng.rand(40, 2) * 20,
                            rng.rand(40, 1)], axis=1).astype(np.float32)
    for mode in ("union", "min"):
        native = set(nms_native(boxes, 0.5, mode))
        # pure-numpy path (bypass the native shortcut)
        import importlib
        ref_keep = _numpy_nms(boxes, 0.5, mode)
        assert native == set(ref_keep)


def _numpy_nms(boxes, thr, mode):
    pick = []
    x1, y1, x2, y2, score = [boxes[:, i] for i in range(5)]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ids = np.argsort(score)
    while len(ids) > 0:
        last = len(ids) - 1
        i = ids[last]
        pick.append(i)
        ix1 = np.maximum(x1[i], x1[ids[:last]])
        iy1 = np.maximum(y1[i], y1[ids[:last]])
        ix2 = np.minimum(x2[i], x2[ids[:last]])
        iy2 = np.minimum(y2[i], y2[ids[:last]])
        w = np.maximum(0.0, ix2 - ix1 + 1.0)
        h = np.maximum(0.0, iy2 - iy1 + 1.0)
        inter = w * h
        if mode == "min":
            overlap = inter / np.minimum(area[i], area[ids[:last]])
        else:
            overlap = inter / (area[i] + area[ids[:last]] - inter)
        ids = np.delete(ids, np.concatenate(
            [[last], np.where(overlap > thr)[0]]))
    return pick


def test_extract_image_boxes():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[8, 8, 31, 31, 0.9],
                      [-4, -4, 19, 19, 0.8],    # needs padding
                      [50, 50, 73, 73, 0.7]], np.float32)
    out = extract_image_boxes_native(img, boxes, 24)
    assert out.shape == (3, 3, 24, 24)
    # box 0 lies fully inside: values must match the simple crop-normalize
    crop = img[8:32, 8:32].astype(np.float32)
    want = (crop.transpose(2, 0, 1) - 127.5) * 0.0078125
    np.testing.assert_allclose(out[0], want, atol=2e-2)
    # padded region of box 1 is zero-pixel normalized
    np.testing.assert_allclose(out[1, :, 0, 0], (0 - 127.5) * 0.0078125,
                               atol=1e-6)


def test_resize_and_norm():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    out = resize_bilinear_u8_native(img, 16, 24)
    assert out.shape == (16, 24, 3)
    same = resize_bilinear_u8_native(img, 32, 48)
    np.testing.assert_array_equal(same, img)

    norm = u8_to_chw_norm_native(img)
    assert norm.shape == (3, 32, 48)
    want = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(norm, want.transpose(2, 0, 1), atol=1e-6)


def test_mtcnn_uses_native_nms():
    from stylemc_tpu.models.mtcnn.detect import nms
    boxes = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
                      [50, 50, 60, 60, 0.7]], np.float64)
    assert set(nms(boxes, 0.5)) == {0, 2}
