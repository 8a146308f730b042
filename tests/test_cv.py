"""CV stack tests: MTCNN cascade (with real in-tree weights when available),
MobileNet landmarker, alignment, warping, DeepLab segmenter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.mtcnn.nets import (
    init_net_params, pnet_apply, rnet_apply, onet_apply,
)
from stylemc_tpu.models.mtcnn.detect import (
    nms, convert_to_square, calibrate_box, correct_bboxes, MTCNN,
    detect_faces, _preprocess,
)
from stylemc_tpu.models.mobilenet import (
    init_mobilenet_gdconv_params, mobilenet_gdconv_apply,
)
from stylemc_tpu.cv.landmarks import crop_face, Landmarker
from stylemc_tpu.cv.align import align_face
from stylemc_tpu.cv.warp import triangle_indices, warp_face
from stylemc_tpu.models.deeplab import (
    init_deeplab_params, deeplab_apply, Segmenter, CLASSES, read_image_mask,
)

REF_WEIGHTS = "/root/reference/MTCNN/weights"


# ------------------------------------------------------------------ mtcnn

@pytest.mark.slow
def test_net_shapes():
    key = jax.random.PRNGKey(0)
    p = init_net_params(key, "pnet")
    off, prob = pnet_apply(p, jnp.zeros((1, 3, 24, 24)))
    assert off.shape == (1, 4, 7, 7) and prob.shape == (1, 2, 7, 7)
    np.testing.assert_allclose(np.asarray(prob.sum(axis=1)), 1.0, rtol=1e-5)

    p = init_net_params(key, "rnet")
    off, prob = rnet_apply(p, jnp.zeros((2, 3, 24, 24)))
    assert off.shape == (2, 4) and prob.shape == (2, 2)

    p = init_net_params(key, "onet")
    lm, off, prob = onet_apply(p, jnp.zeros((2, 3, 48, 48)))
    assert lm.shape == (2, 10) and off.shape == (2, 4) and prob.shape == (2, 2)


def test_nms():
    boxes = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],     # heavy overlap with first
        [50, 50, 60, 60, 0.7],
    ], np.float64)
    keep = nms(boxes, 0.5)
    assert set(keep) == {0, 2}


def test_convert_to_square():
    boxes = np.array([[0, 0, 9, 19, 0.5]], np.float64)
    sq = convert_to_square(boxes)
    w = sq[0, 2] - sq[0, 0] + 1
    h = sq[0, 3] - sq[0, 1] + 1
    assert w == h == 20
    assert sq[0, 4] == 0.5


def test_calibrate_box():
    boxes = np.array([[0, 0, 9, 9, 0.5]], np.float64)
    offsets = np.array([[0.1, 0.1, -0.1, -0.1]])
    out = calibrate_box(boxes, offsets)
    np.testing.assert_allclose(out[0, :4], [1, 1, 8, 8])


def test_correct_bboxes_clipping():
    boxes = np.array([[-5, -5, 20, 20, 0.5]], np.float64)
    dy, edy, dx, edx, y, ey, x, ex, w, h = correct_bboxes(boxes, 15, 15)
    assert x[0] == 0 and y[0] == 0 and dx[0] == 5 and dy[0] == 5
    assert ex[0] == 14 and ey[0] == 14


@pytest.mark.skipif(not os.path.isdir(REF_WEIGHTS),
                    reason="MTCNN weights unavailable")
def test_detect_faces_synthetic():
    # A crude synthetic "face": the real-weight cascade must at least run
    # end-to-end without error (detection not guaranteed on synthetic data).
    mtcnn = MTCNN.from_weights_dir(REF_WEIGHTS)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    boxes, landmarks = detect_faces(img, mtcnn)
    assert isinstance(boxes, (list, np.ndarray))


def test_preprocess():
    img = np.full((4, 4, 3), 127.5, np.float32)
    out = _preprocess(img)
    assert out.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


# -------------------------------------------------------------- mobilenet

@pytest.mark.slow
def test_mobilenet_landmarks_shape():
    p = init_mobilenet_gdconv_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 224, 224)) * 0.5
    out = mobilenet_gdconv_apply(p, x)
    assert out.shape == (1, 136)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------------- crop

def test_crop_face():
    img = np.zeros((100, 100, 3), np.uint8)
    img[40:60, 40:60] = 255
    faces = [np.array([40, 40, 59, 59, 0.99])]
    cropped, orig_size, bbox = crop_face(img, faces, out_size=32)
    assert cropped.shape == (32, 32, 3)
    assert orig_size == 24  # 20 * 1.2
    assert cropped[16, 16, 0] > 200  # face center is bright


# ------------------------------------------------------------------ align

def _synthetic_landmarks():
    lm = np.zeros((68, 2))
    lm[36:42] = [60, 80]    # left eye
    lm[42:48] = [100, 80]   # right eye
    lm[48] = [65, 120]      # mouth left
    lm[54] = [95, 120]      # mouth right
    lm[48:60] += np.random.RandomState(0).randn(12, 2)
    return lm


def test_align_face():
    img = np.random.RandomState(0).randint(0, 255, (160, 160, 3), np.uint8)
    out = align_face(img, _synthetic_landmarks(), output_size=64,
                     transform_size=256)
    assert out.size == (64, 64)


# ------------------------------------------------------------------- warp

def test_triangle_indices_and_warp():
    pts = np.array([[10, 10], [50, 10], [30, 50], [10, 50], [50, 50]],
                   np.int32)
    tris = triangle_indices(pts)
    assert len(tris) >= 2
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    warped = warp_face(img, pts.astype(np.float64),
                       (pts + np.array([2, 1])).astype(np.float64))
    assert warped.shape == img.shape


# ---------------------------------------------------------------- deeplab

@pytest.mark.slow
def test_deeplab_tiny():
    p = init_deeplab_params(jax.random.PRNGKey(0), num_classes=19,
                            layers=(1, 1, 1, 1), width=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 65, 65))
    out = deeplab_apply(p, x)
    assert out.shape == (1, 19, 65, 65)
    assert np.isfinite(np.asarray(out)).all()


def test_segmenter_masks():
    p = init_deeplab_params(jax.random.PRNGKey(0), num_classes=19,
                            layers=(1, 1, 1, 1), width=16)
    seg = Segmenter(p, resolution=64)
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    mask = seg.segment(img)
    assert mask.shape == (64, 64)
    assert mask.max() < len(CLASSES)
    bg = seg.get_bg_mask(img)
    assert bg.shape == (64, 64) and bg.dtype == bool
    earring, mouth, teeth = seg.get_earring_mouth_teeth_masks(img)
    assert mouth.shape == (64, 64)
    none_earring, _, _ = seg.get_earring_mouth_teeth_masks(
        img, need_earring_mask=False)
    assert none_earring is None


def test_read_image_mask(tmp_path):
    from PIL import Image

    mask = np.zeros((32, 32), np.uint8)
    mask[:16] = 13  # hair → masked to min value
    mask[16:] = 1   # skin → kept at 1
    path = str(tmp_path / "m.png")
    Image.fromarray(mask).save(path)
    out = read_image_mask(path, mask_min_value=0.0, dilation=False)
    assert out.shape == (32, 32)
    np.testing.assert_allclose(out[:16], 0.0)
    np.testing.assert_allclose(out[16:], 1.0)


def test_show_bboxes():
    from stylemc_tpu.models.mtcnn.visualize import show_bboxes
    img = np.zeros((40, 40, 3), np.uint8)
    boxes = np.array([[5, 5, 20, 20, 0.9]])
    lms = np.array([[8, 10, 12, 9, 11, 8, 8, 12, 14, 14]], np.float64)
    out = show_bboxes(img, boxes, lms)
    arr = np.asarray(out)
    assert arr.shape == (40, 40, 3)
    assert arr[5, 5:21].max() == 255        # white box edge drawn
    assert (arr != 0).any(axis=(0, 1)).all() is not None


# ---------------------------------------------------- differentiable crop

def test_crop_resize_bilinear_vs_cv2():
    """ops.image.crop_resize_bilinear == crop_face's cv2 pipeline
    (zero border + INTER_LINEAR resize), in-bounds and out-of-bounds."""
    import cv2

    from stylemc_tpu.ops.image import crop_resize_bilinear

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 80, 3), np.uint8)
    imgf = jnp.asarray(img.transpose(2, 0, 1)[None], jnp.float32)

    # in-bounds
    want = cv2.resize(img[6:54, 10:58].astype(np.float32), (224, 224),
                      interpolation=cv2.INTER_LINEAR)
    got = np.asarray(crop_resize_bilinear(
        imgf, np.array([[10.0, 6.0, 58.0, 54.0]]), 224))[0].transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=0.01)

    # out-of-bounds: cv2 path = zero border then resize
    crop = cv2.copyMakeBorder(img[0:64, 0:72], 4, 12, 8, 0,
                              cv2.BORDER_CONSTANT, 0)
    want2 = cv2.resize(crop.astype(np.float32), (224, 224),
                       interpolation=cv2.INTER_LINEAR)
    got2 = np.asarray(crop_resize_bilinear(
        imgf, np.array([[-8.0, -4.0, 72.0, 76.0]]), 224))[0].transpose(1, 2, 0)
    np.testing.assert_allclose(got2, want2, atol=0.01)


def test_crop_resize_bilinear_differentiable():
    from stylemc_tpu.ops.image import crop_resize_bilinear

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    boxes = np.array([[4.0, 4.0, 28.0, 28.0], [-2.0, 0.0, 30.0, 32.0]])

    g = jax.grad(lambda im: jnp.sum(
        jnp.square(crop_resize_bilinear(im, boxes, 64))))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_square_crop_box_matches_crop_face():
    """square_crop_box reproduces crop_face's integer box arithmetic."""
    from stylemc_tpu.ops.image import square_crop_box

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (96, 96, 3), np.uint8)
    for x1, y1, x2, y2 in [(10, 12, 60, 70), (3, 5, 90, 88), (40, 2, 95, 50)]:
        face = np.array([x1, y1, x2, y2, 0.9], np.float32)
        _, orig_size, bbox = crop_face(img, [face], 224)
        bx = square_crop_box(face)
        # crop_face returns the CLIPPED box; ours is unclipped — clip here
        np.testing.assert_allclose(
            [max(0, bx[0]), max(0, bx[1]),
             min(96, bx[2]), min(96, bx[3])], bbox)
        assert int(bx[2] - bx[0]) == orig_size
