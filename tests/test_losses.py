"""Loss-stack tests: ArcFace/ID, landmarks, StyleMC + NADA CLIP losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.arcface import (
    init_backbone_params, backbone_apply, params_from_torch_state,
    ir_se_50_layout,
)
from stylemc_tpu.losses import (
    id_loss, extract_feats, landmarks_loss, wing_loss,
    make_text_direction, clip_directional_loss,
    NADATextAnchors, nada_loss, preprocess_nada, direction_loss,
)
from stylemc_tpu.models.clip import init_clip_params, tokenize, FallbackTokenizer
from stylemc_tpu.utils.image import adaptive_avg_pool2d
from test_clip import TINY_VIT


def test_ir_se_50_layout():
    layout = ir_se_50_layout()
    assert len(layout) == 3 + 4 + 14 + 3
    assert layout[0] == (64, 64, 2)
    assert layout[-1] == (512, 512, 1)


@pytest.fixture(scope="module")
def arcface():
    return init_backbone_params(jax.random.PRNGKey(0))


@pytest.mark.slow
def test_arcface_embedding(arcface):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 112, 112)) * 0.5
    f = backbone_apply(arcface, x)
    assert f.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.array(f), axis=1), 1.0,
                               rtol=1e-5)


@pytest.mark.slow
def test_arcface_torch_roundtrip(arcface):
    # Export to torch state_dict namespace and reimport.
    state = {}
    p = arcface
    state["input_layer.0.weight"] = np.array(p["input_conv_weight"])
    for k in ("weight", "bias", "running_mean", "running_var"):
        state[f"input_layer.1.{k}"] = np.array(p["input_bn"][k])
    state["input_layer.2.weight"] = np.array(p["input_prelu"])
    for i, (in_c, depth, stride) in enumerate(ir_se_50_layout()):
        bp = p["body"][f"{i}"]
        for k in ("weight", "bias", "running_mean", "running_var"):
            state[f"body.{i}.res_layer.0.{k}"] = np.array(bp["bn1"][k])
            state[f"body.{i}.res_layer.4.{k}"] = np.array(bp["bn2"][k])
        state[f"body.{i}.res_layer.1.weight"] = np.array(bp["conv1_weight"])
        state[f"body.{i}.res_layer.2.weight"] = np.array(bp["prelu"])
        state[f"body.{i}.res_layer.3.weight"] = np.array(bp["conv2_weight"])
        state[f"body.{i}.res_layer.5.fc1.weight"] = np.array(bp["se"]["fc1_weight"])
        state[f"body.{i}.res_layer.5.fc2.weight"] = np.array(bp["se"]["fc2_weight"])
        if in_c != depth:
            state[f"body.{i}.shortcut_layer.0.weight"] = np.array(bp["shortcut_conv_weight"])
            for k in ("weight", "bias", "running_mean", "running_var"):
                state[f"body.{i}.shortcut_layer.1.{k}"] = np.array(bp["shortcut_bn"][k])
    for k in ("weight", "bias", "running_mean", "running_var"):
        state[f"output_layer.0.{k}"] = np.array(p["output_bn"][k])
    state["output_layer.3.weight"] = np.array(p["output_linear"]["weight"])
    state["output_layer.3.bias"] = np.array(p["output_linear"]["bias"])
    state["output_layer.4.running_mean"] = np.array(p["output_bn1d"]["running_mean"])
    state["output_layer.4.running_var"] = np.array(p["output_bn1d"]["running_var"])

    p2 = params_from_torch_state(state)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 112, 112)) * 0.5
    np.testing.assert_allclose(np.array(backbone_apply(arcface, x)),
                               np.array(backbone_apply(p2, x)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_id_loss_zero_for_identical(arcface):
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 256, 256)) * 0.3
    loss = id_loss(arcface, img, img)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_id_loss_tiny_layout_fast():
    # Fast-suite id_loss coverage (crop + resize + ArcFace embed + 1-dot):
    # a tiny custom backbone layout stands in for the 50-block IR-SE body,
    # whose full-size variants are all slow-marked.
    layout = [(8, 8, 2), (8, 16, 2), (16, 16, 1), (16, 32, 2), (32, 32, 2)]
    p = init_backbone_params(jax.random.PRNGKey(0), layout=layout)
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 256, 256)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 256, 256)) * 0.3
    # one jitted graph, two calls — eager dispatch through the scanned
    # IR-SE body costs ~30 s on CPU, the compile ~10 s
    f = jax.jit(jax.value_and_grad(
        lambda x, y: id_loss(p, x, y, layout=layout)))
    loss0, _ = f(a, a)
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-5)
    loss, g = f(a, b)
    assert float(loss) > 0
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


@pytest.mark.slow
def test_id_loss_positive_and_differentiable(arcface):
    a = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 256, 256)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 256, 256)) * 0.3

    def f(x):
        return id_loss(arcface, x, b)

    loss, g = jax.value_and_grad(f)(a)
    assert float(loss) > 0
    assert np.isfinite(np.array(g)).all()
    assert np.abs(np.array(g)).max() > 0


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(1, 2, 188, 188).astype(np.float32)
    got = np.array(adaptive_avg_pool2d(jnp.asarray(x), 112, 112))
    want = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x), (112, 112)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------- landmarks

def test_landmarks_loss_drops_jawline():
    lm1 = jnp.zeros((2, 68, 2))
    lm2 = lm1.at[:, :17, :].set(100.0)  # only jawline differs
    np.testing.assert_allclose(float(landmarks_loss(lm1, lm2)), 0.0)
    lm3 = lm1.at[:, 20, :].set(2.0)
    assert float(landmarks_loss(lm1, lm3)) > 0


def test_wing_loss_piecewise():
    lm1 = jnp.zeros((1, 68, 2))
    # small deviation region
    lm2 = lm1.at[:, 17:, :].set(1.0)
    small = float(wing_loss(lm1, lm2, omega=10, epsilon=2))
    np.testing.assert_allclose(small, 10 * np.log(1.5), rtol=1e-3)
    # large deviation region
    lm3 = lm1.at[:, 17:, :].set(50.0)
    c = 10 - 10 * np.log(1 + 5)
    np.testing.assert_allclose(float(wing_loss(lm1, lm3, omega=10, epsilon=2)),
                               50 - c, rtol=1e-3)


# ----------------------------------------------------------------- clip loss

@pytest.fixture(scope="module")
def tiny_clip():
    return TINY_VIT, init_clip_params(jax.random.PRNGKey(10), TINY_VIT)


def test_stylemc_clip_loss(tiny_clip):
    cfg, params = tiny_clip
    tok = FallbackTokenizer()
    t_pos = jnp.asarray(tokenize("a face of a woman", tokenizer=tok))
    t_neg = jnp.asarray(tokenize("a face of a man", tokenizer=tok))
    tdir = make_text_direction(params, cfg, t_pos, t_neg)
    np.testing.assert_allclose(np.linalg.norm(np.array(tdir)), 1.0, rtol=1e-5)

    src = jax.random.normal(jax.random.PRNGKey(11), (2, 3, 32, 32))
    tgt = jax.random.normal(jax.random.PRNGKey(12), (2, 3, 32, 32))
    loss = clip_directional_loss(params, cfg, src, tgt, tdir)
    assert 0.0 <= float(loss) <= 2.0


def test_stylemc_clip_loss_grad(tiny_clip):
    cfg, params = tiny_clip
    tok = FallbackTokenizer()
    tdir = make_text_direction(
        params, cfg,
        jnp.asarray(tokenize("x", tokenizer=tok)),
        jnp.asarray(tokenize("y", tokenizer=tok)))
    src = jax.random.normal(jax.random.PRNGKey(13), (1, 3, 32, 32))

    def f(tgt):
        return clip_directional_loss(params, cfg, src, tgt, tdir)

    g = jax.grad(f)(src + 0.1)
    assert np.isfinite(np.array(g)).all()
    assert np.abs(np.array(g)).max() > 0


def test_nada_loss(tiny_clip):
    cfg, params = tiny_clip
    tok = FallbackTokenizer()
    anchors = NADATextAnchors.create(params, cfg, "man", "woman", tokenizer=tok)
    src = jax.random.normal(jax.random.PRNGKey(14), (2, 3, 64, 64)) * 0.5
    tgt = src + 0.1
    loss = nada_loss(params, cfg, src, tgt, anchors,
                     lambda_direction=1.0, lambda_global=0.5,
                     lambda_manifold=0.2)
    assert np.isfinite(float(loss))


def test_preprocess_nada_shape():
    img = jnp.zeros((1, 3, 64, 64))
    out = preprocess_nada(img, img_size=32)
    assert out.shape == (1, 3, 32, 32)


def test_direction_loss_types():
    x = jnp.asarray([[1.0, 0.0]])
    y = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(float(direction_loss(x, y, "cosine")), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(direction_loss(x, y, "mse")), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(direction_loss(x, y, "mae")), 1.0, atol=1e-6)
