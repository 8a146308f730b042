"""CLIP model/tokenizer/preprocess tests (random weights, tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.clip import (
    CLIPConfig, CLIP_CONFIGS, init_clip_params, encode_image, encode_text,
    tokenize, FallbackTokenizer, unprocess, resize_bicubic,
)
from stylemc_tpu.models.clip.model import (
    params_from_torch_state, config_from_torch_state,
)


TINY_VIT = CLIPConfig(embed_dim=64, image_resolution=32, vision_layers=2,
                      vision_width=64, vision_patch_size=16,
                      context_length=77, vocab_size=49408,
                      transformer_width=64, transformer_heads=2,
                      transformer_layers=2)

TINY_RN = CLIPConfig(embed_dim=64, image_resolution=64,
                     vision_layers=(1, 1, 1, 1), vision_width=16,
                     vision_patch_size=None, context_length=77,
                     transformer_width=64, transformer_heads=2,
                     transformer_layers=2)


@pytest.fixture(scope="module")
def tiny_vit():
    return TINY_VIT, init_clip_params(jax.random.PRNGKey(0), TINY_VIT)


@pytest.fixture(scope="module")
def tiny_rn():
    return TINY_RN, init_clip_params(jax.random.PRNGKey(1), TINY_RN)


def test_configs_registered():
    assert CLIP_CONFIGS["ViT-B/32"].vision_patch_size == 32
    assert CLIP_CONFIGS["ViT-B/16"].vision_patch_size == 16
    assert CLIP_CONFIGS["RN50"].vision_layers == (3, 4, 6, 3)
    assert CLIP_CONFIGS["RN50"].embed_dim == 1024


def test_vit_encode_image(tiny_vit):
    cfg, params = tiny_vit
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    f = encode_image(params, cfg, img)
    assert f.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.array(f)).all()


def test_vit_encode_image_bf16_keeps_dtype(tiny_vit):
    """A bf16 image must run the whole tower in bf16. Regression: the
    attention score scale was a strongly-typed np.float64, which promoted
    the activations to fp32 mid-layer — a silent upcast when blocks were
    inlined, and a hard lax.scan carry-dtype error once the transformer
    layers were scanned (--perception_bf16 path of find_direction)."""
    cfg, params = tiny_vit
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32),
                            dtype=jnp.bfloat16)
    f = jax.jit(lambda p, i: encode_image(p, cfg, i))(params, img)
    assert f.dtype == jnp.bfloat16
    assert np.isfinite(np.array(f, dtype=np.float32)).all()


def test_rn_encode_image(tiny_rn):
    cfg, params = tiny_rn
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 64, 64))
    f = encode_image(params, cfg, img)
    assert f.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.array(f)).all()


def test_encode_text_eot_pooling(tiny_vit):
    cfg, params = tiny_vit
    toks = np.asarray(tokenize(["hello world", "a photo of a face"],
                               tokenizer=FallbackTokenizer()))
    f = encode_text(params, cfg, jnp.asarray(toks))
    assert f.shape == (2, cfg.embed_dim)
    # padding beyond EOT must not affect the embedding
    toks2 = toks.copy()
    # (tokens after the argmax position are zeros already; perturb an
    # attention-visible but causally-masked-from-EOT later position is not
    # possible — instead verify determinism)
    f2 = encode_text(params, cfg, jnp.asarray(toks2))
    np.testing.assert_allclose(np.array(f), np.array(f2))


def test_text_causal_mask(tiny_vit):
    cfg, params = tiny_vit
    # Changing a token AFTER the EOT/argmax position must not change the
    # pooled embedding (causal mask + EOT pooling).
    toks = np.zeros((1, cfg.context_length), dtype=np.int32)
    toks[0, 0] = 49406
    toks[0, 1] = 100
    toks[0, 2] = 49407
    f1 = encode_text(params, cfg, jnp.asarray(toks))
    toks[0, 10] = 7  # after EOT; argmax stays at position 2
    f2 = encode_text(params, cfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.array(f1), np.array(f2), atol=1e-5)


def test_image_grad_flows(tiny_vit):
    cfg, params = tiny_vit

    def loss(img):
        return jnp.sum(encode_image(params, cfg, img) ** 2)

    img = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 32, 32))
    g = jax.grad(loss)(img)
    assert np.abs(np.array(g)).max() > 0
    assert np.isfinite(np.array(g)).all()


def test_tokenize_shape_and_framing():
    toks = tokenize(["hi", "there you"], tokenizer=FallbackTokenizer())
    assert toks.shape == (2, 77)
    assert toks.dtype == np.int32
    assert (toks[:, 0] == 49406).all()
    assert (toks == 49407).sum() == 2


def test_params_roundtrip_through_torch_namespace(tiny_vit):
    cfg, params = tiny_vit
    # Serialize the pytree into a torch-style state dict, reimport, and
    # verify identical encodings.
    state = {}

    def put(name, v):
        state[name] = np.array(v)

    vp = params["visual"]
    put("visual.conv1.weight", vp["conv1_weight"])
    put("visual.class_embedding", vp["class_embedding"])
    put("visual.positional_embedding", vp["positional_embedding"])
    for lnn in ("ln_pre", "ln_post"):
        put(f"visual.{lnn}.weight", vp[lnn]["weight"])
        put(f"visual.{lnn}.bias", vp[lnn]["bias"])
    put("visual.proj", vp["proj"])

    def put_block(prefix, bp):
        put(f"{prefix}.attn.in_proj_weight", bp["attn"]["in_proj_weight"])
        put(f"{prefix}.attn.in_proj_bias", bp["attn"]["in_proj_bias"])
        put(f"{prefix}.attn.out_proj.weight", bp["attn"]["out_proj"]["weight"])
        put(f"{prefix}.attn.out_proj.bias", bp["attn"]["out_proj"]["bias"])
        for lnn in ("ln_1", "ln_2"):
            put(f"{prefix}.{lnn}.weight", bp[lnn]["weight"])
            put(f"{prefix}.{lnn}.bias", bp[lnn]["bias"])
        for mm in ("c_fc", "c_proj"):
            put(f"{prefix}.mlp.{mm}.weight", bp["mlp"][mm]["weight"])
            put(f"{prefix}.mlp.{mm}.bias", bp["mlp"][mm]["bias"])

    for i in range(cfg.vision_layers):
        put_block(f"visual.transformer.resblocks.{i}",
                  vp["transformer"][f"resblock{i}"])
    for i in range(cfg.transformer_layers):
        put_block(f"transformer.resblocks.{i}",
                  params["transformer"][f"resblock{i}"])
    put("token_embedding.weight", params["token_embedding"])
    put("positional_embedding", params["positional_embedding"])
    put("ln_final.weight", params["ln_final"]["weight"])
    put("ln_final.bias", params["ln_final"]["bias"])
    put("text_projection", params["text_projection"])
    put("logit_scale", params["logit_scale"])

    cfg2 = config_from_torch_state(state)
    assert cfg2.vision_patch_size == cfg.vision_patch_size
    assert cfg2.embed_dim == cfg.embed_dim
    params2 = params_from_torch_state(state, cfg2)
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 32, 32))
    np.testing.assert_allclose(np.array(encode_image(params, cfg, img)),
                               np.array(encode_image(params2, cfg2, img)),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- preprocess

def test_resize_bicubic_identity():
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 16, 16))
    y = resize_bicubic(x, 16, 16)
    np.testing.assert_allclose(np.array(y), np.array(x), atol=1e-5)


def test_resize_bicubic_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    got = np.array(resize_bicubic(jnp.asarray(x), 24, 24))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(24, 24), mode="bicubic",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_resize_bicubic_upscale_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).randn(1, 3, 14, 14).astype(np.float32)
    got = np.array(resize_bicubic(jnp.asarray(x), 28, 28))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(28, 28), mode="bicubic",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_unprocess_shape_and_range():
    img = jnp.clip(jax.random.normal(jax.random.PRNGKey(7), (2, 3, 64, 64)), -1, 1)
    out = unprocess(img, img_size=32)
    assert out.shape == (2, 3, 32, 32)
    # CLIP-normalized range: roughly within [-3, 3]
    assert np.abs(np.array(out)).max() < 4.0


def test_unprocess_differentiable():
    def loss(img):
        return jnp.sum(unprocess(img, img_size=32) ** 2)

    img = jnp.zeros((1, 3, 64, 64))
    g = jax.grad(loss)(img)
    assert np.isfinite(np.array(g)).all()
    assert np.abs(np.array(g)).max() > 0
