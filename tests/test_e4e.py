"""e4e subsystem tests: encoders, rosinality weight import, pSp wrapper."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.e4e.encoders import (
    init_encoder_params, encoder4editing, gradual_style_encoder,
    backbone_encoder_into_w, encoder_params_from_torch_state,
    equal_linear, upsample_add, style_count,
)
from stylemc_tpu.models.e4e.psp import PSP, PSPConfig
from stylemc_tpu.io.rosinality import (
    generator_params_from_rosinality, config_for_rosinality,
    infer_rosinality_size,
)
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, synthesis, w_to_s, mapping,
)


def test_style_count():
    assert style_count(1024) == 18
    assert style_count(256) == 14


def test_fpn_tap_indices_default_matches_reference():
    """The generic stage-end computation must reproduce the reference's
    hardcoded IR-50 taps 6/20/23 (psp_encoders.py:100-107)."""
    from stylemc_tpu.models.e4e.encoders import fpn_tap_indices
    from stylemc_tpu.models.arcface import ir_se_50_layout

    assert fpn_tap_indices(ir_se_50_layout()) == (6, 20, 23)
    with pytest.raises(ValueError):
        fpn_tap_indices([(8, 8, 2), (8, 8, 1)])


def test_tiny_layout_encoders():
    """A custom 4-block body (the CPU test layout) produces well-shaped
    W+ codes from all three encoder types and carries gradients."""
    from tiny import TINY_E4E_LAYOUT

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 3, 256, 256).astype(np.float32))
    for enc_type, fn in (
            ("Encoder4Editing", encoder4editing),
            ("GradualStyleEncoder", gradual_style_encoder),
            ("SingleStyleCodeEncoder", backbone_encoder_into_w)):
        p = init_encoder_params(jax.random.PRNGKey(0), stylegan_size=256,
                                encoder_type=enc_type,
                                layout=TINY_E4E_LAYOUT)
        codes = fn(p, x, 256, layout=TINY_E4E_LAYOUT) \
            if enc_type != "Encoder4Editing" \
            else fn(p, x, 256, 18, layout=TINY_E4E_LAYOUT)
        assert codes.shape == (2, 14, 512)
        assert np.isfinite(np.asarray(codes)).all()

    p = init_encoder_params(jax.random.PRNGKey(0), stylegan_size=256,
                            layout=TINY_E4E_LAYOUT)
    g = jax.grad(lambda pp: jnp.sum(encoder4editing(
        pp, x[:1], 256, 18, layout=TINY_E4E_LAYOUT) ** 2))(p)
    # gradient flows to the body stem
    assert float(jnp.abs(g["input_conv_weight"]).max()) > 0


def test_equal_linear_matches_formula():
    p = {"weight": jnp.asarray(np.random.RandomState(0).randn(8, 4),
                               jnp.float32),
         "bias": jnp.ones((8,))}
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4), jnp.float32)
    got = np.array(equal_linear(p, x, lr_mul=0.5))
    want = np.array(x) @ (np.array(p["weight"]).T * (0.5 / 2.0)) + 0.5
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_upsample_add_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(1, 2, 8, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(1, 2, 16, 16).astype(np.float32)
    got = np.array(upsample_add(jnp.asarray(x), jnp.asarray(y)))
    want = (torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(16, 16), mode="bilinear",
        align_corners=True) + torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


from tiny import TINY_E4E_LAYOUT  # noqa: E402


@pytest.fixture(scope="module")
def enc():
    """Tiny 4-stage body (the FPN-tap contract is layout-parametric);
    the full IR-50 layout is exercised by enc_full below and the
    torch-oracle suite (test_reference_parity.py)."""
    return init_encoder_params(jax.random.PRNGKey(0), stylegan_size=256,
                               layout=TINY_E4E_LAYOUT)


@pytest.fixture(scope="module")
def enc_full():
    return init_encoder_params(jax.random.PRNGKey(0), stylegan_size=256)


@pytest.mark.slow
def test_encoder4editing_shapes(enc):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 256, 256)) * 0.5
    w = encoder4editing(enc, x, stylegan_size=256, layout=TINY_E4E_LAYOUT)
    assert w.shape == (1, 14, 512)
    assert np.isfinite(np.array(w)).all()


@pytest.mark.slow
def test_encoder4editing_progressive_stages(enc):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 256, 256)) * 0.5
    w0 = encoder4editing(enc, x, stylegan_size=256, progressive_stage=0,
                         layout=TINY_E4E_LAYOUT)
    # stage 0: all rows equal w0 (no deltas yet)
    w0np = np.array(w0)
    for i in range(1, 14):
        np.testing.assert_allclose(w0np[:, i], w0np[:, 0], rtol=1e-5)
    w_full = encoder4editing(enc, x, stylegan_size=256,
                             progressive_stage=18,
                             layout=TINY_E4E_LAYOUT)
    assert not np.allclose(np.array(w_full)[:, 1], w0np[:, 1])
    # row 0 never gets a delta
    np.testing.assert_allclose(np.array(w_full)[:, 0], w0np[:, 0], rtol=1e-5)


@pytest.mark.slow
def test_gradual_style_encoder_shapes(enc):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 256, 256)) * 0.5
    w = gradual_style_encoder(enc, x, stylegan_size=256,
                              layout=TINY_E4E_LAYOUT)
    assert w.shape == (1, 14, 512)


@pytest.mark.slow
def test_encoder_torch_roundtrip(enc_full):
    # Export -> torch namespace -> reimport -> identical outputs.
    from fabricate import encoder_to_torch_state

    state = encoder_to_torch_state(enc_full, n_styles=14)
    p2 = encoder_params_from_torch_state(state, stylegan_size=256)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 256, 256)) * 0.5
    np.testing.assert_allclose(
        np.array(encoder4editing(enc_full, x, 256)),
        np.array(encoder4editing(p2, x, 256)), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- rosinality


from fabricate import ada_to_rosinality_state as _ada_to_rosinality_state  # noqa: E402


def test_rosinality_roundtrip():
    cfg = config_for_rosinality(32)
    cfg0 = GeneratorConfig(img_resolution=32, channel_base=cfg.channel_base,
                           channel_max=512, conv_clamp=None, num_fp16_res=0,
                           mapping_layers=8)
    # use small channels for speed
    cfg0 = GeneratorConfig(img_resolution=32, channel_base=1024,
                           channel_max=64, conv_clamp=None, num_fp16_res=0,
                           mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg0)
    state = _ada_to_rosinality_state(cfg0, params)
    assert infer_rosinality_size(state) == 32

    cfg2, params2 = generator_params_from_rosinality(state, 32)
    # channel layout differs from default cm=2 dict in this tiny test, so
    # compare against the original config with converted params.
    ws = mapping(params, cfg0, jax.random.normal(jax.random.PRNGKey(1), (2, 512)))
    s1 = w_to_s(params, cfg0, ws)
    img1 = synthesis(params, cfg0, s1)

    # mapping_layers mismatch guard: rebuild cfg2 matching cfg0 geometry
    import dataclasses as dc
    cfg2 = dc.replace(cfg0)
    s2 = w_to_s(params2, cfg2, ws)
    img2 = synthesis(params2, cfg2, s2)
    np.testing.assert_allclose(np.array(img1), np.array(img2),
                               rtol=1e-5, atol=1e-5)


def test_config_for_rosinality_channels():
    cfg = config_for_rosinality(1024)
    got = [cfg.channels(r) for r in cfg.block_resolutions]
    # rosinality cm=2 dict: 512 at ≤32, then 512, 256, 128, 64, 32
    assert got == [512, 512, 512, 512, 512, 256, 128, 64, 32]
    assert cfg.conv_clamp is None


# ----------------------------------------------------------------------- psp


@pytest.mark.slow
def test_psp_end_to_end(enc):
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=1024,
                              channel_max=64, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(5), gen_cfg)
    psp = PSP(cfg=PSPConfig(stylegan_size=256,
                            encoder_layout=TINY_E4E_LAYOUT),
              encoder_params=enc, decoder_cfg=gen_cfg,
              decoder_params=gen_params,
              latent_avg=jnp.zeros((14, 512)))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 256, 256)) * 0.5
    img, latents = psp(x, return_latents=True)
    assert img.shape == (1, 3, 256, 256)
    assert latents.shape == (1, 14, 512)
    assert np.isfinite(np.array(img)).all()


@pytest.mark.slow
def test_psp_latent_mask(enc):
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=1024,
                              channel_max=64, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(7), gen_cfg)
    psp = PSP(cfg=PSPConfig(stylegan_size=256,
                            encoder_layout=TINY_E4E_LAYOUT),
              encoder_params=enc, decoder_cfg=gen_cfg,
              decoder_params=gen_params, latent_avg=None)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 3, 256, 256)) * 0.5
    img_plain = psp(x)
    img_masked = psp(x, latent_mask=[10, 11, 12, 13])
    assert not np.allclose(np.array(img_plain), np.array(img_masked))
