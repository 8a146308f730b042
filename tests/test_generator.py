"""Structural + numerical invariants of the JAX StyleGAN2-ADA generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, split_ws,
    synthesis, generate, N_STYLE_CHANNELS, S_TRAINABLE_SPACE_CHANNELS,
    RESOLUTION_UNTIL_K,
)


@pytest.fixture(scope="module")
def small_gen():
    cfg = GeneratorConfig(img_resolution=64, channel_base=4096, channel_max=128)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_num_ws():
    assert GeneratorConfig(img_resolution=256).num_ws == 14
    assert GeneratorConfig(img_resolution=512).num_ws == 16
    assert GeneratorConfig(img_resolution=1024).num_ws == 18


def test_channels_ffhq1024():
    cfg = GeneratorConfig(img_resolution=1024)
    got = [cfg.channels(r) for r in cfg.block_resolutions]
    assert got == [512, 512, 512, 512, 512, 256, 128, 64, 32]


def test_init_params_1024():
    # a 1024-res generator draws 78 rng keys; a fixed split(key, 64) raised
    # StopIteration here. Tiny channels keep this fast; block count (the
    # key-consuming axis) is set by img_resolution alone.
    cfg = GeneratorConfig(img_resolution=1024, channel_base=128,
                          channel_max=8, mapping_layers=8)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    assert set(params["synthesis"]) == {f"b{r}" for r in cfg.block_resolutions}
    assert params["synthesis"]["b1024"]["conv1"]["noise_const"].shape == \
        (1024, 1024)


@pytest.mark.slow
def test_synthesis_full_1024_tiny_channels():
    # all 9 blocks end-to-end (w→s→synthesis) at 1024; tiny channels keep
    # CPU time bounded while exercising every until_k stage and the
    # large-plane resample paths
    cfg = GeneratorConfig(img_resolution=1024, channel_base=512,
                          channel_max=8, mapping_layers=2)
    p = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    s = w_to_s(p, cfg, mapping(p, cfg, z))
    assert s.shape == (2, 26, 512)
    img = synthesis(p, cfg, s, noise_mode="const")
    assert img.shape == (2, 3, 1024, 1024)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_init_params_key_stream_stable():
    # the split count is now computed per-config; counter-mode split means
    # the first keys (and so all 256-res params) must match a fixed split
    cfg = GeneratorConfig(img_resolution=256, mapping_layers=2,
                          channel_base=2048, channel_max=64)
    p = init_generator_params(jax.random.PRNGKey(7), cfg)
    keys64 = jax.random.split(jax.random.PRNGKey(7), 64)
    nk = cfg.mapping_layers + 8 * len(cfg.block_resolutions) + 1
    keysN = jax.random.split(jax.random.PRNGKey(7), nk)
    np.testing.assert_array_equal(np.asarray(keys64[:nk if nk < 64 else 64]),
                                  np.asarray(keysN[:64 if nk > 64 else nk]))
    assert np.isfinite(float(jnp.sum(p["synthesis"]["b256"]["conv1"]["weight"])))


def test_temp_shapes():
    cfg = GeneratorConfig(img_resolution=1024)
    ts = cfg.temp_shapes()
    assert ts[0] == (512, 512, 512)
    assert ts[5] == (512, 256, 256)   # b128: conv0 in=C(64)=512, out 256
    assert ts[-1] == (64, 32, 32)     # b1024


def test_mapping_shapes_and_truncation(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.z_dim))
    ws = mapping(params, cfg, z)
    assert ws.shape == (3, cfg.num_ws, cfg.w_dim)
    # all rows identical (broadcast)
    np.testing.assert_allclose(np.array(ws[:, 0]), np.array(ws[:, -1]))
    # psi=0 collapses to w_avg
    ws0 = mapping(params, cfg, z, truncation_psi=0.0)
    np.testing.assert_allclose(
        np.array(ws0[0, 0]), np.array(params["mapping"]["w_avg"]), atol=1e-6)


def test_split_ws_rows(small_gen):
    cfg, params = small_gen
    ws = jnp.arange(cfg.num_ws, dtype=jnp.float32)[None, :, None].repeat(512, -1)
    blocks = split_ws(cfg, ws)
    assert len(blocks) == len(cfg.block_resolutions)
    assert blocks[0].shape[1] == 2
    assert all(b.shape[1] == 3 for b in blocks[1:])
    # torgb row of block k == first conv row of block k+1 (w reuse convention)
    for k in range(len(blocks) - 1):
        np.testing.assert_allclose(np.array(blocks[k][:, -1]),
                                   np.array(blocks[k + 1][:, 0]))


def test_w_to_s_layout(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.z_dim))
    ws = mapping(params, cfg, z)
    s = w_to_s(params, cfg, ws)
    assert s.shape == (2, N_STYLE_CHANNELS, 512)
    ts = cfg.temp_shapes()
    # occupied rows are nonzero within their true width, zero beyond
    n_rows = cfg.num_style_rows
    assert np.abs(np.array(s[:, n_rows:, :])).max() == 0
    row = 2
    for k in range(1, len(cfg.block_resolutions)):
        w0 = ts[k][0]
        assert np.abs(np.array(s[:, row, :w0])).max() > 0
        assert np.abs(np.array(s[:, row, w0:])).max() == 0
        row += 3


def test_synthesis_shapes(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.z_dim))
    img = generate(params, cfg, z)
    assert img.shape == (2, 3, 64, 64)
    assert img.dtype == jnp.float32
    assert np.isfinite(np.array(img)).all()


def test_synthesis_until_k(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z))
    img = synthesis(params, cfg, s, until_k=2)  # blocks 4, 8, 16
    assert img.shape == (1, 3, 16, 16)
    xs, img2 = synthesis(params, cfg, s, until_k=2, return_features=True)
    assert len(xs) == 3
    assert xs[-1].shape[-1] == 16
    np.testing.assert_allclose(np.array(img), np.array(img2))


def test_noise_modes(small_gen):
    cfg, params = small_gen
    # noise_strength inits to 0 (ADA convention) — give it signal so the
    # noise modes are distinguishable.
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["synthesis"]["b8"]["conv1"] = dict(
        params["synthesis"]["b8"]["conv1"], noise_strength=jnp.float32(0.5))
    z = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z))
    img_const1 = synthesis(params, cfg, s, noise_mode="const")
    img_const2 = synthesis(params, cfg, s, noise_mode="const")
    np.testing.assert_allclose(np.array(img_const1), np.array(img_const2))
    img_none = synthesis(params, cfg, s, noise_mode="none")
    assert not np.allclose(np.array(img_const1), np.array(img_none))
    k = jax.random.PRNGKey(7)
    img_r1 = synthesis(params, cfg, s, noise_mode="random", noise_key=k)
    img_r2 = synthesis(params, cfg, s, noise_mode="random",
                       noise_key=jax.random.PRNGKey(8))
    assert not np.allclose(np.array(img_r1), np.array(img_r2))


def test_direction_application_changes_image(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z))
    direction = jnp.zeros((1, N_STYLE_CHANNELS, 512))
    direction = direction.at[:, list(S_TRAINABLE_SPACE_CHANNELS), :128].set(0.5)
    img0 = synthesis(params, cfg, s)
    img1 = synthesis(params, cfg, s + direction)
    assert not np.allclose(np.array(img0), np.array(img1))


@pytest.mark.slow
def test_grad_flows_to_styles(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(9), (1, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z))

    def loss(delta):
        return jnp.mean(jnp.square(synthesis(params, cfg, s + delta)))

    g = jax.grad(loss)(jnp.zeros_like(s))
    g = np.array(g)
    assert np.isfinite(g).all()
    n_rows = cfg.num_style_rows
    assert np.abs(g[:, :n_rows]).max() > 0
    # no gradient to unused padded rows
    assert np.abs(g[:, n_rows:]).max() == 0


def test_feature_blending(small_gen):
    cfg, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(10), (2, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z))
    xs_orig, _ = synthesis(params, cfg, s, return_features=True)
    # full mask at res 32 → block output replaced by original features
    mask = jnp.ones((1, 1, 32, 32))
    s2 = s + 0.3
    img_blend = synthesis(params, cfg, s2, blend_masks={32: mask},
                          xs_original=xs_orig)
    img_plain = synthesis(params, cfg, s2)
    assert not np.allclose(np.array(img_blend), np.array(img_plain))


def test_until_k_resolution_dict():
    assert RESOLUTION_UNTIL_K == {256: 6, 512: 7, 1024: 8}
    # until_k=6 on a 1024 generator stops at block b256
    cfg = GeneratorConfig(img_resolution=1024)
    assert cfg.block_resolutions[6] == 256


@pytest.mark.slow
def test_bf16_synthesis(small_gen):
    cfg_bf16 = GeneratorConfig(img_resolution=64, channel_base=4096,
                               channel_max=128, low_precision_dtype="bfloat16")
    _, params = small_gen
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 512))
    cfg32 = GeneratorConfig(img_resolution=64, channel_base=4096, channel_max=128)
    s = w_to_s(params, cfg32, mapping(params, cfg32, z))
    img32 = np.array(synthesis(params, cfg32, s))
    img16 = np.array(synthesis(params, cfg_bf16, s))
    assert img16.dtype == np.float32  # output always fp32
    # bf16 path stays close to fp32
    assert np.abs(img16 - img32).mean() < 0.1


@pytest.mark.slow
def test_discriminator_forward_and_grad():
    from stylemc_tpu.models.stylegan2.discriminator import (
        init_discriminator_params, discriminator_apply, minibatch_stddev,
    )
    params = init_discriminator_params(jax.random.PRNGKey(0), size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32)) * 0.5
    logits = discriminator_apply(params, x)
    assert logits.shape == (4, 1)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        return jnp.mean(jax.nn.softplus(-discriminator_apply(p, x)))

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["stem"]["weight"])).all()
    # minibatch stddev adds one channel
    y = minibatch_stddev(x)
    assert y.shape == (4, 4, 32, 32)


@pytest.mark.slow
def test_second_order_gradients_through_resample():
    # JAX-native replacement for the reference's conv2d_gradfix shims
    # (torch_utils/ops/conv2d_gradfix.py): double-backward must work through
    # the resampling conv (needed for R1-style penalties).
    from stylemc_tpu.ops import conv2d_resample, setup_filter
    f = setup_filter([1, 3, 3, 1])
    w = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 3, 3)) * 0.3
    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8))

    def inner(x):
        y = conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=False)
        return jnp.sum(y ** 2)

    def penalty(x):
        g = jax.grad(inner)(x)
        return jnp.sum(g ** 2)

    gg = jax.grad(penalty)(x0)
    assert np.isfinite(np.asarray(gg)).all()
    assert np.abs(np.asarray(gg)).max() > 0


@pytest.mark.slow
def test_remat_matches_non_remat():
    # jax.checkpoint blocks: identical forward AND gradients, lower peak HBM.
    # Tiny 32px config: the remat equivalence property is shape-independent
    # and the small_gen fixture costs ~25 s of CPU compile here.
    import dataclasses
    cfg = GeneratorConfig(img_resolution=32, channel_base=2048,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    cfg_r = dataclasses.replace(cfg, remat=True)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z))

    def loss(c, s):
        return jnp.sum(jnp.square(synthesis(params, c, s, noise_mode="const")))

    l0, g0 = jax.value_and_grad(lambda s: loss(cfg, s))(styles)
    l1, g1 = jax.value_and_grad(lambda s: loss(cfg_r, s))(styles)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_up_conv_impl_cfg_equivalence():
    """cfg.up_conv_impl selects algebraically identical fused up-conv forms
    (pad_dilate vs polyphase); synthesis output must match to fp32 rounding,
    and the grad wrt styles must match too (training uses polyphase, serving
    pad_dilate — both must be the same function)."""
    import dataclasses

    cfg = GeneratorConfig(img_resolution=32, channel_base=512,
                          channel_max=32, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.z_dim))
    s = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))

    outs, grads = {}, {}
    for impl in ("polyphase", "pad_dilate"):
        c = dataclasses.replace(cfg, up_conv_impl=impl)

        def loss(ss):
            return jnp.sum(jnp.square(synthesis(params, c, ss,
                                                noise_mode="const")))

        outs[impl] = np.asarray(synthesis(params, c, s, noise_mode="const"))
        grads[impl] = np.asarray(jax.grad(loss)(s))
    np.testing.assert_allclose(outs["polyphase"], outs["pad_dilate"],
                               atol=5e-4, rtol=1e-4)
    scale = np.abs(grads["polyphase"]).max()
    np.testing.assert_allclose(grads["polyphase"] / scale,
                               grads["pad_dilate"] / scale, atol=1e-4)
