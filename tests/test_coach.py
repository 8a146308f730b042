"""e4e training stack: ranger, lpips, criteria, discriminator, coach loop,
editings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from stylemc_tpu.train.ranger import ranger, gradient_centralization, lookahead
from stylemc_tpu.losses.lpips import init_lpips_params, lpips_loss
from stylemc_tpu.losses.w_norm import w_norm_loss
from stylemc_tpu.losses.moco import e4e_id_loss
from stylemc_tpu.models.e4e.discriminator import (
    init_discriminator_params, discriminator_apply, LatentCodesPool,
)
from stylemc_tpu.models.e4e.editings import (
    apply_interfacegan, apply_ganspace, sefa_factorize, apply_sefa,
)
from stylemc_tpu.models.e4e.psp import PSP, PSPConfig
from stylemc_tpu.models.e4e.encoders import init_encoder_params
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params,
)
from stylemc_tpu.train.coach import Coach, CoachOptions
from tiny import tiny_arcface, TINY_ARCFACE_LAYOUT, TINY_E4E_LAYOUT


# ----------------------------------------------------------------- ranger

def test_gradient_centralization():
    gc = gradient_centralization()
    g2d = jnp.ones((4, 8))
    g1d = jnp.ones((4,))
    updates, _ = gc.update({"a": g2d, "b": g1d}, gc.init(None))
    np.testing.assert_allclose(np.asarray(updates["a"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(updates["b"]), 1.0)


def test_lookahead_syncs_every_k():
    opt = optax.chain(optax.scale(-0.1), lookahead(k=2, alpha=0.5))
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    grads = {"w": jnp.ones(())}
    # step 1: fast only: w = -0.1
    u, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(params["w"]), -0.1, rtol=1e-6)
    # step 2: fast w = -0.2; sync: slow = 0 + 0.5*(-0.2-0) = -0.1 → w=-0.1
    u, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(params["w"]), -0.1, rtol=1e-6)


@pytest.mark.slow
def test_ranger_decreases_loss():
    opt = ranger(5e-2)
    params = {"w": jnp.asarray(2.0)}
    state = opt.init(params)

    def loss_fn(p):
        return (p["w"] - 1.0) ** 2

    losses = []
    for _ in range(200):
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, state = opt.update(g, state, params)
        params = optax.apply_updates(params, u)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


# ------------------------------------------------------------------ lpips

@pytest.mark.slow
def test_lpips_zero_for_identical():
    p = init_lpips_params(jax.random.PRNGKey(0), "alex")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5
    np.testing.assert_allclose(float(lpips_loss(p, x, x, "alex")), 0.0,
                               atol=1e-6)


@pytest.mark.slow
def test_lpips_positive_and_grad():
    p = init_lpips_params(jax.random.PRNGKey(0), "vgg")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64)) * 0.5
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 64, 64)) * 0.5
    val, g = jax.value_and_grad(
        lambda a: lpips_loss(p, a, y, "vgg"))(x)
    assert float(val) > 0
    assert np.isfinite(np.asarray(g)).all()


# --------------------------------------------------------------- criteria

def test_w_norm_loss():
    latent = jnp.ones((2, 14, 512))
    avg = jnp.ones((14, 512))
    np.testing.assert_allclose(float(w_norm_loss(latent, avg)), 0.0)
    assert float(w_norm_loss(latent, None, start_from_latent_avg=False)) > 0


@pytest.mark.slow
def test_e4e_id_loss():
    arc = tiny_arcface()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 256, 256)) * 0.3
    loss, sim = e4e_id_loss(arc, x, x, x, TINY_ARCFACE_LAYOUT)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(sim), 0.0, atol=1e-5)


# ----------------------------------------------------------- discriminator

def test_discriminator_and_pool():
    p = init_discriminator_params(jax.random.PRNGKey(0))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 512))
    out = discriminator_apply(p, w)
    assert out.shape == (4, 1)

    pool = LatentCodesPool(8)
    ws = np.random.randn(4, 512).astype(np.float32)
    got = pool.query(ws)
    assert got.shape == (4, 512)
    got2 = pool.query(np.random.randn(4, 14, 512).astype(np.float32))
    assert got2.shape == (4, 512)


# ----------------------------------------------------------------- editings

def test_interfacegan():
    latent = jnp.zeros((1, 14, 512))
    direction = jnp.ones((1, 14, 512))
    out = apply_interfacegan(latent, direction, factor=2.0)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    sweep = apply_interfacegan(latent, direction, factor_range=(-2, 3))
    assert sweep.shape == (5, 14, 512)


def test_ganspace():
    pca = {"mean": jnp.zeros((512,)),
           "comp": jnp.eye(512)[:10],
           "std": jnp.ones((10,))}
    latents = jnp.ones((1, 14, 512)) * 0.1
    out = apply_ganspace(latents, pca, [(0, 2, 6, 5.0)])
    assert out.shape == (1, 14, 512)
    # rows outside [2, 6) unchanged
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.1, rtol=1e-5)
    assert not np.allclose(np.asarray(out[0, 3]), 0.1)


def test_sefa():
    cfg = GeneratorConfig(img_resolution=32, channel_base=1024, channel_max=64,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    layers, boundaries, values = sefa_factorize(params)
    assert boundaries.shape[0] == boundaries.shape[1] == 512
    latents = jnp.zeros((1, cfg.num_ws, 512))
    out = apply_sefa(params, latents, indices=(2, 3), step=3)
    assert out.shape == (3, cfg.num_ws, 512)


# -------------------------------------------------------------------- coach

@pytest.fixture(scope="module")
def tiny_coach():
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    psp = PSP(cfg=PSPConfig(stylegan_size=256,
                            encoder_layout=TINY_E4E_LAYOUT),
              encoder_params=enc_params,
              decoder_cfg=gen_cfg, decoder_params=gen_params,
              latent_avg=jnp.zeros((14, 512)))
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}

    rng = np.random.RandomState(0)

    def train_iter():
        x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3
        return x, x.copy()

    opts = CoachOptions(batch_size=2, max_steps=2, stylegan_size=256,
                        w_discriminator_lambda=0.1, progressive_start=1,
                        progressive_step_every=1, id_lambda=0.1,
                        lpips_lambda=0.8, l2_lambda=1.0)
    return Coach(opts, psp, perception, train_iter, test_iter=train_iter,
                 arcface_layout=TINY_ARCFACE_LAYOUT)


@pytest.mark.slow
def test_coach_progressive_schedule(tiny_coach):
    coach = tiny_coach
    assert coach.opts.progressive_steps[0] == 0
    assert coach.progressive_stage() == 0
    assert coach.get_dims_to_discriminate() == [0]


@pytest.mark.nightly
def test_coach_train_steps(tiny_coach):
    coach = tiny_coach
    x, y = coach.train_iter()
    d = coach.train_step(x, y)
    assert np.isfinite(d["loss"])
    assert "loss_l2" in d and "loss_lpips" in d and "loss_id" in d
    assert "discriminator_loss" in d
    assert "encoder_discriminator_loss" in d
    # second step advances the progressive stage (progressive_start=1)
    d2 = coach.train_step(x, y)
    assert coach.progressive_stage() >= 1
    assert "total_delta_loss" in d2
    assert np.isfinite(d2["loss"])


@pytest.mark.slow
def test_coach_perception_bf16_close_to_fp32():
    """perception_bf16 runs the LPIPS/ID towers in bf16: the step must
    produce finite losses close to the fp32 coach's (same weights, same
    batch) — trainable state and the L2 term stay fp32 exactly."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3

    losses = {}
    for tag, kw in (("fp32", {}),
                    ("pbf16", dict(perception_bf16=True)),
                    ("encbf16", dict(encoder_bf16=True)),
                    ("fullbf16", dict(bf16_full=True,
                                      perception_bf16=True))):
        # fresh buffers per coach: train_step donates the trainable params
        # (Coach docstring), so the first run deletes shared arrays
        psp = PSP(cfg=PSPConfig(stylegan_size=256,
                                encoder_layout=TINY_E4E_LAYOUT),
                  encoder_params=jax.tree_util.tree_map(jnp.array,
                                                        enc_params),
                  decoder_cfg=gen_cfg, decoder_params=gen_params,
                  latent_avg=jnp.zeros((14, 512)))
        opts = CoachOptions(batch_size=2, max_steps=1, stylegan_size=256,
                            w_discriminator_lambda=0.0, id_lambda=0.1,
                            lpips_lambda=0.8, l2_lambda=1.0, **kw)
        coach = Coach(opts, psp, perception,
                      lambda: (x, x.copy()), test_iter=None,
                      arcface_layout=TINY_ARCFACE_LAYOUT)
        losses[tag] = coach.train_step(x, x.copy())
    for variant, tol in (("pbf16", 0.05), ("encbf16", 0.1),
                         ("fullbf16", 0.15)):
        for k in ("loss", "loss_id", "loss_lpips", "loss_l2"):
            a, b = float(losses["fp32"][k]), float(losses[variant][k])
            assert np.isfinite(b), (variant, k, b)
            assert abs(a - b) <= tol * max(abs(a), 1e-2), (variant, k, a, b)
    # the fp32 term must be bit-identical (it never touches bf16)
    np.testing.assert_allclose(float(losses["fp32"]["loss_l2"]),
                               float(losses["pbf16"]["loss_l2"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_coach_train_decoder_donation():
    """Pin the train_decoder=True donation aliasing contract: the decoder
    rides in `trainable` (donated) while `frozen` carries a scalar
    placeholder — passing the decoder buffers twice would abort with a
    donate-same-buffer error (coach.py _get_step_fn). Runs 3 donated steps
    with the W-discriminator on, plus use_w_pool (the pool round-trips W
    codes through numpy between donated d-steps)."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    psp = PSP(cfg=PSPConfig(stylegan_size=256,
                            encoder_layout=TINY_E4E_LAYOUT),
              encoder_params=enc_params,
              decoder_cfg=gen_cfg, decoder_params=gen_params,
              latent_avg=jnp.zeros((14, 512)))
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}
    rng = np.random.RandomState(0)

    def train_iter():
        x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3
        return x, x.copy()

    opts = CoachOptions(batch_size=2, max_steps=3, stylegan_size=256,
                        w_discriminator_lambda=0.1, id_lambda=0.1,
                        lpips_lambda=0.8, l2_lambda=1.0,
                        train_decoder=True, use_w_pool=True)
    coach = Coach(opts, psp, perception, train_iter, test_iter=None,
                  arcface_layout=TINY_ARCFACE_LAYOUT)
    # numpy copies — the device buffers themselves are donated by step 1
    dec_before = [np.asarray(l) for l in
                  jax.tree_util.tree_leaves(gen_params)]
    for _ in range(3):
        x, y = train_iter()
        d = coach.train_step(x, y)
        assert np.isfinite(d["loss"]), d
    # the decoder actually trained (rode in trainable, not frozen)
    dec_after = [np.asarray(l) for l in
                 jax.tree_util.tree_leaves(coach.psp.decoder_params)]
    changed = sum(not np.array_equal(a, b)
                  for a, b in zip(dec_after, dec_before))
    assert changed > 0, "decoder params unchanged after train_decoder steps"


@pytest.mark.slow
def test_coach_fused_d_step_matches_unfused():
    """The fused single-dispatch W-D step (fuse_d_step=True, the default)
    must reproduce the unfused 3-dispatch path exactly: same loss dicts,
    same trained params, across both regularized (lazy R1) and plain D
    steps. d_reg_every=2 makes steps 0 and 2 R1 steps."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}
    rng_batches = np.random.RandomState(7)
    batches = [rng_batches.randn(2, 3, 256, 256).astype(np.float32) * 0.3
               for _ in range(3)]

    def make(fused):
        # fresh buffers per coach: train_step donates trainable AND (on the
        # fused path) discriminator state
        psp = PSP(cfg=PSPConfig(stylegan_size=256,
                                encoder_layout=TINY_E4E_LAYOUT),
                  encoder_params=jax.tree_util.tree_map(jnp.array,
                                                        enc_params),
                  decoder_cfg=gen_cfg,
                  decoder_params=jax.tree_util.tree_map(jnp.array,
                                                        gen_params),
                  latent_avg=jnp.zeros((14, 512)))
        opts = CoachOptions(batch_size=2, max_steps=3, stylegan_size=256,
                            w_discriminator_lambda=0.1, id_lambda=0.1,
                            lpips_lambda=0.8, l2_lambda=1.0, d_reg_every=2,
                            fuse_d_step=fused)
        return Coach(opts, psp, perception, lambda: None, test_iter=None,
                     arcface_layout=TINY_ARCFACE_LAYOUT)

    ca, cb = make(True), make(False)
    for i, x in enumerate(batches):
        da = ca.train_step(x, x.copy())
        db = cb.train_step(x, x.copy())
        assert set(da) == set(db), (i, set(da) ^ set(db))
        for k in da:
            np.testing.assert_allclose(da[k], db[k], rtol=2e-4, atol=1e-5,
                                       err_msg=f"step {i} key {k}")
        assert ("discriminator_r1_loss" in da) == (i % 2 == 0), (i, da)
    for la, lb in zip(jax.tree_util.tree_leaves(ca.psp.encoder_params),
                      jax.tree_util.tree_leaves(cb.psp.encoder_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-5)
    for la, lb in zip(
            jax.tree_util.tree_leaves(ca.discriminator_params),
            jax.tree_util.tree_leaves(cb.discriminator_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_coach_prefetcher_matches_inline():
    """The background-thread batch prefetcher must not change training:
    one worker pulls train_iter sequentially, so the batch order — and
    therefore every loss — matches the inline loop exactly."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}

    def run(prefetch):
        rng = np.random.RandomState(5)

        def train_iter():
            x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3
            return x, x.copy()

        psp = PSP(cfg=PSPConfig(stylegan_size=256,
                                encoder_layout=TINY_E4E_LAYOUT),
                  encoder_params=jax.tree_util.tree_map(jnp.array,
                                                        enc_params),
                  decoder_cfg=gen_cfg,
                  decoder_params=jax.tree_util.tree_map(jnp.array,
                                                        gen_params),
                  latent_avg=jnp.zeros((14, 512)))
        opts = CoachOptions(batch_size=2, max_steps=3, stylegan_size=256,
                            w_discriminator_lambda=0.1, id_lambda=0.1,
                            lpips_lambda=0.8, l2_lambda=1.0,
                            prefetch_batches=prefetch)
        coach = Coach(opts, psp, perception, train_iter, test_iter=None,
                      arcface_layout=TINY_ARCFACE_LAYOUT)
        seen = []
        coach.train(callback=lambda step, d: seen.append(d["loss"]))
        return seen

    inline, prefetched = run(0), run(2)
    assert len(inline) == len(prefetched) == 3
    np.testing.assert_allclose(inline, prefetched, rtol=1e-6)


@pytest.mark.slow
def test_coach_selective_remat_matches_full():
    """remat_min_res stores the low-res blocks' activations instead of
    rematerializing them — identical numerics to full remat by
    construction; pin the first train step's losses."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None, remat=True)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}
    x = np.random.RandomState(3).randn(2, 3, 256, 256).astype(np.float32) * 0.3

    def run(min_res):
        psp = PSP(cfg=PSPConfig(stylegan_size=256,
                                encoder_layout=TINY_E4E_LAYOUT),
                  encoder_params=jax.tree_util.tree_map(jnp.array,
                                                        enc_params),
                  decoder_cfg=gen_cfg,
                  decoder_params=jax.tree_util.tree_map(jnp.array,
                                                        gen_params),
                  latent_avg=jnp.zeros((14, 512)))
        opts = CoachOptions(batch_size=2, max_steps=1, stylegan_size=256,
                            w_discriminator_lambda=0.1, id_lambda=0.1,
                            lpips_lambda=0.8, l2_lambda=1.0,
                            remat_min_res=min_res)
        coach = Coach(opts, psp, perception, lambda: None, test_iter=None,
                      arcface_layout=TINY_ARCFACE_LAYOUT)
        assert coach.psp.decoder_cfg.remat_min_res == min_res
        return coach.train_step(x, x.copy())

    d_full, d_sel = run(0), run(64)
    assert set(d_full) == set(d_sel)
    for k in d_full:
        np.testing.assert_allclose(d_full[k], d_sel[k], rtol=1e-5,
                                   atol=1e-7, err_msg=k)


@pytest.mark.slow
def test_coach_checkpoint_roundtrip(tiny_coach, tmp_path):
    coach = tiny_coach
    path = str(tmp_path / "ckpt.pkl")
    coach.save_checkpoint(path)
    step0 = coach.global_step
    coach.global_step = 999
    coach.load_checkpoint(path)
    assert coach.global_step == step0


@pytest.mark.slow
def test_coach_orbax_checkpoint_roundtrip(tiny_coach, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    coach = tiny_coach
    path = str(tmp_path / "orbax_ckpt")
    coach.save_checkpoint(path, backend="orbax")
    step0 = coach.global_step
    coach.global_step = 12345
    coach.load_checkpoint(path, backend="orbax")
    assert coach.global_step == step0


@pytest.mark.slow
def test_coach_sample_fn_matches_eager_encode(tiny_coach):
    """The jitted per-stage sampling graph must reproduce the eager
    gen_mapping + PSP.encode path it replaced (coach.py _get_sample_fn)."""
    from stylemc_tpu.models.stylegan2.generator import mapping as gen_mapping
    coach = tiny_coach
    stage = coach.progressive_stage()
    z = jnp.asarray(np.random.RandomState(7).randn(2, 512), jnp.float32)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 3, 256, 256)
                    .astype(np.float32) * 0.3)
    sample = coach._get_sample_fn(stage)
    real_w, fake_w = sample(coach.psp.decoder_params,
                            coach.psp.encoder_params,
                            coach.psp.latent_avg, z, x)
    ref_real = gen_mapping(coach.psp.decoder_params, coach.psp.decoder_cfg,
                           z)[:, 0, :]
    ref_fake = coach.psp.encode(x, progressive_stage=stage)
    # 1e-4: the jitted graph fuses/reassociates differently from the eager
    # composition, and when the module-scoped coach has already been trained
    # by test_coach_train_steps the noise reaches ~2e-5 (reproduced; pure
    # fp32 reassociation — the same inputs/params flow through both sides)
    np.testing.assert_allclose(np.asarray(real_w), np.asarray(ref_real),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fake_w), np.asarray(ref_fake),
                               rtol=1e-4, atol=1e-4)


def test_prefetch_iterator():
    from stylemc_tpu.data.images import prefetch_iterator
    import itertools
    counter = itertools.count()

    def make():
        return next(counter)

    get = prefetch_iterator(make, depth=2)
    got = {get() for _ in range(5)}
    assert got == {0, 1, 2, 3, 4}


def _mesh_coach(mesh=None, **opt_kw):
    """Fresh tiny coach with a deterministic data stream (for the mesh-DP
    equivalence test — the module-scoped fixture shares mutable state)."""
    gen_cfg = GeneratorConfig(img_resolution=256, channel_base=512,
                              channel_max=32, mapping_layers=2,
                              conv_clamp=None)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=256,
                                     layout=TINY_E4E_LAYOUT)
    psp = PSP(cfg=PSPConfig(stylegan_size=256,
                            encoder_layout=TINY_E4E_LAYOUT),
              encoder_params=enc_params,
              decoder_cfg=gen_cfg, decoder_params=gen_params,
              latent_avg=jnp.zeros((14, 512)))
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": tiny_arcface()}
    rng = np.random.RandomState(7)

    def train_iter():
        x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.3
        return x, x.copy()

    opts = CoachOptions(batch_size=2, max_steps=2, stylegan_size=256,
                        w_discriminator_lambda=0.1, id_lambda=0.1,
                        lpips_lambda=0.8, l2_lambda=1.0, **opt_kw)
    return Coach(opts, psp, perception, train_iter, test_iter=None,
                 arcface_layout=TINY_ARCFACE_LAYOUT, mesh=mesh)


@pytest.mark.nightly
def test_coach_mesh_data_parallel_matches_single():
    """Coach(mesh=2-device data mesh): per-step losses match the
    single-device coach (GSPMD grad psum == serial batch gradient)."""
    from stylemc_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(max_size=2)
    assert mesh.devices.size == 2

    single = _mesh_coach(mesh=None)
    sharded = _mesh_coach(mesh=mesh)

    for _ in range(2):
        x, y = single.train_iter()
        d1 = single.train_step(x, y)
        d2 = sharded.train_step(x, y)
        assert d1.keys() == d2.keys()
        for k in d1:
            np.testing.assert_allclose(d2[k], d1[k], rtol=2e-3, atol=2e-4,
                                       err_msg=k)


def test_lookahead_slow_weights_own_their_buffers():
    """The slow-weight copy must NOT alias the live params: a train step
    that donates both (params, opt_state) would otherwise donate the same
    buffer twice — XLA aborts the process ("Attempt to donate the same
    buffer twice in Execute()"; found via the donated 1024px Coach step)."""
    params = {"w": jnp.ones((8, 8))}
    la = lookahead(k=2, alpha=0.5)
    state = la.init(params)
    assert state.slow["w"].unsafe_buffer_pointer() != \
        params["w"].unsafe_buffer_pointer()

    # the full ranger chain (what Coach actually donates) must also hold
    opt = ranger(1e-3)
    st = opt.init(params)
    ptrs = {l.unsafe_buffer_pointer()
            for l in jax.tree_util.tree_leaves(params)}
    for leaf in jax.tree_util.tree_leaves(st):
        if hasattr(leaf, "unsafe_buffer_pointer"):
            assert leaf.unsafe_buffer_pointer() not in ptrs


@pytest.mark.nightly
def test_coach_bf16_option_close_to_fp32():
    """CoachOptions(bf16=True): bf16 activations in the decoder's upper
    blocks, fp32 params/optimizer — losses stay finite and near the fp32
    coach's on the same data (mixed precision, not a different model)."""
    c32 = _mesh_coach(mesh=None)
    x, y = c32.train_iter()

    c16 = _mesh_coach(mesh=None, bf16=True)
    assert c16.psp.decoder_cfg.low_precision_dtype == "bfloat16"

    d32 = c32.train_step(x, y)
    d16 = c16.train_step(x, y)
    assert d16.keys() == d32.keys()
    for k in d32:
        assert np.isfinite(d16[k]), k
        np.testing.assert_allclose(d16[k], d32[k], rtol=0.1, atol=0.05,
                                   err_msg=k)
