"""End-to-end trainer tests on tiny models: find_direction, latent mapper,
and edit application. Exercises the full jit graphs including the data-
parallel mesh path on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.models.stylegan2.generator import (
    mapping, w_to_s, N_STYLE_CHANNELS, S_TRAINABLE_SPACE_CHANNELS,
)
from stylemc_tpu.models.clip import FallbackTokenizer
from stylemc_tpu.models.mapper import (
    init_mapper_params, mapper_apply, params_from_torch_state,
    params_to_torch_state,
)
from stylemc_tpu.train.find_direction import (
    FindDirectionConfig, find_direction, cosine_lr, until_k_for_resolution,
    assemble_direction,
)
from stylemc_tpu.train.latent_mapper import MapperTrainConfig, train_latent_mapper
from stylemc_tpu.edit import apply_edit_batch, mapper_direction
from stylemc_tpu.parallel.mesh import data_mesh
from tiny import tiny_gen, tiny_clip_models, tiny_arcface, TINY_ARCFACE_LAYOUT


@pytest.fixture(scope="module")
def setup():
    gen_cfg, gen_params = tiny_gen(resolution=32)
    clip_models = tiny_clip_models()
    arcface = tiny_arcface()
    z = jax.random.normal(jax.random.PRNGKey(9), (12, gen_cfg.z_dim))
    styles = w_to_s(gen_params, gen_cfg, mapping(gen_params, gen_cfg, z))
    return gen_cfg, gen_params, clip_models, arcface, np.asarray(styles)


def _fdc(**kw):
    base = dict(resolution=32, batch_size=4, n_epochs=1,
                learning_rate=0.5, clip_type="double",
                arcface_layout=TINY_ARCFACE_LAYOUT, seed=0)
    base.update(kw)
    return FindDirectionConfig(**base)


def test_cosine_lr_schedule():
    assert cosine_lr(2.0, 1, 100) == pytest.approx(
        np.cos(np.pi / 100) * 1.0 + 1.0)
    assert cosine_lr(2.0, 100, 100) == pytest.approx(0.0, abs=1e-9)


def test_constant_lr_schedule(setup):
    """lr_schedule='constant' (bench.py numerics tripwire regime): LR holds
    at learning_rate every step; both the unrolled and the scan
    (steps_per_dispatch>1) paths honor it and agree."""
    from stylemc_tpu.train.find_direction import schedule_lr

    fdc = _fdc(lr_schedule="constant")
    assert schedule_lr(fdc, 1, 100) == schedule_lr(fdc, 100, 100) == 0.5
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    d_unrolled, info = find_direction(
        gen_params, gen_cfg, styles, clip_models, arcface, fdc,
        tokenizer=FallbackTokenizer())
    d_scan, _ = find_direction(
        gen_params, gen_cfg, styles, clip_models, arcface,
        _fdc(lr_schedule="constant", steps_per_dispatch=3),
        tokenizer=FallbackTokenizer())
    assert np.isfinite(info["history"]).all()
    # scan-vs-unrolled tolerance as in
    # test_find_direction_steps_per_dispatch_matches_unrolled (XLA fuses
    # the scan body differently — reduction reassociation)
    np.testing.assert_allclose(np.asarray(d_unrolled), np.asarray(d_scan),
                               rtol=5e-2, atol=3e-3)
    # and it actually differs from the cosine schedule's result
    d_cos, _ = find_direction(
        gen_params, gen_cfg, styles, clip_models, arcface, _fdc(),
        tokenizer=FallbackTokenizer())
    assert not np.allclose(np.asarray(d_unrolled), np.asarray(d_cos))


def test_find_direction_runs_and_updates(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    direction, info = find_direction(
        gen_params, gen_cfg, styles, clip_models, arcface, _fdc(),
        tokenizer=FallbackTokenizer())
    direction = np.asarray(direction)
    assert direction.shape == (1, N_STYLE_CHANNELS, 512)
    assert np.isfinite(info["history"]).all()
    trainable = list(S_TRAINABLE_SPACE_CHANNELS)
    frozen = [i for i in range(N_STYLE_CHANNELS) if i not in trainable]
    assert np.abs(direction[:, trainable]).max() > 0
    assert np.abs(direction[:, frozen]).max() == 0
    assert info["iterations"] == 3  # ceil(12/4) * 1 epoch


def test_find_direction_data_parallel_matches_single(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    fdc = _fdc(batch_size=8, clip_type="small")
    d1, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc, tokenizer=FallbackTokenizer())
    mesh = data_mesh(max_size=8)
    assert mesh.devices.size == 8
    d2, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc, tokenizer=FallbackTokenizer(), mesh=mesh)
    # XLA reduction order differs across shardings; diffs amplify over SGD
    # steps — this asserts agreement, not bit-exactness.
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=5e-2, atol=5e-3)


@pytest.mark.slow
def test_find_direction_nada_loss_type(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    direction, info = find_direction(
        gen_params, gen_cfg, styles, clip_models, arcface,
        _fdc(clip_loss_type="nada", clip_type="small"),
        tokenizer=FallbackTokenizer())
    assert np.isfinite(info["history"]).all()


def test_find_direction_resume(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    fdc = _fdc(clip_type="small")
    d1, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc, tokenizer=FallbackTokenizer())
    d2, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc, tokenizer=FallbackTokenizer(),
                           resume_direction=np.asarray(d1))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


# ----------------------------------------------------------------- mapper

def test_mapper_apply_shapes():
    params = init_mapper_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 512))
    out = mapper_apply(params, x)
    assert out.shape == (3, 8, 512)
    # coarse/medium halves are independent
    x2 = x.at[:, 4:, :].set(0.0)
    out2 = mapper_apply(params, x2)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out2[:, :4]),
                               rtol=1e-5)


def test_mapper_torch_state_roundtrip():
    params = init_mapper_params(jax.random.PRNGKey(2))
    state = params_to_torch_state(params)
    assert "course_mapping.modulation_module_list.0.fc.weight" in state
    params2 = params_from_torch_state(state)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 512))
    np.testing.assert_allclose(np.asarray(mapper_apply(params, x)),
                               np.asarray(mapper_apply(params2, x)), rtol=1e-6)


def test_train_latent_mapper_runs(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    mtc = MapperTrainConfig(
        resolution=32, batch_size=4, n_epochs=1, learning_rate=1e-3,
        clip_type="small", arcface_layout=TINY_ARCFACE_LAYOUT, seed=0)
    p0 = init_mapper_params(jax.random.PRNGKey(0))
    mp, info = train_latent_mapper(
        gen_params, gen_cfg, styles, clip_models, arcface, mtc,
        tokenizer=FallbackTokenizer(), resume_params=p0)
    assert np.isfinite(info["history"]).all()
    # parameters changed
    w0 = np.asarray(p0["course_mapping"]["mod0"]["fc"]["weight"])
    w1 = np.asarray(mp["course_mapping"]["mod0"]["fc"]["weight"])
    assert not np.allclose(w0, w1)


# ----------------------------------------------------------------- edit

def test_apply_edit_batch(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    direction = assemble_direction(
        jnp.ones((1, 8, 512)) * 0.1)
    orig, edited = apply_edit_batch(gen_params, gen_cfg,
                                    jnp.asarray(styles[:4]), direction, 2.0)
    assert orig.shape == edited.shape == (4, 3, 32, 32)
    assert not np.allclose(np.asarray(orig), np.asarray(edited))
    # change_power=0 → identical
    orig0, edited0 = apply_edit_batch(gen_params, gen_cfg,
                                      jnp.asarray(styles[:4]), direction, 0.0)
    np.testing.assert_allclose(np.asarray(orig0), np.asarray(edited0))


def test_mapper_direction_threshold_and_stoplist():
    params = init_mapper_params(jax.random.PRNGKey(4))
    styles_item = jax.random.normal(jax.random.PRNGKey(5),
                                    (N_STYLE_CHANNELS, 512))
    d_plain = np.asarray(mapper_direction(params, styles_item))
    d_wl = np.asarray(mapper_direction(params, styles_item,
                                       use_whitelist=True))
    assert d_plain.shape == (1, N_STYLE_CHANNELS, 512)
    # thresholding zeros small entries
    small = np.abs(d_plain) < 0.1
    assert (d_wl[small] == 0).all()
    # stoplist flat indices zeroed
    from stylemc_tpu.edit import STOPLIST_S_IDS
    flat = d_wl.reshape(-1)
    assert (flat[STOPLIST_S_IDS] == 0).all()


def test_split_step_matches_fused(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    fdc_fused = _fdc(clip_type="small")
    fdc_split = _fdc(clip_type="small", split_step=True)
    d1, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc_fused, tokenizer=FallbackTokenizer())
    d2, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                           fdc_split, tokenizer=FallbackTokenizer())
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=5e-3, atol=5e-4)


def test_mapper_directions_batched_matches_per_item():
    from stylemc_tpu.edit import mapper_directions_batched
    params = init_mapper_params(jax.random.PRNGKey(6))
    styles = jax.random.normal(jax.random.PRNGKey(7), (3, N_STYLE_CHANNELS, 512))
    batched = np.asarray(mapper_directions_batched(params, styles,
                                                   use_whitelist=True))
    for i in range(3):
        single = np.asarray(mapper_direction(params, styles[i],
                                             use_whitelist=True))[0]
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)


def test_find_direction_bf16(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    import dataclasses as dc
    cfg_bf16 = dc.replace(gen_cfg, low_precision_dtype="bfloat16")
    d, info = find_direction(gen_params, cfg_bf16, styles, clip_models,
                             arcface, _fdc(clip_type="small"),
                             tokenizer=FallbackTokenizer())
    assert np.isfinite(info["history"]).all()
    assert np.isfinite(np.asarray(d)).all()


def test_find_direction_bf16_perception(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    d32, _ = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                            _fdc(clip_type="small"),
                            tokenizer=FallbackTokenizer())
    d16, info = find_direction(gen_params, gen_cfg, styles, clip_models,
                               arcface,
                               _fdc(clip_type="small",
                                    perception_dtype="bfloat16"),
                               tokenizer=FallbackTokenizer())
    assert np.isfinite(info["history"]).all()
    # the toy 32-dim random-init CLIP amplifies bf16 rounding far beyond
    # real-scale nets (512-dim trained features average it away; measured
    # fp32↔bf16 cosine on the real stack is 0.998 — PARITY.md); the
    # assertion checks directional alignment, not parity. Unit-scale w
    # post mapping-init-fix leaves toy-scale cosine ≈0.86.
    cos = np.sum(np.asarray(d32) * np.asarray(d16)) / (
        np.linalg.norm(np.asarray(d32)) * np.linalg.norm(np.asarray(d16)))
    assert cos > 0.75


@pytest.mark.slow
def test_find_direction_steps_per_dispatch_matches_unrolled(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    d1, i1 = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                            _fdc(clip_type="small", n_epochs=2),
                            tokenizer=FallbackTokenizer())
    d3, i3 = find_direction(gen_params, gen_cfg, styles, clip_models, arcface,
                            _fdc(clip_type="small", n_epochs=2,
                                 steps_per_dispatch=3),
                            tokenizer=FallbackTokenizer())
    assert i1["iterations"] == i3["iterations"]
    assert len(i1["history"]) == len(i3["history"])
    # same RNG stream and per-step math, but XLA fuses the scan body
    # differently from the standalone jit (reduction reassociation) —
    # assert agreement, not bit-exactness
    np.testing.assert_allclose(np.asarray(i3["history"]),
                               np.asarray(i1["history"]), rtol=1e-3)
    # atol covers reassociation noise on near-zero channels (post
    # mapping-init-fix magnitudes: 1/13312 elements sat at 1.9e-3)
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d1),
                               rtol=5e-2, atol=3e-3)


def test_direction_engine_matches_find_direction(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine

    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              clip_type="small", arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    d_ref, _ = find_direction(gen_params, gen_cfg, styles, clip_models,
                              arcface, fdc, tokenizer=FallbackTokenizer())

    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    d_eng, info = eng.optimize("a smiling face")
    # anchors as runtime args vs closed-over constants change XLA
    # constant-folding; fp32 noise only
    np.testing.assert_allclose(np.asarray(d_eng), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    assert info["iterations"] >= 1

    # second prompt reuses the SAME traced step (different anchors only)
    import jax as _jax
    traces_before = eng._step._cache_size()
    d2, _ = eng.optimize("an old face")
    assert eng._step._cache_size() == traces_before, "retraced on prompt swap"
    assert not np.allclose(np.asarray(d2), np.asarray(d_eng))


def test_direction_engine_nada(setup):
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine

    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              clip_type="small", arcface_layout=TINY_ARCFACE_LAYOUT,
                              clip_loss_type="nada",
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    d_ref, _ = find_direction(gen_params, gen_cfg, styles, clip_models,
                              arcface, fdc, tokenizer=FallbackTokenizer())
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    d_eng, _ = eng.optimize("a smiling face")
    np.testing.assert_allclose(np.asarray(d_eng), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


def _direction_cosines(a, b):
    """Per-prompt cosine between flattened directions."""
    a = np.asarray(a).reshape(a.shape[0], -1)
    b = np.asarray(b).reshape(b.shape[0], -1)
    num = np.sum(a * b, axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return num / den


def test_direction_engine_batched_step_matches_serial_step(setup):
    """ONE vmapped step must match the serial engine step tightly (the
    update rule is mathematically identical; only conv-batching sum order
    differs). Multi-step runs are compared at the domain level below —
    fp32 noise amplifies chaotically through SGD on random-init models."""
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import (
        DirectionEngine, TRAINABLE, STYLE_DIM)

    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              clip_type="small",
                              arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    prompts = ["a smiling face", "an old face"]

    delta0 = jax.random.normal(jax.random.PRNGKey(fdc.seed),
                               (1, len(TRAINABLE), STYLE_DIM),
                               jnp.float32) * 1e-3
    idx = jnp.asarray(np.random.RandomState(fdc.seed).randint(
        0, styles.shape[0], size=2), jnp.int32)
    lr = jnp.float32(1.0)

    serial = []
    for prompt in prompts:
        td = eng._text_dirs(prompt, fdc.negative_text_prompt)
        o = eng.optimizer.init(delta0)
        d1, _, l1, _ = eng._step(delta0, o, idx, lr, eng.styles_array,
                                 eng.id_feats, eng.clip_feats,
                                 eng.model_params, td)
        serial.append((np.asarray(d1), float(l1)))

    eng._ensure_batched_step()
    per = [eng._text_dirs(p, fdc.negative_text_prompt) for p in prompts]
    tdb = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per)
    deltas = jnp.broadcast_to(delta0, (2,) + delta0.shape)
    ostates = jax.vmap(eng.optimizer.init)(deltas)
    db, _, lb, _ = eng._batched_step(deltas, ostates, tdb, idx, lr,
                                     eng.styles_array, eng.id_feats,
                                     eng.clip_feats, eng.model_params)
    d0 = np.asarray(delta0)
    for p in range(2):
        d_s, l_s = serial[p]
        assert float(lb[p]) == pytest.approx(l_s, rel=1e-3)
        # compare the UPDATE vectors (−lr·grad): under the forced-8-device
        # CPU backend XLA partitions reductions differently per graph, so
        # near-zero gradient elements see catastrophic-cancellation noise;
        # the update direction and magnitude are the meaningful invariant
        u_b = (np.asarray(db[p]) - d0).ravel()
        u_s = (d_s - d0).ravel()
        cos = np.dot(u_b, u_s) / (np.linalg.norm(u_b) * np.linalg.norm(u_s))
        assert cos > 0.99999, cos
        assert np.linalg.norm(u_b) == pytest.approx(np.linalg.norm(u_s),
                                                    rel=1e-3)


def test_direction_engine_optimize_batch_matches_serial(setup):
    """optimize_batch trains P directions in one vmapped graph; each must
    agree with the serial optimize() result for the same prompt (same init,
    same RandomState(fdc.seed) batch stream) at the domain level: direction
    cosine and norm. Element-exact equality does not survive multi-step
    SGD — XLA partitions reductions differently for the vmapped graph
    (verified: one step matches to ~1e-5; the gap grows with steps), the
    same class of noise as the repo's documented 0.986-1.0 run-to-run
    cosine robustness."""
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine

    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              learning_rate=0.5, clip_type="small",
                              arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    prompts = ["a smiling face", "an old face"]
    d_batch, info = eng.optimize_batch(prompts)
    d_batch = np.asarray(d_batch)
    assert d_batch.shape == (2, 1, N_STYLE_CHANNELS, 512)
    assert info["history"].shape[0] == 2
    assert np.isfinite(info["history"]).all()

    d_serial = np.stack([np.asarray(eng.optimize(p)[0]) for p in prompts])
    cos = _direction_cosines(d_batch, d_serial)
    assert (cos > 0.9999).all(), cos
    norms_b = np.linalg.norm(d_batch.reshape(2, -1), axis=1)
    norms_s = np.linalg.norm(d_serial.reshape(2, -1), axis=1)
    np.testing.assert_allclose(norms_b, norms_s, rtol=1e-3)

    # the two prompts must diverge from each other
    cross = _direction_cosines(d_batch, d_batch[::-1])
    assert (cross < 0.99).all(), cross


def test_direction_engine_optimize_batch_prompt_sharded_mesh(setup):
    """The prompt axis shards over the mesh (zero-collective direction-zoo
    scaling); results must agree with the unsharded vmapped path (domain-
    level: sharding changes XLA reduction partitioning, same noise class
    as above)."""
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              learning_rate=0.5, clip_type="small",
                              arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    prompts = ["a smiling face", "an old face", "a face with glasses",
               "a sad face", "a young face", "a surprised face",
               "an angry face", "a sleepy face"]
    with data_mesh(8) as mesh:
        d_mesh, _ = eng.optimize_batch(prompts, mesh=mesh)
    d_plain, _ = eng.optimize_batch(prompts)
    cos = _direction_cosines(np.asarray(d_mesh), np.asarray(d_plain))
    assert (cos > 0.9999).all(), cos


def test_optimize_batch_resume_directions(setup):
    """Per-prompt resume: entry p of resume_directions seeds prompt p's
    delta exactly as optimize(resume_direction=...) does; None entries keep
    the fresh init."""
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine

    fdc = FindDirectionConfig(resolution=32, batch_size=2, n_epochs=1,
                              learning_rate=0.5, clip_type="small",
                              arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    prompts = ["a smiling face", "an old face"]
    rng = np.random.RandomState(7)
    d_resume = rng.randn(1, N_STYLE_CHANNELS, 512).astype(np.float32) * 0.05

    d_batch, _ = eng.optimize_batch(prompts,
                                    resume_directions=[d_resume, None])
    d_serial0, _ = eng.optimize(prompts[0], resume_direction=d_resume)
    d_serial1, _ = eng.optimize(prompts[1])
    cos = _direction_cosines(np.asarray(d_batch),
                             np.stack([np.asarray(d_serial0),
                                       np.asarray(d_serial1)]))
    assert (cos > 0.9999).all(), cos


def test_resolve_zoo_resume(tmp_path):
    from stylemc_tpu.cli.find_direction import _resolve_zoo_resume

    prompts = ["a smiling face", "an old face"]
    assert _resolve_zoo_resume(None, prompts) is None
    # directory: per-prompt lookup, missing entries stay None
    d = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    np.savez(tmp_path / "direction_a_smiling_face.npz", s=d + 1)
    out = _resolve_zoo_resume(str(tmp_path), prompts)
    assert out[0].max() == 1.0 and out[1] is None
    # single file: shared by every prompt
    np.savez(tmp_path / "one.npz", s=d + 2)
    out = _resolve_zoo_resume(str(tmp_path / "one.npz"), prompts)
    assert len(out) == 2 and out[0].max() == 2.0 and out[1].max() == 2.0
    # directory with no matches → None (fresh init for every prompt)
    (tmp_path / "empty").mkdir()
    assert _resolve_zoo_resume(str(tmp_path / "empty"), prompts) is None


def test_best_zoo_mesh_selection():
    """Mesh picker: largest prompt axis first, leftovers become batch DP
    when the batch divides; falls back to 1-axis prompt sharding; None on
    a single device."""
    from stylemc_tpu.parallel.mesh import best_zoo_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    devs = jax.devices()[:8]
    m = best_zoo_mesh(2, 4, devices=devs)      # 2 prompts, batch 4
    assert dict(m.shape) == {"prompt": 2, "data": 4}
    m = best_zoo_mesh(8, 4, devices=devs)      # enough prompts: all-task
    assert m.axis_names == ("data",) and m.devices.size == 8
    m = best_zoo_mesh(4, 2, devices=devs)      # 4 prompts x 2-way DP
    assert dict(m.shape) == {"prompt": 4, "data": 2}
    m = best_zoo_mesh(3, 5, devices=devs[:4])  # nothing divides: 3 over 3
    assert m.axis_names == ("data",) and m.devices.size == 3
    assert best_zoo_mesh(4, 4, devices=devs[:1]) is None


def test_direction_engine_optimize_batch_zoo_mesh_2d(setup):
    """2-axis ('prompt', 'data') mesh: prompts shard over 'prompt' AND each
    prompt's image batch shards over 'data' (zoo task-parallelism composed
    with per-prompt DP — the full-pod deployment shape). Must agree with the
    unsharded vmapped path at the domain level (sharding changes XLA
    reduction partitioning; same noise class as the 1-axis test)."""
    gen_cfg, gen_params, clip_models, arcface, styles = setup
    from stylemc_tpu.train.find_direction import DirectionEngine
    from stylemc_tpu.parallel.mesh import zoo_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    fdc = FindDirectionConfig(resolution=32, batch_size=4, n_epochs=1,
                              learning_rate=0.5, clip_type="small",
                              arcface_layout=TINY_ARCFACE_LAYOUT,
                              text_prompt="a smiling face",
                              negative_text_prompt="a face")
    eng = DirectionEngine(gen_params, gen_cfg, styles, clip_models, arcface,
                          fdc, tokenizer=FallbackTokenizer())
    prompts = ["a smiling face", "an old face"]
    mesh = zoo_mesh(2)  # 2 prompt shards x 4 data shards over 8 CPU devices
    assert dict(mesh.shape) == {"prompt": 2, "data": 4}
    d_mesh, info = eng.optimize_batch(prompts, mesh=mesh)
    # outputs stay prompt-sharded end to end
    assert np.isfinite(info["history"]).all()
    d_plain, _ = eng.optimize_batch(prompts)
    cos = _direction_cosines(np.asarray(d_mesh), np.asarray(d_plain))
    assert (cos > 0.9999).all(), cos
    norms_m = np.linalg.norm(np.asarray(d_mesh).reshape(2, -1), axis=1)
    norms_p = np.linalg.norm(np.asarray(d_plain).reshape(2, -1), axis=1)
    np.testing.assert_allclose(norms_m, norms_p, rtol=1e-3)


@pytest.mark.slow
def test_find_direction_landmarks_in_graph(setup):
    """The in-graph differentiable landmarks loss runs end-to-end: the term
    appears in aux with a nonzero value once the edit moves the landmarks,
    the run stays finite, and the trained direction differs from the
    logging-only run (i.e. the term really contributes gradient). The stub
    landmarker has no MTCNN — every face falls back to the full-frame box,
    which is exactly the undetected-face path."""
    import types

    from stylemc_tpu.models.mobilenet import init_mobilenet_gdconv_params

    gen_cfg, gen_params, clip_models, arcface, styles = setup
    landmarker = types.SimpleNamespace(
        mtcnn=None,
        _params=init_mobilenet_gdconv_params(jax.random.PRNGKey(3)))

    aux_seen = {}

    def cb(it, loss, aux, lr, gn, direction):
        aux_seen.update(aux)

    fdc = _fdc(clip_type="small", landmarks_in_graph=True,
               landmarks_loss_coef=100.0, n_epochs=4)
    d_lm, info = find_direction(gen_params, gen_cfg, styles[:4], clip_models,
                                arcface, fdc, tokenizer=FallbackTokenizer(),
                                landmarker=landmarker, callback=cb)
    assert np.isfinite(info["history"]).all()
    assert "landmarks_loss" in aux_seen
    assert np.isfinite(aux_seen["landmarks_loss"])

    fdc0 = _fdc(clip_type="small", landmarks_loss_coef=0.0, n_epochs=4)
    d_base, _ = find_direction(gen_params, gen_cfg, styles[:4], clip_models,
                               arcface, fdc0, tokenizer=FallbackTokenizer())
    assert np.abs(np.asarray(d_lm) - np.asarray(d_base)).max() > 1e-6


@pytest.mark.slow
def test_latent_mapper_landmarks_in_graph(setup):
    import types

    from stylemc_tpu.models.mobilenet import init_mobilenet_gdconv_params

    gen_cfg, gen_params, clip_models, arcface, styles = setup
    landmarker = types.SimpleNamespace(
        mtcnn=None,
        _params=init_mobilenet_gdconv_params(jax.random.PRNGKey(4)))
    mtc = MapperTrainConfig(
        resolution=32, batch_size=4, n_epochs=1, learning_rate=0.05,
        clip_type="small", arcface_layout=TINY_ARCFACE_LAYOUT,
        landmarks_in_graph=True, landmarks_loss_coef=10.0)
    mp, info = train_latent_mapper(gen_params, gen_cfg, styles[:4],
                                   clip_models, arcface, mtc,
                                   tokenizer=FallbackTokenizer(),
                                   landmarker=landmarker)
    assert np.isfinite(info["history"]).all()


def test_jit_graph_caches_reused_across_calls(setup):
    """Repeat find_direction calls with identical configs must reuse both
    the precompute forward graphs and the fused step graphs (no retrace:
    the retrace costs tens of seconds at real sizes)."""
    import importlib
    fd = importlib.import_module("stylemc_tpu.train.find_direction")

    gen_cfg, gen_params, clip_models, arcface, styles = setup
    fdc = _fdc(clip_type="small")

    render1 = fd._render_graph(gen_cfg, until_k_for_resolution(32), "const")
    render2 = fd._render_graph(gen_cfg, until_k_for_resolution(32), "const")
    assert render1 is render2
    cfg_small = clip_models["ViT-B/32"][0]
    clip1 = fd._clip_feats_graph(cfg_small, "default", "float32")
    clip2 = fd._clip_feats_graph(cfg_small, "default", "float32")
    assert clip1 is clip2

    bundles = fd.make_clip_bundles(fdc, clip_models,
                                   tokenizer=FallbackTokenizer())
    g1 = fd._fused_step_graphs(gen_cfg, fdc, bundles, False)
    g2 = fd._fused_step_graphs(gen_cfg, fdc, bundles, False)
    assert g1 is g2

    d1, _ = find_direction(gen_params, gen_cfg, styles[:4], clip_models,
                           arcface, fdc, tokenizer=FallbackTokenizer())
    d2, _ = find_direction(gen_params, gen_cfg, styles[:4], clip_models,
                           arcface, fdc, tokenizer=FallbackTokenizer())
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
