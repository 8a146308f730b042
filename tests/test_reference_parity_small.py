"""Torch-oracle parity for the small pure-math components.

Extends tests/test_reference_parity.py (kernels/models) with the remaining
"behavioral contract" docstrings that had no live oracle yet:

  (g) losses.w_norm            vs encoder4editing/criteria/w_norm.py:5-14
  (h) losses.landmarks_loss    vs landmarks_loss.py:10-46 (Wing + MSE)
  (i) metrics.ppl.slerp        vs metrics/perceptual_path_length.py:23-32
  (j) models.e4e.editings      vs encoder4editing/editings/{ganspace,sefa}.py
      and latent_editor.py:18-27 (InterFaceGAN arithmetic)
  (k) LatentCodesPool          vs encoder4editing/models/latent_codes_pool.py
      (same stdlib-`random` call sequence → seeded streams must agree)
  (l) parallel.stats Collector vs torch_utils/training_stats.py:56-256
  (m) losses.clip_loss_nada.direction_loss vs clip_loss_nada.py:43-59

Reference editing helpers hardcode `.to('cuda')`/`.cuda()`; a fixture
rewrites those tensor methods to no-ops so the reference math runs on CPU.
"""

import os
import random
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

if REF not in sys.path:
    sys.path.append(REF)


@pytest.fixture
def cpu_cuda(monkeypatch):
    """Make reference `.to('cuda')` / `.cuda()` calls no-ops on CPU."""
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and (args[0] == "cuda" or (
                isinstance(args[0], torch.device) and args[0].type == "cuda")):
            return self
        if kwargs.get("device") == "cuda":
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
            if not args and not kwargs:
                return self
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


# ------------------------------------------------------------- (g) w_norm


def test_w_norm_vs_torch():
    from encoder4editing.criteria.w_norm import WNormLoss

    from stylemc_tpu.losses.w_norm import w_norm_loss

    rng = np.random.RandomState(0)
    latent = rng.randn(3, 14, 512).astype(np.float32)
    avg = rng.randn(14, 512).astype(np.float32)

    want = WNormLoss(start_from_latent_avg=True)(
        torch.from_numpy(latent), torch.from_numpy(avg)).item()
    got = float(w_norm_loss(jnp.asarray(latent), jnp.asarray(avg)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want0 = WNormLoss(start_from_latent_avg=False)(
        torch.from_numpy(latent)).item()
    got0 = float(w_norm_loss(jnp.asarray(latent), None,
                             start_from_latent_avg=False))
    np.testing.assert_allclose(got0, want0, rtol=1e-5)


# --------------------------------------------------------- (h) landmarks


def test_landmarks_and_wing_loss_vs_torch():
    import landmarks_loss as ref_lm

    from stylemc_tpu.losses.landmarks_loss import landmarks_loss, wing_loss

    rng = np.random.RandomState(1)
    lm1 = (rng.rand(2, 68, 2) * 30).astype(np.float32)
    # offsets straddling omega=10 so both Wing branches are exercised
    lm2 = lm1 + rng.choice([0.5, -3.0, 15.0, -20.0],
                           size=lm1.shape).astype(np.float32)

    want_mse = ref_lm.LandmarksLoss()(torch.from_numpy(lm1),
                                      torch.from_numpy(lm2)).item()
    got_mse = float(landmarks_loss(jnp.asarray(lm1), jnp.asarray(lm2)))
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-5)

    want_wing = ref_lm.WingLoss()(torch.from_numpy(lm1),
                                  torch.from_numpy(lm2)).item()
    got_wing = float(wing_loss(jnp.asarray(lm1), jnp.asarray(lm2)))
    np.testing.assert_allclose(got_wing, want_wing, rtol=1e-5)

    # non-default omega/epsilon
    want_w2 = ref_lm.WingLoss(omega=5, epsilon=0.5)(
        torch.from_numpy(lm1), torch.from_numpy(lm2)).item()
    got_w2 = float(wing_loss(jnp.asarray(lm1), jnp.asarray(lm2),
                             omega=5.0, epsilon=0.5))
    np.testing.assert_allclose(got_w2, want_w2, rtol=1e-5)


# ------------------------------------------------------------- (i) slerp


def test_slerp_vs_torch():
    from metrics.perceptual_path_length import slerp as ref_slerp

    from stylemc_tpu.metrics.ppl import slerp

    rng = np.random.RandomState(2)
    a = rng.randn(4, 512).astype(np.float32) * 3.0  # non-unit inputs
    b = rng.randn(4, 512).astype(np.float32)
    for t in (0.0, 0.25, 1.0):
        want = ref_slerp(torch.from_numpy(a), torch.from_numpy(b),
                         torch.tensor(t)).numpy()
        got = np.asarray(slerp(jnp.asarray(a), jnp.asarray(b), t))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                                   rtol=1e-5)


# ---------------------------------------------------------- (j) editings


def test_ganspace_edit_vs_torch(cpu_cuda):
    from encoder4editing.editings import ganspace as ref_gs

    from stylemc_tpu.models.e4e.editings import apply_ganspace

    rng = np.random.RandomState(3)
    latents = rng.randn(2, 16, 512).astype(np.float32)
    n_comp = 8
    pca_np = {"mean": rng.randn(512).astype(np.float32),
              "comp": rng.randn(n_comp, 512).astype(np.float32),
              "std": (rng.rand(n_comp) + 0.5).astype(np.float32)}
    pca_t = {k: torch.from_numpy(v) for k, v in pca_np.items()}
    directions = [(0, 2, 6, 4.0), (5, 0, 16, -2.5)]

    want = ref_gs.edit(torch.from_numpy(latents), pca_t, directions).numpy()
    got = np.asarray(apply_ganspace(jnp.asarray(latents), pca_np, directions))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_interfacegan_arithmetic_vs_torch():
    """latent_editor.py:18-27 (sans rendering): latent + f·direction over a
    factor range, concatenated in factor order."""
    from stylemc_tpu.models.e4e.editings import apply_interfacegan

    rng = np.random.RandomState(4)
    latent = rng.randn(1, 18, 512).astype(np.float32)
    direction = rng.randn(1, 18, 512).astype(np.float32)

    lt, dt = torch.from_numpy(latent), torch.from_numpy(direction)
    want = torch.cat([lt + f * dt for f in range(-2, 3)]).numpy()
    got = np.asarray(apply_interfacegan(jnp.asarray(latent),
                                        jnp.asarray(direction),
                                        factor_range=(-2, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    want1 = (lt + 2.5 * dt).numpy()
    got1 = np.asarray(apply_interfacegan(jnp.asarray(latent),
                                        jnp.asarray(direction), factor=2.5))
    np.testing.assert_allclose(got1, want1, rtol=1e-5, atol=1e-6)


def _rosinality_net_with_our_params(size=32):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_reference_parity import (_seed_rosinality_op_stub,
                                       _seed_torchvision_stub)

    _seed_rosinality_op_stub()
    _seed_torchvision_stub()
    from encoder4editing.models.stylegan2.model import Generator

    from fabricate import ada_to_rosinality_state
    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.stylegan2.generator import init_generator_params

    cfg = config_for_rosinality(size)
    params = init_generator_params(jax.random.PRNGKey(7), cfg)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in ada_to_rosinality_state(cfg, params).items()}
    net = Generator(size, 512, n_mlp=cfg.mapping_layers)
    net.load_state_dict(state, strict=False)
    return net, cfg, params


@pytest.mark.parametrize("layers", ["all", [2, 3, 4, 5], [0, 1, 2]])
def test_sefa_factorize_vs_torch(layers):
    """sefa.py:37-52 — layer selection, column-normalized concat of the
    modulation weights, eigvecs/eigvals of W·Wᵀ — on SHARED weights."""
    from encoder4editing.editings import sefa as ref_sefa

    from stylemc_tpu.models.e4e.editings import sefa_factorize

    net, cfg, params = _rosinality_net_with_our_params()
    arg = layers if layers == "all" else list(layers)
    want_layers, want_vecs, want_vals = ref_sefa.factorize_weight(net, arg)
    got_layers, got_vecs, got_vals = sefa_factorize(params, arg)

    assert list(got_layers) == list(want_layers)
    np.testing.assert_allclose(got_vals, want_vals, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_vecs, want_vecs, rtol=1e-3, atol=1e-4)


def test_sefa_edit_vs_torch(cpu_cuda):
    from encoder4editing.editings import sefa as ref_sefa

    from stylemc_tpu.models.e4e.editings import apply_sefa

    net, cfg, params = _rosinality_net_with_our_params()
    rng = np.random.RandomState(5)
    n_latent = net.n_latent
    latents = rng.randn(1, n_latent, 512).astype(np.float32)

    indices = [2, 3, 4, 5]
    want = ref_sefa.edit(net, torch.from_numpy(latents), indices,
                         semantics=2, start_distance=-6.0, end_distance=6.0,
                         step=5).numpy()
    got = np.asarray(apply_sefa(params, latents, indices=indices,
                                semantics=2, start_distance=-6.0,
                                end_distance=6.0, step=5))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------ (k) latent pool


@pytest.mark.parametrize("shape", [(4, 512), (4, 6, 512)])
def test_latent_codes_pool_vs_torch(shape):
    """Both pools make the same stdlib-`random` calls in the same order, so
    identically-seeded streams must produce identical outputs and state."""
    from encoder4editing.models.latent_codes_pool import (
        LatentCodesPool as RefPool)

    from stylemc_tpu.models.e4e.discriminator import LatentCodesPool

    rng = np.random.RandomState(6)
    batches = [rng.randn(*shape).astype(np.float32) for _ in range(6)]

    random.seed(123)
    ref_pool = RefPool(pool_size=8)
    want = [ref_pool.query(torch.from_numpy(b)).numpy() for b in batches]

    random.seed(123)
    pool = LatentCodesPool(pool_size=8)
    got = [np.asarray(pool.query(b)) for b in batches]

    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0, atol=0)

    # pool_size=0 passthrough (latent_codes_pool.py:32-33)
    assert np.array_equal(np.asarray(LatentCodesPool(0).query(batches[0])),
                          batches[0])


# ------------------------------------------------------- (l) training stats


def test_training_stats_collector_vs_torch():
    from torch_utils import training_stats as ref_ts

    from stylemc_tpu.parallel import stats

    rng = np.random.RandomState(7)
    values = [rng.randn(13).astype(np.float32) for _ in range(4)]
    scalar = 2.5

    ref_collector = ref_ts.Collector(regex="parity/.*")
    for v in values:
        ref_ts.report("parity/vec", torch.from_numpy(v))
    ref_ts.report("parity/scalar", scalar)
    ref_collector.update()

    collector = stats.Collector(regex="parity/.*")
    for v in values:
        stats.report("parity/vec", v)
    stats.report("parity/scalar", scalar)
    collector.update()

    assert collector.num("parity/vec") == ref_collector.num("parity/vec")
    np.testing.assert_allclose(collector.mean("parity/vec"),
                               ref_collector.mean("parity/vec"), rtol=1e-5)
    np.testing.assert_allclose(collector.std("parity/vec"),
                               ref_collector.std("parity/vec"), rtol=1e-4)
    np.testing.assert_allclose(collector.mean("parity/scalar"),
                               ref_collector.mean("parity/scalar"), rtol=1e-6)


# --------------------------------------------------- (m) NADA DirectionLoss


def _import_ref_nada():
    """clip_loss_nada.py imports the `clip` pip package (not installable
    here) and torchvision at module scope; DirectionLoss needs neither, so
    stub both before import."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_reference_parity import _seed_torchvision_stub

    _seed_torchvision_stub()
    if "clip" not in sys.modules:
        stub = types.ModuleType("clip")
        stub.load = None
        stub.tokenize = None
        sys.modules["clip"] = stub
    import clip_loss_nada as ref_nada
    return ref_nada


@pytest.mark.parametrize("loss_type", ["cosine", "mse", "mae"])
def test_nada_direction_loss_vs_torch(loss_type):
    ref_nada = _import_ref_nada()

    from stylemc_tpu.losses.clip_loss_nada import direction_loss

    rng = np.random.RandomState(8)
    x = rng.randn(5, 512).astype(np.float32)
    y = rng.randn(5, 512).astype(np.float32)

    ref_loss = ref_nada.DirectionLoss(loss_type)
    want = ref_loss(torch.from_numpy(x), torch.from_numpy(y))
    want = want.mean().item()  # callers .mean() the cosine variant's [N]
    got = float(direction_loss(jnp.asarray(x), jnp.asarray(y), loss_type))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nada_templates_match_reference():
    ref_nada = _import_ref_nada()

    from stylemc_tpu.losses.clip_loss_nada import (
        compose_text_with_templates, imagenet_templates_small)

    assert imagenet_templates_small == ref_nada.imagenet_templates_small
    assert compose_text_with_templates("cat") == [
        t.format("cat") for t in ref_nada.imagenet_templates_small]
