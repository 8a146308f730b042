"""Metrics suite tests: score math against known properties, feature stats,
registry wiring with a tiny detector, Inception graph shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.metrics import (
    MetricOptions, calc_metric, is_valid_metric, list_valid_metrics,
    FeatureStats, fid_from_stats, kid_from_features,
    inception_score_from_probs, precision_recall_from_features,
    compute_ppl, slerp,
)
from stylemc_tpu.metrics.inception import (
    init_inception_params, inception_features,
)
from stylemc_tpu.losses.lpips import init_lpips_params
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params,
)

RNG = np.random.RandomState(0)


# ---------------------------------------------------------------- stats

def test_feature_stats_mean_cov():
    stats = FeatureStats(capture_mean_cov=True, capture_all=True)
    x = RNG.randn(500, 8).astype(np.float32)
    for lo in range(0, 500, 100):
        stats.append(x[lo:lo + 100])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-4)
    np.testing.assert_allclose(stats.get_all(), x)


def test_feature_stats_max_items():
    stats = FeatureStats(capture_all=True, max_items=7)
    stats.append(RNG.randn(5, 4))
    stats.append(RNG.randn(5, 4))
    assert stats.num_items == 7
    assert stats.is_full()
    assert stats.get_all().shape == (7, 4)


# ---------------------------------------------------------------- scores

def test_fid_zero_for_identical():
    mu = RNG.randn(16)
    a = RNG.randn(64, 16)
    sigma = np.cov(a.T)
    assert abs(fid_from_stats(mu, sigma, mu, sigma)) < 1e-6


def test_fid_positive_for_shifted():
    a = RNG.randn(500, 8)
    b = a + 3.0
    fid = fid_from_stats(a.mean(0), np.cov(a.T, bias=True),
                         b.mean(0), np.cov(b.T, bias=True))
    assert fid > 50  # ~ 8 * 9


def test_kid_near_zero_for_same_distribution():
    a = RNG.randn(400, 16)
    b = RNG.randn(400, 16)
    kid_same = kid_from_features(a, b, num_subsets=10, max_subset_size=100)
    kid_diff = kid_from_features(a, b + 2.0, num_subsets=10,
                                 max_subset_size=100)
    assert abs(kid_same) < 0.5
    assert kid_diff > kid_same + 1.0


def test_inception_score_uniform_vs_peaked():
    n, c = 200, 10
    uniform = np.full((n, c), 1.0 / c)
    mean_u, _ = inception_score_from_probs(uniform, num_splits=4)
    assert abs(mean_u - 1.0) < 1e-3
    peaked = np.eye(c)[RNG.randint(0, c, n)] * 0.99 + 0.001
    peaked /= peaked.sum(1, keepdims=True)
    mean_p, _ = inception_score_from_probs(peaked, num_splits=4)
    assert mean_p > 5.0


def test_precision_recall_identical_distributions():
    a = RNG.randn(300, 8).astype(np.float32)
    b = RNG.randn(300, 8).astype(np.float32)
    p, r = precision_recall_from_features(a, b, nhood_size=3,
                                          row_batch_size=128,
                                          col_batch_size=128)
    assert p > 0.85 and r > 0.85
    # disjoint distributions → low precision/recall
    p2, r2 = precision_recall_from_features(a, b + 50.0, nhood_size=3)
    assert p2 < 0.05 and r2 < 0.05


def test_slerp_endpoints():
    # like the reference, slerp normalizes: endpoints are a/|a| and b/|b|
    a = jnp.asarray(RNG.randn(4, 16).astype(np.float32))
    b = jnp.asarray(RNG.randn(4, 16).astype(np.float32))
    a_n = np.asarray(a) / np.linalg.norm(a, axis=-1, keepdims=True)
    b_n = np.asarray(b) / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), a_n,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), b_n,
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- ppl

def test_compute_ppl_smooth_generator():
    lpips = init_lpips_params(jax.random.PRNGKey(0), "vgg")

    def mapping_fn(gp, z):
        return jnp.repeat(z[:, None, :], 4, axis=1)

    def synthesis_fn(gp, ws):
        # smooth "generator": broadcast w into an image
        w = ws[:, 0, :48]
        return jnp.tanh(w.reshape(-1, 3, 4, 4)).repeat(16, 2).repeat(16, 3)

    ppl = compute_ppl(mapping_fn, synthesis_fn, lpips, z_dim=48,
                      num_samples=32, batch_size=8, space="w",
                      sampling="end")
    assert np.isfinite(ppl)
    assert ppl >= 0


# -------------------------------------------------------------- registry

def test_registry_names():
    for name in ("fid50k_full", "kid50k_full", "pr50k3_full", "ppl2_wend",
                 "is50k", "fid50k", "kid50k", "pr50k3"):
        assert is_valid_metric(name)
    assert not is_valid_metric("nope")


@pytest.fixture(scope="module")
def tiny_metric_opts():
    cfg = GeneratorConfig(img_resolution=32, channel_base=512, channel_max=32,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)

    key = jax.random.PRNGKey(1)
    proj = jax.random.normal(key, (32 * 32 * 3, 16)) * 0.02

    def feature_fn(imgs_u8):
        x = jnp.asarray(imgs_u8, jnp.float32).reshape(imgs_u8.shape[0], -1)
        return x @ proj

    def probs_fn(imgs_u8):
        return jax.nn.softmax(feature_fn(imgs_u8), axis=-1)

    def dataset_features_fn(opts, max_items):
        from stylemc_tpu.metrics import FeatureStats
        stats = FeatureStats(capture_all=True, capture_mean_cov=True,
                             max_items=64)
        rng = np.random.RandomState(0)
        while not stats.is_full():
            imgs = rng.randint(0, 255, (16, 32, 32, 3), np.uint8)
            stats.append(np.asarray(feature_fn(imgs)))
        return stats

    return MetricOptions(
        gen_params=params, gen_cfg=cfg,
        inception_features_fn=feature_fn, inception_probs_fn=probs_fn,
        dataset_features_fn=dataset_features_fn,
        lpips_params=init_lpips_params(jax.random.PRNGKey(2), "vgg"),
        num_gen=32, batch_size=16)


def test_calc_metric_fid(tiny_metric_opts):
    out = calc_metric("fid50k_full", opts=tiny_metric_opts)
    assert "fid50k_full" in out.results
    assert np.isfinite(out.results.fid50k_full)
    assert out.total_time >= 0


def test_calc_metric_kid_is(tiny_metric_opts):
    out = calc_metric("kid50k_full", opts=tiny_metric_opts)
    assert np.isfinite(out.results.kid50k_full)
    out = calc_metric("is50k", opts=tiny_metric_opts)
    assert np.isfinite(out.results.is50k_mean)


def test_calc_metric_pr(tiny_metric_opts):
    out = calc_metric("pr50k3_full", opts=tiny_metric_opts)
    assert 0 <= out.results.pr50k3_full_precision <= 1
    assert 0 <= out.results.pr50k3_full_recall <= 1


# -------------------------------------------------------------- inception

@pytest.mark.slow
def test_inception_feature_shapes():
    params = init_inception_params(jax.random.PRNGKey(0))
    imgs = np.random.RandomState(0).randint(0, 255, (2, 75, 75, 3), np.uint8)
    feats = inception_features(params, jnp.asarray(imgs))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    probs = inception_features(params, jnp.asarray(imgs), return_logits=True)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_avgpool_count_include_pad_vs_torch():
    """The fid2015 variant's TF 'SAME' average pooling (divide by valid tap
    count) must match torch avg_pool2d(count_include_pad=False), and the
    Mixed_7c max-pool branch must match max_pool2d(3,1,1)."""
    import torch
    import torch.nn.functional as F
    from stylemc_tpu.metrics.inception import _avgpool3, _maxpool3s1

    x = np.random.RandomState(0).randn(2, 3, 9, 9).astype(np.float32)
    want = F.avg_pool2d(torch.from_numpy(x), kernel_size=3, stride=1,
                        padding=1, count_include_pad=False).numpy()
    got = np.asarray(_avgpool3(jnp.asarray(x), count_include_pad=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    want_inc = F.avg_pool2d(torch.from_numpy(x), kernel_size=3, stride=1,
                            padding=1, count_include_pad=True).numpy()
    got_inc = np.asarray(_avgpool3(jnp.asarray(x), count_include_pad=True))
    np.testing.assert_allclose(got_inc, want_inc, rtol=1e-6, atol=1e-6)

    want_max = F.max_pool2d(torch.from_numpy(x), kernel_size=3, stride=1,
                            padding=1).numpy()
    got_max = np.asarray(_maxpool3s1(jnp.asarray(x)))
    np.testing.assert_allclose(got_max, want_max, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_inception_variants_differ():
    """fid2015 and tv must produce different features from the same params
    (the pooling quirks are real), and both must be selectable."""
    params = init_inception_params(jax.random.PRNGKey(0))
    imgs = np.random.RandomState(1).randint(0, 255, (1, 75, 75, 3), np.uint8)
    f_fid = np.asarray(inception_features(params, jnp.asarray(imgs),
                                          variant="fid2015"))
    f_tv = np.asarray(inception_features(params, jnp.asarray(imgs),
                                         variant="tv"))
    assert f_fid.shape == f_tv.shape == (1, 2048)
    assert not np.allclose(f_fid, f_tv)
    with pytest.raises(AssertionError):
        inception_features(params, jnp.asarray(imgs), variant="nope")


# ------------------------------------------------------ data-parallel mesh

def test_generator_features_mesh_matches_single(tiny_metric_opts):
    """compute_generator_features over an 8-device 'data' mesh: identical
    features to the single-device run (same z stream; pure batch DP), and
    the detector jit genuinely receives batch-sharded device arrays."""
    import dataclasses

    from stylemc_tpu.metrics.metric_main import compute_generator_features
    from stylemc_tpu.parallel.mesh import data_mesh

    seen_shardings = []
    base_fn = tiny_metric_opts.inception_features_fn

    def recording_fn(imgs):
        seen_shardings.append(getattr(imgs, "sharding", None))
        return base_fn(imgs)

    single = compute_generator_features(
        tiny_metric_opts, base_fn, 32, capture_all=True)

    mesh = data_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    opts_dp = dataclasses.replace(tiny_metric_opts, mesh=mesh,
                                  batch_size=16)
    sharded = compute_generator_features(
        opts_dp, recording_fn, 32, capture_all=True)

    np.testing.assert_allclose(sharded.get_all(), single.get_all(),
                               rtol=1e-4, atol=1e-4)
    from jax.sharding import PartitionSpec as P
    assert seen_shardings and all(s is not None for s in seen_shardings)
    assert any(s.spec == P("data") for s in seen_shardings), seen_shardings


def test_calc_metric_fid_mesh(tiny_metric_opts):
    import dataclasses

    from stylemc_tpu.parallel.mesh import data_mesh

    out1 = calc_metric("fid50k_full", opts=tiny_metric_opts)
    opts_dp = dataclasses.replace(tiny_metric_opts, mesh=data_mesh())
    out2 = calc_metric("fid50k_full", opts=opts_dp)
    np.testing.assert_allclose(out2.results.fid50k_full,
                               out1.results.fid50k_full, rtol=1e-3,
                               atol=1e-4)


def test_compute_ppl_mesh_matches_single():
    from stylemc_tpu.parallel.mesh import data_mesh

    lpips = init_lpips_params(jax.random.PRNGKey(0), "vgg")

    def mapping_fn(gp, z):
        return jnp.repeat(z[:, None, :], 4, axis=1)

    def synthesis_fn(gp, ws):
        w = ws[:, 0, :48]
        return jnp.tanh(w.reshape(-1, 3, 4, 4)).repeat(16, 2).repeat(16, 3)

    kw = dict(z_dim=48, num_samples=16, batch_size=8, space="w",
              sampling="end")
    single = compute_ppl(mapping_fn, synthesis_fn, lpips, **kw)
    sharded = compute_ppl(mapping_fn, synthesis_fn, lpips, mesh=data_mesh(),
                          **kw)
    np.testing.assert_allclose(sharded, single, rtol=1e-3)
