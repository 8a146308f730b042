"""Metric registry + driver.

Behavioral contract: /root/reference/metrics/metric_main.py:26-152 —
register_metric / is_valid_metric / calc_metric returning an EasyDict with
results, total_time, and the canonical registered names (fid50k_full,
kid50k_full, pr50k3_full, ppl2_wend, is50k + legacy variants).

Feature plumbing (metric_utils equivalents) is dependency-injected through
`MetricOptions`: the caller supplies the generator bundle, a dataset-feature
callable, and detector params — keeping every metric testable without the
real Inception weights.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..io.pickle_loader import EasyDict
from .feature_stats import FeatureStats
from .scores import (fid_from_stats, kid_from_features,
                     inception_score_from_probs,
                     precision_recall_from_features)

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict.keys())


@dataclasses.dataclass
class MetricOptions:
    """Everything a metric needs (reference MetricOptions,
    metric_utils.py:21-35, TPU-shaped)."""
    # generator bundle
    gen_params: Any = None
    gen_cfg: Any = None
    # feature detectors
    inception_features_fn: Optional[Callable] = None   # imgs_u8 → [N, 2048]
    inception_probs_fn: Optional[Callable] = None      # imgs_u8 → [N, P]
    lpips_params: Any = None                           # vgg lpips bundle
    # dataset side
    dataset_features_fn: Optional[Callable] = None     # (opts, max_items) → FeatureStats
    dataset_probs_fn: Optional[Callable] = None
    # run config
    num_gen: int = 50000
    batch_size: int = 16
    seed: int = 0
    progress_fn: Optional[Callable] = None
    # data-parallel feature extraction: a 1-axis ('data',) jax Mesh. The
    # generator batch shards over it (zero collectives — pure batch DP, the
    # TPU-native equivalent of the reference's rank-strided feature loops,
    # metric_utils.py:214,257-271), and the detector inherits the sharding
    # because images stay on device between the two jits. batch_size must
    # be divisible by the mesh size.
    mesh: Any = None


def _gen_images(opts: MetricOptions, n: int):
    """Yield uint8 HWC batches from the generator.

    Batches are DEVICE arrays (not numpy): with `opts.mesh` set they are
    sharded over the 'data' axis, and the downstream detector jit inherits
    that sharding from its input — generator + detector both run
    data-parallel with no host round-trip in between."""
    import jax
    from ..edit import to_u8_nhwc
    from ..models.stylegan2.generator import mapping, w_to_s, synthesis

    def run(gp, z):
        # generator weights as a jit ARGUMENT (closure'd weights embed as
        # HLO literals — fatal for remote-compile toolchains)
        ws = mapping(gp, opts.gen_cfg, z)
        s = w_to_s(gp, opts.gen_cfg, ws)
        return to_u8_nhwc(synthesis(gp, opts.gen_cfg, s))

    if opts.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = opts.mesh.devices.size
        assert opts.batch_size % n_dev == 0, \
            f"batch_size {opts.batch_size} must divide over {n_dev} devices"
        run = jax.jit(run,
                      in_shardings=(NamedSharding(opts.mesh, P()),
                                    NamedSharding(opts.mesh, P("data"))),
                      out_shardings=NamedSharding(opts.mesh, P("data")))
    else:
        run = jax.jit(run)

    rng = jax.random.PRNGKey(opts.seed)
    done = 0
    while done < n:
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, (opts.batch_size, opts.gen_cfg.z_dim))
        imgs = run(opts.gen_params, z)
        take = min(opts.batch_size, n - done)
        done += take
        if opts.progress_fn:
            opts.progress_fn(done, n)
        yield imgs if take == opts.batch_size else imgs[:take]


def compute_generator_features(opts: MetricOptions, feature_fn, n: int,
                               **stats_kwargs) -> FeatureStats:
    stats = FeatureStats(max_items=n, **stats_kwargs)
    for imgs in _gen_images(opts, n):
        stats.append_multihost(np.asarray(feature_fn(imgs)))
        if stats.is_full():
            break
    return stats


def calc_metric(metric: str, **kwargs) -> EasyDict:
    """reference metric_main.py:39-63."""
    assert is_valid_metric(metric), f"unknown metric {metric}"
    opts = kwargs.pop("opts", None) or MetricOptions(**kwargs)
    start = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - start
    return EasyDict(
        results=EasyDict(results),
        metric=metric,
        total_time=total_time,
        total_time_str=f"{int(total_time // 60)}m {total_time % 60:.0f}s",
    )


# ------------------------------------------------------- registered metrics
# (reference metric_main.py:82-152)


def _fid(opts: MetricOptions, max_real, num_gen):
    real = opts.dataset_features_fn(opts, max_real)
    gen = compute_generator_features(opts, opts.inception_features_fn,
                                     num_gen, capture_mean_cov=True)
    mu_r, sig_r = real.get_mean_cov()
    mu_g, sig_g = gen.get_mean_cov()
    return fid_from_stats(mu_g, sig_g, mu_r, sig_r)


def _kid(opts: MetricOptions, max_real, num_gen, num_subsets=100,
         max_subset_size=1000):
    real = opts.dataset_features_fn(opts, max_real)
    gen = compute_generator_features(opts, opts.inception_features_fn,
                                     num_gen, capture_all=True)
    return kid_from_features(real.get_all(), gen.get_all(),
                             num_subsets, max_subset_size)


@register_metric
def fid50k_full(opts):
    return {"fid50k_full": _fid(opts, max_real=None, num_gen=opts.num_gen)}


@register_metric
def kid50k_full(opts):
    return {"kid50k_full": _kid(opts, max_real=1000000, num_gen=opts.num_gen)}


@register_metric
def pr50k3_full(opts):
    real = opts.dataset_features_fn(opts, 200000)
    gen = compute_generator_features(opts, opts.inception_features_fn,
                                     opts.num_gen, capture_all=True)
    precision, recall = precision_recall_from_features(
        real.get_all(), gen.get_all(), nhood_size=3)
    return {"pr50k3_full_precision": precision,
            "pr50k3_full_recall": recall}


@register_metric
def is50k(opts):
    gen = compute_generator_features(opts, opts.inception_probs_fn,
                                     opts.num_gen, capture_all=True)
    mean, std = inception_score_from_probs(gen.get_all(), num_splits=10)
    return {"is50k_mean": mean, "is50k_std": std}


@register_metric
def ppl2_wend(opts):
    import jax.numpy as jnp
    from ..models.stylegan2.generator import mapping, w_to_s, synthesis
    from .ppl import compute_ppl

    def mapping_fn(gp, z):
        return mapping(gp, opts.gen_cfg, z)

    def synthesis_fn(gp, ws):
        s = w_to_s(gp, opts.gen_cfg, ws)
        return synthesis(gp, opts.gen_cfg, s)

    ppl = compute_ppl(mapping_fn, synthesis_fn, opts.lpips_params,
                      opts.gen_cfg.z_dim, num_samples=opts.num_gen,
                      epsilon=1e-4, space="w", sampling="end", crop=False,
                      batch_size=opts.batch_size, seed=opts.seed,
                      gen_params=opts.gen_params, mesh=opts.mesh)
    return {"ppl2_wend": ppl}


# legacy variants (reference metric_main.py:110-148)


@register_metric
def fid50k(opts):
    return {"fid50k": _fid(opts, max_real=50000, num_gen=opts.num_gen)}


@register_metric
def kid50k(opts):
    return {"kid50k": _kid(opts, max_real=50000, num_gen=opts.num_gen)}


@register_metric
def pr50k3(opts):
    real = opts.dataset_features_fn(opts, 50000)
    gen = compute_generator_features(opts, opts.inception_features_fn,
                                     opts.num_gen, capture_all=True)
    precision, recall = precision_recall_from_features(
        real.get_all(), gen.get_all(), nhood_size=3)
    return {"pr50k3_precision": precision, "pr50k3_recall": recall}
