"""Multi-host code paths (VERDICT item 6).

Single-process validation of the multihost plumbing:
  * FeatureStats.append_multihost — no-op gather under one process; the
    process_allgather branch exercised via a patched process_count
  * stats.Collector(cross_process=True) — allgather-sum reduces to the
    local moments under one process
  * reduce_moments — psum under shard_map equals the sum of per-device
    moments (the one-collective contract of training_stats._sync,
    reference training_stats.py:234-256)

What real multi-host validation would additionally need: N processes
launched with jax.distributed.initialize (parallel/mesh.py
::initialize_distributed) over DCN, where process_allgather crosses host
boundaries — unavailable in this single-host image; the collective
semantics are identical, which is what the shard_map test pins down.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stylemc_tpu.metrics.feature_stats import FeatureStats
from stylemc_tpu.parallel import stats as pstats
from stylemc_tpu.parallel.mesh import initialize_distributed


def test_append_multihost_single_process_matches_append():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 4).astype(np.float32)

    a = FeatureStats(capture_all=True, capture_mean_cov=True)
    a.append(x)
    b = FeatureStats(capture_all=True, capture_mean_cov=True)
    b.append_multihost(x)

    np.testing.assert_allclose(b.get_all(), a.get_all())
    ma, ca = a.get_mean_cov()
    mb, cb = b.get_mean_cov()
    np.testing.assert_allclose(mb, ma)
    np.testing.assert_allclose(cb, ca)


def test_append_multihost_allgather_branch(monkeypatch):
    """Exercise OUR gather-reshape wiring with a simulated 2-process
    allgather (stacked copies, the shape process_allgather returns): the
    appended features must be the row-concatenation of all processes'."""
    from jax.experimental import multihost_utils

    rng = np.random.RandomState(1)
    x = rng.randn(3, 5).astype(np.float32)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda v, **kw: jnp.stack([jnp.asarray(v)] * 2))
    s = FeatureStats(capture_all=True)
    s.append_multihost(x)
    np.testing.assert_allclose(s.get_all(), np.concatenate([x, x]),
                               rtol=1e-6)


def test_collector_cross_process_single_matches_local(monkeypatch):
    """Simulated 2-process sync: moments double in count but mean/std stay
    (every 'process' reported the same values) — the training_stats._sync
    semantics."""
    from jax.experimental import multihost_utils

    pstats._counters.clear()
    rng = np.random.RandomState(2)
    vals = rng.randn(20).astype(np.float32)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda v, **kw: jnp.stack([jnp.asarray(v)] * 2))
    c_cross = pstats.Collector(regex="loss")  # init drains (empty) counters
    for v in vals:
        pstats.report("loss", v)
    c_cross.update(cross_process=True)

    assert c_cross.num("loss") == 2 * len(vals)
    np.testing.assert_allclose(c_cross.mean("loss"), np.mean(vals), rtol=1e-5)
    np.testing.assert_allclose(c_cross.std("loss"), np.std(vals), rtol=1e-4)


def test_reduce_moments_psum_equivalence():
    """psum of per-device moment triples under shard_map == global moments
    of the full array — the single-collective sync contract."""
    n_dev = len(jax.devices())
    assert n_dev >= 8
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    rng = np.random.RandomState(3)
    x = rng.randn(8, 16).astype(np.float32)

    def per_shard(xs):
        m = pstats.moments(xs)
        return pstats.reduce_moments(m, "data")

    out = jax.jit(shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                            out_specs=P()))(jnp.asarray(x))
    want = np.asarray(pstats.moments(x))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_initialize_distributed_single_process_noop():
    # must not raise or call jax.distributed.initialize for <=1 process
    initialize_distributed(num_processes=None)
    initialize_distributed(num_processes=1)


def test_report0_only_on_process_zero(monkeypatch):
    pstats._counters.clear()
    pstats.report0("p0_stat", 1.0)
    assert pstats._counters["p0_stat"][0] == 1
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    pstats.report0("p0_stat", 1.0)
    assert pstats._counters["p0_stat"][0] == 1  # unchanged on rank 1
