"""Multi-host code paths — REAL multi-process validation.

`test_two_process_distributed` launches two actual subprocesses that join
a jax.distributed coordination service on 127.0.0.1 (4 virtual CPU
devices each → one 8-device GLOBAL mesh, gloo cross-process collectives)
and validates, with no mocks:

  a) a DP find_direction training step sharded over the global mesh
     equals the single-device full-batch step,
  b) FeatureStats.append_multihost with a real cross-process
     process_allgather,
  c) stats.Collector(cross_process=True) reducing disjoint per-process
     reports to the global moments,

superseding the round-2 monkeypatched simulations. Two local processes
with jax.distributed.initialize form a legitimate multi-process JAX
runtime on one machine — the collective semantics over gloo here and over
DCN/ICI on a real pod are identical. Reference contracts:
metrics/metric_utils.py:95-105 (rank-strided feature gather) and
torch_utils/training_stats.py:234-256 (one-collective stat sync).

The single-process tests below pin the degenerate-case semantics
(append_multihost == append under one process; report0 gating; the psum
moment-reduction contract under shard_map).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stylemc_tpu.metrics.feature_stats import FeatureStats
from stylemc_tpu.parallel import stats as pstats
from stylemc_tpu.parallel.mesh import initialize_distributed

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    """Two real processes, one 8-device global mesh, zero mocks."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(_HERE), env.get("PYTHONPATH", "")])
    worker = os.path.join(_HERE, "multiprocess_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {i} rc={p.returncode}\n{out[-4000:]}"
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            res = json.load(f)
        assert res["ok"], res
        assert res["n_global"] == 8 and res["n_local"] == 4, res
        assert res["process_index"] == i, res
        assert res["dp_step_matches_single_device"], res
        assert res["append_multihost_real_allgather"], res
        assert res["collector_cross_process_real"], res
    # the replicated DP outputs must agree EXACTLY across processes —
    # both hold the same collective's result
    with open(tmp_path / "result_0.json") as f0, \
            open(tmp_path / "result_1.json") as f1:
        r0, r1 = json.load(f0), json.load(f1)
    np.testing.assert_allclose(r0["dp_loss"], r1["dp_loss"], rtol=1e-7)
    np.testing.assert_allclose(r0["dp_delta_norm"], r1["dp_delta_norm"],
                               rtol=1e-12)
    np.testing.assert_allclose(r0["dp_delta_checksum"],
                               r1["dp_delta_checksum"], rtol=1e-12)


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
