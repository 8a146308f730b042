"""Distributed training-stat collection.

Behavioral contract: /root/reference/torch_utils/training_stats.py:56-256 —
report scalar stats as (count, sum, sum-of-squares) moment triples, reduce
across processes in ONE collective, expose mean/std via a Collector.

TPU-native: moments accumulate as a jnp [3]-vector per stat; cross-device
reduction is a jax.lax.psum inside the caller's jit graph (use
`reduce_moments` under shard_map/pjit) or a host-level allreduce via
jax.experimental.multihost_utils for out-of-graph sync.
"""

from __future__ import annotations

import collections
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_counters: Dict[str, np.ndarray] = collections.defaultdict(
    lambda: np.zeros(3, np.float64))


def moments(value) -> jnp.ndarray:
    """[count, sum, sum_sq] of a tensor — jit-safe."""
    v = jnp.asarray(value, jnp.float32).reshape(-1)
    return jnp.stack([jnp.asarray(v.size, jnp.float32),
                      jnp.sum(v), jnp.sum(jnp.square(v))])


def reduce_moments(m, axis_name: str):
    """In-graph cross-device reduction (inside shard_map/pmap)."""
    return jax.lax.psum(m, axis_name)


def report(name: str, value) -> None:
    """Host-side accumulation (reference report, training_stats.py:56)."""
    m = np.asarray(moments(value), np.float64)
    _counters[name] += m


def report0(name: str, value) -> None:
    """Report only on process 0 (reference :102)."""
    if jax.process_index() == 0:
        report(name, value)


class Collector:
    """Mean/std view over accumulated stats (reference Collector, :113)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self, cross_process: bool = False):
        if not self._keep_previous:
            self._moments.clear()
        for name in self.names():
            m = _counters[name].copy()
            _counters[name][:] = 0
            if cross_process and jax.process_count() > 1:
                from jax.experimental import multihost_utils
                m = np.asarray(multihost_utils.process_allgather(
                    jnp.asarray(m))).sum(axis=0)
            if name in self._moments:
                self._moments[name] += m
            else:
                self._moments[name] = m

    def num(self, name: str) -> int:
        return int(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self):
        return {n: {"num": self.num(n), "mean": self.mean(n),
                    "std": self.std(n)} for n in self._moments}
