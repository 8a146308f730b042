"""Regression tests for the driver entry points in __graft_entry__.py.

VERDICT round 1 item 1: dryrun_multichip must pin the CPU platform before
any JAX computation so a faulted default (TPU) backend can never kill the
CPU-mesh sharding check. conftest.py already pins CPU with 8 virtual
devices, so here we simply assert the full training step runs green on the
8-device mesh.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    assert len(jax.devices("cpu")) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2_devices():
    # fast-suite smoke covers the original three sharding modes; the
    # coach-DP + mesh-metrics modes (4, 5) compile minutes of extra graphs
    # and are covered by the slow 8-device test + the driver run
    __graft_entry__.dryrun_multichip(2, max_mode=3)
