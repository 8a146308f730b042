"""Device mesh / sharding helpers — the comm layer (SURVEY.md §2e/§5).

The reference has no reachable multi-device path (single hardcoded CUDA
device everywhere; its torch.distributed primitives are vestigial). Here
data parallelism is first-class: a 1-axis 'data' mesh over local devices,
NamedSharding for batch axes, and XLA-inserted collectives. Multi-host
extends the same mesh over jax.process_count() via jax.distributed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(max_size: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-axis ('data',) mesh over (a divisor-truncated set of) devices.

    max_size: cap the mesh at the largest device count that divides the
    batch (e.g. batch 4 on 8 chips → 4-device mesh)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if max_size is not None:
        while n > 1 and (max_size % n != 0):
            n -= 1
        n = min(n, max_size) if max_size >= 1 else n
        while n > 1 and max_size % n != 0:
            n -= 1
    return Mesh(np.array(devices[:n]), axis_names=("data",))


def zoo_mesh(n_prompt: int, devices: Optional[Sequence] = None) -> Mesh:
    """2-axis ('prompt', 'data') mesh for direction-zoo training.

    Prompts are independent tasks (zero cross-prompt collectives), so the
    'prompt' axis is pure task parallelism over ICI; within each prompt
    group the per-prompt image batch shards over 'data' with XLA-inserted
    grad psums — `DirectionEngine.optimize_batch` composes both. n_prompt
    must divide the device count; the remainder becomes the 'data' axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % n_prompt == 0, (n, n_prompt)
    grid = np.array(devices).reshape(n_prompt, n // n_prompt)
    return Mesh(grid, axis_names=("prompt", "data"))


def best_zoo_mesh(n_prompts: int, batch_size: int,
                  devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Pick the best mesh for direction-zoo training on these devices.

    Prefers the largest 'prompt' axis (task parallelism is collective-free),
    then spends leftover devices on 'data' (per-prompt batch DP) when the
    batch divides evenly. Returns a 2-axis ('prompt','data') mesh, a 1-axis
    ('data',) prompt mesh (legacy optimize_batch sharding) when no data
    split fits, or None when only one device would be used.
    """
    devices = list(devices if devices is not None else jax.devices())
    d = len(devices)
    if d <= 1:
        return None
    for n_p in range(min(n_prompts, d), 0, -1):
        if d % n_p or n_prompts % n_p:
            continue
        n_d = d // n_p
        if n_d == 1:
            return data_mesh(devices=devices[:n_p]) if n_p > 1 else None
        if batch_size % n_d == 0:
            return zoo_mesh(n_p, devices=devices)
    # no (prompt, data) factorization fits — fall back to sharding prompts
    # over the largest divisor-compatible prefix of the devices
    for n_p in range(min(n_prompts, d), 1, -1):
        if n_prompts % n_p == 0:
            return data_mesh(devices=devices[:n_p])
    return None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with the leading axis sharded over the mesh."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (DCN across slices). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
