"""Fused bias + activation + gain + clamp.

Behavioral contract: /root/reference/torch_utils/ops/bias_act.py:23-33 (the
nine-activation table with per-activation default alpha/gain) and :94-123
(the reference formula: add bias along `dim`, apply activation, scale by
gain, clamp to [-clamp, clamp]).

On TPU there is nothing to hand-fuse — everything here is elementwise VPU
work that XLA fuses into the producing conv/matmul under jit. The value of
this module is the exact default-gain/alpha semantics, which the generator's
numerics depend on.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _ActSpec(NamedTuple):
    func: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jnp.maximum(x, 0), 0.0, float(np.sqrt(2))),
    "lrelu": _ActSpec(
        lambda x, alpha: jnp.where(x >= 0, x, x * alpha), 0.2, float(np.sqrt(2))
    ),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(x, b=None, dim: int = 1, act: str = "linear",
             alpha: Optional[float] = None, gain: Optional[float] = None,
             clamp: Optional[float] = None):
    """Add bias `b` along `dim`, apply `act`, scale by `gain`, clamp.

    Defaults per activation follow the reference table (bias_act.py:23-33);
    e.g. lrelu defaults to alpha=0.2, gain=sqrt(2).
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
