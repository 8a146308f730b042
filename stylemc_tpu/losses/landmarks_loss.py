"""Facial-landmark losses.

Behavioral contract: /root/reference/landmarks_loss.py — both losses operate
on the 68-point layout and drop the jawline (points 0..16).

WingLoss is reformulated masked-elementwise (identical value to the
reference's boolean-partition form: (Σ small + Σ large)/count == mean of the
piecewise function over all elements) so it stays jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def landmarks_loss(landmarks1, landmarks2):
    """MSE over landmarks[:, 17:] (reference :38-46)."""
    a = landmarks1[:, 17:].reshape(-1, 2)
    b = landmarks2[:, 17:].reshape(-1, 2)
    return jnp.mean(jnp.square(a - b))


def wing_loss(landmarks1, landmarks2, omega: float = 10.0, epsilon: float = 2.0):
    """reference :10-31."""
    y = landmarks1[:, 17:].reshape(-1, 2)
    y_hat = landmarks2[:, 17:].reshape(-1, 2)
    d = jnp.abs(y - y_hat)
    c = omega - omega * np.log(1 + omega / epsilon)
    piece = jnp.where(d < omega, omega * jnp.log1p(d / epsilon), d - c)
    return jnp.mean(piece)
