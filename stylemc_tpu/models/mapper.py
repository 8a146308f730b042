"""Latent mapper network.

Behavioral contract: /root/reference/latent_mappers.py:12-93 — `Mapper`
splits the 8 trainable S-space rows into coarse (0-3) and medium (4-7)
halves, each processed by a `SubMapperModulation`: PixelNorm followed by
5 × (Linear(512,512) → LayerNorm([4,512], no affine) → LeakyReLU(neg_slope)).
(The reference's embedding/gamma-beta path is dead code — gamma_function is
commented out and the trainer never passes an embedding — so the functional
form is exactly this chain; latent_mappers.py:18-19,89-90.)

Weight interop: {course,medium}_mapping.modulation_module_list.{i}.fc.*
torch names, preserved (including the reference's 'course' spelling).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def pixel_norm(x, axis: int = 1, eps: float = 1e-8):
    """rosinality PixelNorm (model.py:~16): rsqrt of the mean square over
    dim=1. For the mapper's 3D input [N, layernum, 512] that is the LAYER
    axis, not the channel axis — a reference quirk verified against the
    torch oracle (tests/test_reference_parity.py::test_mapper_vs_torch)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def _layer_norm_noaffine(x, eps: float = 1e-5):
    """LayerNorm([layernum, 512], elementwise_affine=False): normalizes over
    the last TWO axes jointly."""
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _modulation_module(p, x, neg_slope: float):
    x = x @ p["fc"]["weight"].T.astype(x.dtype) + p["fc"]["bias"].astype(x.dtype)
    x = _layer_norm_noaffine(x)
    return jnp.where(x >= 0, x, neg_slope * x)


def _sub_mapper(p, x, neg_slope: float):
    x = pixel_norm(x)
    for i in range(5):
        x = _modulation_module(p[f"mod{i}"], x, neg_slope)
    return x


def mapper_apply(params, x, neg_slope: float = 0.01):
    """x: [N, 8, 512] trainable-channel styles → delta [N, 8, 512]."""
    coarse = _sub_mapper(params["course_mapping"], x[:, :4, :], neg_slope)
    medium = _sub_mapper(params["medium_mapping"], x[:, 4:8, :], neg_slope)
    return jnp.concatenate([coarse, medium], axis=1)


def init_mapper_params(key, dim: int = 512) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 24))

    def sub():
        out = {}
        for i in range(5):
            k = next(ks)
            # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            bound = 1.0 / np.sqrt(dim)
            out[f"mod{i}"] = {"fc": {
                "weight": jax.random.uniform(k, (dim, dim), minval=-bound,
                                             maxval=bound),
                "bias": jnp.zeros((dim,)),
            }}
        return out

    return {"course_mapping": sub(), "medium_mapping": sub()}


def params_from_torch_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for part in ("course_mapping", "medium_mapping"):
        sub = {}
        for i in range(5):
            pfx = f"{part}.modulation_module_list.{i}.fc"
            sub[f"mod{i}"] = {"fc": {"weight": jnp.asarray(state[f"{pfx}.weight"]),
                                     "bias": jnp.asarray(state[f"{pfx}.bias"])}}
        out[part] = sub
    return out


def params_to_torch_state(params) -> Dict[str, np.ndarray]:
    out = {}
    for part in ("course_mapping", "medium_mapping"):
        for i in range(5):
            pfx = f"{part}.modulation_module_list.{i}.fc"
            out[f"{pfx}.weight"] = np.array(params[part][f"mod{i}"]["fc"]["weight"])
            out[f"{pfx}.bias"] = np.array(params[part][f"mod{i}"]["fc"]["bias"])
    return out
