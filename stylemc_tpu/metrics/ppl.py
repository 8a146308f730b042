"""Perceptual Path Length.

Behavioral contract: /root/reference/metrics/perceptual_path_length.py —
pairs of latents interpolated `epsilon` apart (slerp in Z / lerp in W,
sampling 'full' or 'end'), both endpoints synthesized, optional face crop
(rows 3c:7c, cols 2c:6c with c = H/8), downsample to 256 via mean pooling,
LPIPS-VGG distance scaled by 1/eps².
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.perceptual import features as lpips_features


def slerp(a, b, t):
    """reference perceptual_path_length.py:23-32 (torch-oracle-tested).

    Returns UNIT vectors like the reference (inputs are normalized and the
    result is re-normalized). The ADA mapping net normalizes z's second
    moment anyway, so unit-z endpoints produce the reference's images."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b_n - d * a_n
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = a_n * jnp.cos(p) + c * jnp.sin(p)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def _lpips_distance_pairs(lpips_params, img0, img1):
    """Per-pair LPIPS-VGG distance (not batch-averaged)."""
    fx = lpips_features(lpips_params["backbone"], img0, "vgg")
    fy = lpips_features(lpips_params["backbone"], img1, "vgg")
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(a - b)
        w = lpips_params["lin"][f"{i}"]["weight"].astype(d.dtype)[0, :, 0, 0]
        total = total + jnp.mean(jnp.einsum("nchw,c->nhw", d, w), axis=(1, 2))
    return total


def compute_ppl(mapping_fn: Callable, synthesis_fn: Callable,
                lpips_params, z_dim: int,
                num_samples: int = 2000, epsilon: float = 1e-4,
                space: str = "w", sampling: str = "end",
                crop: bool = False, batch_size: int = 8,
                seed: int = 0, gen_params=None, mesh=None) -> float:
    """mapping_fn(gen_params, z) → ws; synthesis_fn(gen_params, ws) → imgs
    [-1,1]. `gen_params`/`lpips_params` flow through the jit as ARGUMENTS
    (closure'd weights embed as HLO literals). With `mesh` (a 1-axis
    ('data',) Mesh) the sample batch shards over devices — pure batch DP,
    like the reference's rank-strided PPL sampler."""
    rng = jax.random.PRNGKey(seed)
    dists = []

    def pair_distance(gp, lp, z0, z1, t):
        if space == "w":
            w0 = mapping_fn(gp, z0)
            w1 = mapping_fn(gp, z1)
            wt0 = w0 + (w1 - w0) * t[:, None, None]
            wt1 = w0 + (w1 - w0) * (t[:, None, None] + epsilon)
        else:
            zt0 = slerp(z0, z1, t[:, None])
            zt1 = slerp(z0, z1, t[:, None] + epsilon)
            wt0 = mapping_fn(gp, zt0)
            wt1 = mapping_fn(gp, zt1)
        img0 = synthesis_fn(gp, wt0)
        img1 = synthesis_fn(gp, wt1)
        if crop:
            c = img0.shape[2] // 8
            img0 = img0[:, :, c * 3:c * 7, c * 2:c * 6]
            img1 = img1[:, :, c * 3:c * 7, c * 2:c * 6]
        factor = img0.shape[2] // 256
        if factor > 1:
            n, ch, h, w = img0.shape
            img0 = img0.reshape(n, ch, h // factor, factor,
                                w // factor, factor).mean(axis=(3, 5))
            img1 = img1.reshape(n, ch, h // factor, factor,
                                w // factor, factor).mean(axis=(3, 5))
        return _lpips_distance_pairs(lp, img0, img1) / epsilon ** 2

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch_size % mesh.devices.size == 0, \
            (batch_size, mesh.devices.size)
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        pair_distance = jax.jit(pair_distance,
                                in_shardings=(rep, rep, dat, dat, dat),
                                out_shardings=dat)
    else:
        pair_distance = jax.jit(pair_distance)

    for lo in range(0, num_samples, batch_size):
        rng, k0, k1, kt = jax.random.split(rng, 4)
        z0 = jax.random.normal(k0, (batch_size, z_dim))
        z1 = jax.random.normal(k1, (batch_size, z_dim))
        if sampling == "full":
            t = jax.random.uniform(kt, (batch_size,))
        else:
            t = jnp.zeros((batch_size,))
        dists.append(np.asarray(pair_distance(gen_params, lpips_params,
                                              z0, z1, t)))
    d = np.concatenate(dists)[:num_samples]

    # reference filters to [1%, 99%] quantiles (perceptual_path_length.py:121-125)
    lo_q = np.percentile(d, 1, method="lower")
    hi_q = np.percentile(d, 99, method="higher")
    return float(np.extract(np.logical_and(d >= lo_q, d <= hi_q), d).mean())
