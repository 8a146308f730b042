"""LPIPS perceptual loss.

Behavioral contract: /root/reference/encoder4editing/criteria/lpips/lpips.py
:16-35 — squared differences of unit-normalized backbone tap activations,
1x1 "lin" convs, spatial mean, summed over taps, divided by batch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.perceptual import features, lpips_channels, init_backbone


def lpips_loss(lpips_params, x, y, net_type: str = "alex"):
    """x, y: [N,3,H,W] in [-1,1] → scalar LPIPS."""
    bp = lpips_params["backbone"]
    lins = lpips_params["lin"]
    fx = features(bp, x, net_type)
    fy = features(bp, y, net_type)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(a - b)
        w = lins[f"{i}"]["weight"].astype(d.dtype)[0, :, 0, 0]  # [C]
        per_image = jnp.mean(jnp.einsum("nchw,c->nhw", d, w), axis=(1, 2))
        total = total + jnp.sum(per_image)
    return total / x.shape[0]


def init_lpips_params(key, net_type: str = "alex") -> Dict[str, Any]:
    kb, kl = jax.random.split(key)
    lins = {}
    for i, c in enumerate(lpips_channels(net_type)):
        lins[f"{i}"] = {"weight": jax.random.uniform(
            jax.random.fold_in(kl, i), (1, c, 1, 1))}
    return {"backbone": init_backbone(kb, net_type), "lin": lins}


def lpips_params_from_torch(backbone_state: Dict[str, np.ndarray],
                            lin_state: Dict[str, np.ndarray],
                            net_type: str = "alex") -> Dict[str, Any]:
    """backbone_state: torchvision features.* names; lin_state: the
    richzhang weights after the reference's key renaming
    (lpips/utils.py:22-29: '{i}.1.weight')."""
    from ..models.perceptual import backbone_from_torch_state

    lins = {}
    for i in range(len(lpips_channels(net_type))):
        key = f"{i}.1.weight" if f"{i}.1.weight" in lin_state else f"{i}.weight"
        lins[f"{i}"] = {"weight": jnp.asarray(lin_state[key])}
    return {"backbone": backbone_from_torch_state(backbone_state, net_type),
            "lin": lins}
