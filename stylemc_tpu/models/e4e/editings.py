"""Latent editing baselines: InterFaceGAN, GANSpace, SeFa.

Behavioral contracts: /root/reference/encoder4editing/editings/
latent_editor.py:9-45, ganspace.py:4-22, sefa.py:6-52. All pure math over
W+ latents and affine weights.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def apply_interfacegan(latent, direction, factor: float = 1.0,
                       factor_range: Tuple[int, int] | None = None):
    """latent [N, S, 512] + f·direction (latent_editor.py:18-27)."""
    if factor_range is not None:
        return jnp.concatenate([latent + f * direction
                                for f in range(*factor_range)], axis=0)
    return latent + factor * direction


def ganspace_get_delta(pca: Dict, latent, idx: int, strength: float):
    """ganspace.py:16-22. pca: {'mean','comp','std'}; latent: [S, 512]."""
    w_centered = latent - pca["mean"].astype(latent.dtype)
    lat_comp = pca["comp"].astype(latent.dtype)
    lat_std = pca["std"].astype(latent.dtype)
    w_coord = jnp.sum(w_centered[0].reshape(-1) * lat_comp[idx].reshape(-1)) \
        / lat_std[idx]
    return (strength - w_coord) * lat_comp[idx] * lat_std[idx]


def apply_ganspace(latents, pca: Dict,
                   edit_directions: Sequence[Tuple[int, int, int, float]]):
    """ganspace.py:4-13. latents: [N, S, 512]."""
    edited = []
    for latent in latents:
        for pca_idx, start, end, strength in edit_directions:
            delta = ganspace_get_delta(pca, latent, pca_idx, strength)
            padded = jnp.zeros_like(latent)
            padded = padded.at[start:end].add(
                jnp.broadcast_to(delta.reshape(1, -1), (end - start,
                                                        delta.shape[-1])))
            edited.append(latent + padded)
    return jnp.stack(edited)


def sefa_factorize(gen_params, layers="all"):
    """Closed-form factorization of modulation weights (sefa.py:37-52).

    gen_params: our generator pytree. Concatenates the per-layer affine
    weights (transposed: [w_dim, C]) for the chosen conv layers, normalizes
    columns, eigen-decomposes W·Wᵀ."""
    syn = gen_params["synthesis"]
    block_names = sorted(syn.keys(), key=lambda b: int(b[1:]))
    # layer order matching rosinality: conv1(b4), then conv0/conv1 per block
    affines = [np.asarray(syn[block_names[0]]["conv1"]["affine"]["weight"]).T]
    all_convs = []
    for b in block_names[1:]:
        all_convs.extend([syn[b]["conv0"], syn[b]["conv1"]])
    if layers == "all":
        idxs = list(range(len(all_convs)))
    else:
        idxs = [l - 1 for l in layers if l != 0]
        if 0 not in layers:
            affines = []
    for i in idxs:
        affines.append(np.asarray(all_convs[i]["affine"]["weight"]).T)
    weight = np.concatenate(affines, axis=1).astype(np.float32)
    weight = weight / np.linalg.norm(weight, axis=0, keepdims=True)
    eigen_values, eigen_vectors = np.linalg.eig(weight.dot(weight.T))
    return idxs, eigen_vectors.T.real, eigen_values.real


def apply_sefa(gen_params, latents, indices=(2, 3, 4, 5), semantics: int = 1,
               start_distance: float = -15.0, end_distance: float = 15.0,
               step: int = 11, num_samples: int = 1):
    """sefa.py:6-31: sweep eigen-direction distances over chosen layers.

    Reference quirk, reproduced (torch-oracle-tested): the boundary is added
    at W+ rows equal to the CONV indices (`temp_code[:, layers]`,
    sefa.py:24), although convs[i] consumes latent row i+1 in the rosinality
    forward — i.e. the edit lands one style row early."""
    layers, boundaries, _ = sefa_factorize(gen_params, list(indices))
    codes = np.asarray(latents)
    distances = np.linspace(start_distance, end_distance, step)
    layer_rows = list(layers)
    edited = []
    for sem_id in range(semantics):
        boundary = boundaries[sem_id:sem_id + 1]
        for sam_id in range(num_samples):
            code = codes[sam_id:sam_id + 1]
            for d in distances:
                tmp = code.copy()
                tmp[:, layer_rows, :] += boundary * d
                edited.append(tmp)
    return jnp.asarray(np.concatenate(edited, axis=0))
