"""Latent Editing Consistency metric.

Behavioral contract: /root/reference/encoder4editing/metrics/LEC.py:15-86 —
encode → edit → generate → re-encode → inverse-edit; score = mean L2 between
original and round-tripped codes, outliers filtered to [1%, 99%].
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _filter_outliers(arr: np.ndarray) -> np.ndarray:
    lo = np.percentile(arr, 1, method="lower")
    hi = np.percentile(arr, 99, method="higher")
    return np.extract(np.logical_and(lo <= arr, arr <= hi), arr)


def calculate_lec(psp, data_iter: Iterable, edit_function: Callable,
                  inverse_edit_function: Callable,
                  n_batches: int = 16) -> float:
    """psp: models.e4e.psp.PSP; data_iter yields (x, _) numpy batches."""

    import dataclasses as _dc

    @jax.jit
    def _roundtrip(enc_params, dec_params, x):
        p = _dc.replace(psp, encoder_params=enc_params,
                        decoder_params=dec_params)
        codes = p.encode(x)
        edited = edit_function(codes)
        image = p.decode(edited, resize=True, noise_mode="const")
        inv_codes = p.encode(image)
        inv = inverse_edit_function(inv_codes)
        return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(codes - inv),
                                         axis=(1, 2))))

    def roundtrip(x):
        return _roundtrip(psp.encoder_params, psp.decoder_params, x)

    distances = []
    for i, batch in enumerate(data_iter):
        if i >= n_batches:
            break
        x = batch[0] if isinstance(batch, tuple) else batch
        distances.append(float(roundtrip(jnp.asarray(x))))
    return float(_filter_outliers(np.asarray(distances)).mean())
