"""GAN metric computations: FID, KID, Inception Score, Precision & Recall.

Behavioral contracts:
  * FID — /root/reference/metrics/frechet_inception_distance.py:20-41:
    ||mu_g − mu_r||² + Tr(C_g + C_r − 2(C_g C_r)^½).
  * KID — kernel_inception_distance.py:18-46: unbiased polynomial-kernel
    MMD over `num_subsets` random subsets of size `max_subset_size`.
  * IS — inception_score.py:18-38: exp(mean KL(p(y|x) ‖ p(y))) over
    `num_splits` splits of softmax probabilities.
  * P&R — precision_recall.py:19-62: manifold estimation with k-NN radii
    over batched pairwise distances.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import numpy as np
import scipy.linalg


def fid_from_stats(mu_gen, sigma_gen, mu_real, sigma_real) -> float:
    m = np.square(mu_gen - mu_real).sum()
    # When num_gen < feature_dim the covariance product is singular and
    # scipy emits LinAlgWarning(RuntimeWarning) from sqrtm — inherent to
    # small-sample FID, not a numerics defect (the reference runs sqrtm
    # with disp=False and ignores the error estimate entirely,
    # frechet_inception_distance.py:35). Suppress exactly that warning at
    # the source so warnings-as-errors suites keep real NaN warnings
    # fatal; non-finite results still propagate to the caller's checks.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", scipy.linalg.LinAlgWarning)
        s = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real))
    dist = m + np.trace(sigma_gen + sigma_real - s * 2)
    return float(np.real(dist))


def kid_from_features(real_features: np.ndarray, gen_features: np.ndarray,
                      num_subsets: int = 100, max_subset_size: int = 1000,
                      seed: int = 0) -> float:
    n = real_features.shape[1]
    m = min(min(real_features.shape[0], gen_features.shape[0]),
            max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = gen_features[rng.choice(gen_features.shape[0], m, replace=False)]
        y = real_features[rng.choice(real_features.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def inception_score_from_probs(probs: np.ndarray,
                               num_splits: int = 10) -> Tuple[float, float]:
    """probs: softmax outputs [N, 1008/1000]."""
    scores = []
    num_gen = probs.shape[0]
    # fewer samples than splits would make some split slices empty and
    # np.mean over them NaN (the round-2 "Mean of empty slice" warning);
    # the reference contract (inception_score.py:31-36) assumes
    # N >> num_splits, so clamp for tiny runs
    num_splits = max(1, min(num_splits, num_gen))
    for i in range(num_splits):
        part = probs[i * num_gen // num_splits:(i + 1) * num_gen // num_splits]
        kl = part * (np.log(part + 1e-12) -
                     np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        kl = np.mean(np.sum(kl, axis=1))
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aa = np.sum(np.square(a), axis=1, keepdims=True)
    bb = np.sum(np.square(b), axis=1, keepdims=True)
    d = aa + bb.T - 2.0 * (a @ b.T)
    return np.maximum(d, 0.0)


def compute_distances_batched(row_features, col_features,
                              col_batch_size: int = 10000) -> np.ndarray:
    """Batched pairwise L2 distances (the single-host equivalent of the
    rank-strided cdist at precision_recall.py:19-32)."""
    out = []
    for lo in range(0, col_features.shape[0], col_batch_size):
        out.append(np.sqrt(_pairwise_sq_dists(
            row_features, col_features[lo:lo + col_batch_size])))
    return np.concatenate(out, axis=1)


def precision_recall_from_features(real_features: np.ndarray,
                                   gen_features: np.ndarray,
                                   nhood_size: int = 3,
                                   row_batch_size: int = 10000,
                                   col_batch_size: int = 10000
                                   ) -> Tuple[float, float]:
    """Improved P&R (Kynkäänniemi et al.): a sample is covered if it falls
    within the k-NN radius of some manifold point."""
    results = {}
    for name, manifold, probes in (
            ("precision", real_features, gen_features),
            ("recall", gen_features, real_features)):
        # k-NN radius per manifold point
        kth = []
        for lo in range(0, manifold.shape[0], row_batch_size):
            d = compute_distances_batched(manifold[lo:lo + row_batch_size],
                                          manifold, col_batch_size)
            # nhood_size-th neighbour excluding self (self-distance 0 included
            # in the sort, hence index nhood_size)
            kth.append(np.partition(d, nhood_size, axis=1)[:, nhood_size])
        kth = np.concatenate(kth)
        pred = []
        for lo in range(0, probes.shape[0], row_batch_size):
            d = compute_distances_batched(probes[lo:lo + row_batch_size],
                                          manifold, col_batch_size)
            pred.append((d <= kth[None, :]).any(axis=1))
        results[name] = float(np.concatenate(pred).mean())
    return results["precision"], results["recall"]
