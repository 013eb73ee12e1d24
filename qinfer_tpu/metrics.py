"""Weighted particle metrics (analogue of qinfer's metrics.py).

Reference parity: ``src/qinfer/metrics.py`` — rescaled/weighted pairwise
particle distances used by clustering [exact names unverified; SURVEY
§2.18]. Host-side NumPy/sklearn.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rescaled_distance_mtx", "weighted_pairwise_distances"]


def rescaled_distance_mtx(locations, weights=None, metric="euclidean"):
    """Pairwise distances of particles rescaled to unit covariance.

    Whitening by the weighted covariance makes the DBSCAN ``eps`` scale-
    free across model parameterizations.
    """
    from sklearn.metrics import pairwise_distances

    locs = np.asarray(locations, dtype=float)
    n = locs.shape[0]
    w = (
        np.full(n, 1.0 / n)
        if weights is None
        else np.asarray(weights, dtype=float)
    )
    mu = w @ locs
    centered = locs - mu
    cov = (w[:, None] * centered).T @ centered
    vals, vecs = np.linalg.eigh(cov)
    whitener = vecs @ np.diag(1.0 / np.sqrt(np.clip(vals, 1e-12, None)))
    return pairwise_distances(centered @ whitener, metric=metric)


def weighted_pairwise_distances(locations, weights, metric="euclidean",
                                w_pow=0.5):
    """Distances scaled by (n·wᵢ·wⱼ)^(−w_pow): heavy pairs look closer.

    Reference: ``metrics.py`` weighted-distance helper [form unverified].
    """
    locs = np.asarray(locations, dtype=float)
    w = np.asarray(weights, dtype=float)
    n = locs.shape[0]
    base = rescaled_distance_mtx(locs, w, metric=metric)
    scale = (n * np.sqrt(np.outer(w, w))) ** (-w_pow)
    return base * scale
