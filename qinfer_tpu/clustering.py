"""Particle clustering (analogue of qinfer's clustering.py).

Reference parity: ``src/qinfer/clustering.py`` — ``particle_clusters``
(DBSCAN over the weighted particle cloud, yielding (label, mask) pairs;
``NOISE`` label −1). Host-side sklearn; runs per analysis query, not per
SMC step (SURVEY §2.17).
"""

from __future__ import annotations

import numpy as np

__all__ = ["particle_clusters", "NOISE"]

NOISE = -1


def particle_clusters(particle_locations, particle_weights=None, eps=0.5,
                      min_particles=5, metric="euclidean",
                      weighted=False, w_pow=0.5, quiet=True):
    """Yield (cluster_label, member_mask) pairs from DBSCAN.

    Reference: ``clustering.py — particle_clusters``. ``weighted=True``
    scales the metric by weight^(−w_pow) so heavy particles cluster more
    readily [weighting scheme unverified; documented intent preserved].
    """
    from sklearn.cluster import DBSCAN

    locs = np.asarray(particle_locations)
    n = locs.shape[0]
    if particle_weights is None:
        particle_weights = np.full(n, 1.0 / n)
    w = np.asarray(particle_weights)

    if weighted:
        from .metrics import weighted_pairwise_distances

        dist = weighted_pairwise_distances(locs, w, metric=metric, w_pow=w_pow)
        clusterer = DBSCAN(
            eps=eps, min_samples=min_particles, metric="precomputed"
        )
        labels = clusterer.fit_predict(dist)
    else:
        clusterer = DBSCAN(eps=eps, min_samples=min_particles, metric=metric)
        labels = clusterer.fit_predict(locs)

    found = set(int(l) for l in labels)
    if not quiet and NOISE in found:
        import warnings

        warnings.warn(
            f"{int((labels == NOISE).sum())} particles labeled as noise."
        )
    for label in sorted(found):
        yield label, labels == label
