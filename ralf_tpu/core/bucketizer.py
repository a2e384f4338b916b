"""Geometry quantizers: continuous [0,1] coordinates <-> discrete bins.

Functional parity with the reference bucketizers
(`image2layout/train/helpers/bucketizer.py:38-112`): a linear uniform
quantizer and a k-means adaptive quantizer defined by sorted cluster
centers.  Implemented as immutable objects holding constant tables;
``encode``/``decode`` are pure jnp functions, safe under jit/vmap.

Encoding follows torch.bucketize(right=False) semantics, i.e.
``searchsorted(boundaries, x, side='left')`` after clamping to [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Bucketizer:
    """Quantizer defined by bin *boundaries* (right edges) and *centers*."""

    def __init__(self, boundaries: np.ndarray, centers: np.ndarray) -> None:
        assert boundaries.ndim == 1 and centers.ndim == 1
        assert boundaries.shape[0] == centers.shape[0]
        self._boundaries = np.asarray(boundaries, np.float32)
        self._centers = np.asarray(centers, np.float32)

    @property
    def n_bins(self) -> int:
        return int(self._centers.shape[0])

    @property
    def boundaries(self) -> np.ndarray:
        return self._boundaries

    @property
    def centers(self) -> np.ndarray:
        return self._centers

    def encode(self, x: jax.Array) -> jax.Array:
        """float [...] in [0,1] -> int32 bin index [...]"""
        x = jnp.clip(x, 0.0, 1.0)
        return jnp.searchsorted(
            jnp.asarray(self._boundaries), x, side="left"
        ).astype(jnp.int32)

    def decode(self, idx: jax.Array) -> jax.Array:
        """int [...] bin index -> float32 bin center [...]"""
        idx = jnp.clip(idx, 0, self.n_bins - 1)
        return jnp.take(jnp.asarray(self._centers), idx, axis=0)


def linear_bucketizer(n_bins: int) -> Bucketizer:
    """Uniform quantization of [0, 1] into ``n_bins`` equal bins."""
    edges = np.arange(n_bins + 1, dtype=np.float64) / n_bins
    starts, ends = edges[:-1], edges[1:]
    return Bucketizer(boundaries=ends, centers=(starts + ends) / 2.0)


def kmeans_bucketizer(cluster_centers: np.ndarray) -> Bucketizer:
    """Adaptive quantization from (unsorted) 1-d k-means cluster centers.

    Boundaries are midpoints between consecutive sorted centers, with 1.0
    as the final right edge (reference `bucketizer.py:84-101`).
    """
    centers = np.sort(np.asarray(cluster_centers, np.float64).reshape(-1))
    mids = (centers[:-1] + centers[1:]) / 2.0
    boundaries = np.concatenate([mids, np.ones((1,))])
    return Bucketizer(boundaries=boundaries, centers=centers)


def fit_kmeans_1d(
    values: np.ndarray, n_clusters: int, n_iters: int = 50, seed: int = 0
) -> np.ndarray:
    """Plain-numpy 1-d k-means (Lloyd's) for building adaptive vocabularies.

    Replaces the reference's sklearn.KMeans offline fit
    (`image2layout/preprocess/save_clustering_coordinates.py:70-86`).
    Returns sorted cluster centers of shape [n_clusters].
    """
    values = np.asarray(values, np.float64).reshape(-1)
    rng = np.random.default_rng(seed)
    # k-means++ style init: spread quantiles
    qs = np.linspace(0.0, 1.0, n_clusters + 2)[1:-1]
    centers = np.quantile(values, qs)
    centers += rng.normal(0, 1e-6, size=centers.shape)  # break ties
    for _ in range(n_iters):
        assign = np.abs(values[:, None] - centers[None, :]).argmin(axis=1)
        for k in range(n_clusters):
            sel = values[assign == k]
            if sel.size:
                centers[k] = sel.mean()
    return np.sort(centers)
