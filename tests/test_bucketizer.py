"""Property tests for geometry quantizers.

Mirrors the reference's test strategy (`tests/train/helpers/test_bucketizer.py`):
encode->decode->encode idempotence and the linear-bucket error bound
|x - x_hat| <= 1/(2*n_bins) — but hermetic (synthetic k-means centers
instead of a downloaded cache).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.bucketizer import (
    fit_kmeans_1d,
    kmeans_bucketizer,
    linear_bucketizer,
)


@pytest.mark.parametrize("n_bins", [2, 16, 128, 256])
def test_linear_roundtrip_and_bound(n_bins):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 10)), jnp.float32)
    b = linear_bucketizer(n_bins)
    idx = b.encode(x)
    assert idx.dtype == jnp.int32
    assert int(idx.min()) >= 0 and int(idx.max()) < n_bins
    x_hat = b.decode(idx)
    # error bound of uniform quantization (+eps for fp32 slop)
    assert float(jnp.abs(x - x_hat).max()) <= 1.0 / (2.0 * n_bins) + 1e-5
    # idempotence
    assert jnp.array_equal(b.encode(x_hat), idx)


def test_linear_clamps_out_of_range():
    b = linear_bucketizer(8)
    x = jnp.asarray([-0.5, 0.0, 1.0, 1.5], jnp.float32)
    idx = b.encode(x)
    assert int(idx[0]) == 0 and int(idx[1]) == 0
    assert int(idx[2]) == 7 and int(idx[3]) == 7


@pytest.mark.parametrize("n_clusters", [4, 32, 128])
def test_kmeans_roundtrip(n_clusters):
    rng = np.random.default_rng(1)
    # bimodal data so kmeans centers are non-uniform
    data = np.concatenate(
        [rng.beta(2, 8, size=4000), rng.beta(8, 2, size=4000)]
    )
    centers = fit_kmeans_1d(data, n_clusters, seed=2)
    assert np.all(np.diff(centers) >= 0)
    b = kmeans_bucketizer(centers)
    x = jnp.asarray(rng.uniform(0, 1, size=(256,)), jnp.float32)
    idx = b.encode(x)
    x_hat = b.decode(idx)
    # decoded value is always a center, re-encoding is stable
    assert jnp.array_equal(b.encode(x_hat), idx)
    # each x maps to its nearest-boundary bucket: decode error bounded by
    # the largest half-gap between adjacent centers (plus edge bins)
    gaps = np.diff(centers)
    bound = max(
        gaps.max() if gaps.size else 1.0,
        centers[0] - 0.0 + 1e-6,
        1.0 - centers[-1] + 1e-6,
    )
    assert float(jnp.abs(x - x_hat).max()) <= bound


def test_kmeans_center_ordering_preserved_under_shuffle():
    rng = np.random.default_rng(3)
    centers = np.sort(rng.uniform(0, 1, size=16))
    shuffled = rng.permutation(centers)
    b1, b2 = kmeans_bucketizer(centers), kmeans_bucketizer(shuffled)
    assert np.allclose(b1.centers, b2.centers)
    assert np.allclose(b1.boundaries, b2.boundaries)
