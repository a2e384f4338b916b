"""A/B the FID + prdc bundle against the REFERENCE implementation's math
(VERDICT r4 #4: `eval/metrics.py`'s Fréchet eigendecomposition and prdc
were axioms-only — identity/scaling tests but never compared to what
`image2layout/train/helpers/metric.py:35-58` actually computes).

The reference delegates to two pip packages that are not in this image:

  * `pytorch_fid.fid_score.calculate_frechet_distance` — Heusel et al.
    FID with `scipy.linalg.sqrtm(sigma1 @ sigma2)`, an eps*I retry when
    sqrtm returns non-finite values, and an imaginary-component guard;
  * `prdc.compute_prdc` (Naeem et al. 2020) — pairwise euclidean
    distances, k-th neighbour radii via argpartition at k+1 (the +1
    swallows the self-distance), threshold counts.

`_ref_frechet` / `_ref_prdc` below restate that published math verbatim
(scipy stands in for the packages), following the tests/ref_shims.py
pattern of constructing live reference twins in-env.

Measured equivalence on shared random features (documented tolerance):

  * prdc: EXACT equality — both sides threshold the same euclidean
    distance matrix; with continuous random features no pair sits on a
    radius boundary, so every count matches bit-for-bit.
  * FID: rtol 1e-6 on well-conditioned covariances; the near-singular
    low-rank case is covered separately at rtol 1e-4 (sqrtm and the
    eigenvalue route differ in how they damp near-zero/negative modes).
"""

import numpy as np
import pytest
import scipy.linalg

from ralf_tpu.eval.metrics import (
    compute_generative_model_scores,
    compute_prdc,
    frechet_distance,
)


# ---- reference twins (published package math, scipy-backed) ---------------


def _ref_frechet(feats_real, feats_fake, eps=1e-6):
    """pytorch_fid.fid_score.calculate_frechet_distance, as called by
    `helpers/metric.py:47-57` (mu/sigma computed with np.mean/np.cov)."""
    mu1, mu2 = np.mean(feats_real, 0), np.mean(feats_fake, 0)
    sigma1 = np.cov(feats_real, rowvar=False)
    sigma2 = np.cov(feats_fake, rowvar=False)

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component in sqrtm")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def _ref_prdc(real_features, fake_features, nearest_k=5):
    """prdc.prdc.compute_prdc (argpartition k-th value formulation)."""
    from scipy.spatial.distance import cdist

    def kth_value(unsorted, k):
        indices = np.argpartition(unsorted, k, axis=-1)[..., :k]
        k_smallests = np.take_along_axis(unsorted, indices, axis=-1)
        return k_smallests.max(axis=-1)

    real_nn = kth_value(cdist(real_features, real_features), nearest_k + 1)
    fake_nn = kth_value(cdist(fake_features, fake_features), nearest_k + 1)
    d_rf = cdist(real_features, fake_features)

    precision = (d_rf < np.expand_dims(real_nn, 1)).any(axis=0).mean()
    recall = (d_rf < np.expand_dims(fake_nn, 0)).any(axis=1).mean()
    density = (1.0 / nearest_k) * (
        d_rf < np.expand_dims(real_nn, 1)).sum(axis=0).mean()
    coverage = (d_rf.min(axis=1) < real_nn).mean()
    return dict(precision=float(precision), recall=float(recall),
                density=float(density), coverage=float(coverage))


# ---- shared feature scenarios ---------------------------------------------


def _scenarios():
    rng = np.random.default_rng(0)
    out = {}
    # well-separated gaussians at FIDNet feature scale (256-d, eval.py:413)
    out["shifted"] = (rng.normal(0, 1, (256, 64)),
                      rng.normal(0.5, 1.3, (300, 64)))
    # same distribution, different draws (small-FID regime)
    out["same_dist"] = (rng.normal(0, 1, (256, 64)),
                        rng.normal(0, 1, (256, 64)))
    # anisotropic covariances
    scale = np.linspace(0.05, 3.0, 64)
    out["anisotropic"] = (rng.normal(0, scale, (256, 64)),
                          rng.normal(0.2, scale[::-1], (256, 64)))
    # unequal sample counts (val=999 vs 3 seeds x test splits)
    out["unequal_n"] = (rng.normal(0, 1, (123, 32)),
                        rng.normal(0.1, 0.9, (517, 32)))
    return out


@pytest.mark.parametrize("name", list(_scenarios()))
def test_frechet_matches_pytorch_fid(name):
    a, b = _scenarios()[name]
    ours = frechet_distance(a, b)
    ref = _ref_frechet(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_frechet_near_singular_covariance():
    """Low-rank features (n < d and a rank-deficient mixing matrix): the
    regime where sqrtm vs eigendecomposition genuinely differ in how they
    treat near-zero eigenvalues.  Documented tolerance: rtol 1e-4."""
    rng = np.random.default_rng(7)
    mix = rng.normal(0, 1, (8, 48))  # rank <= 8 in 48-d
    a = rng.normal(0, 1, (200, 8)) @ mix
    b = rng.normal(0.3, 1.1, (220, 8)) @ mix
    ours = frechet_distance(a, b)
    ref = _ref_frechet(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("name", list(_scenarios()))
def test_prdc_matches_prdc_package(name):
    a, b = _scenarios()[name]
    ours = compute_prdc(a, b, nearest_k=5)
    ref = _ref_prdc(a, b, nearest_k=5)
    assert ours == ref, (ours, ref)  # exact: same thresholded counts


def test_bundle_matches_reference_composition():
    """`compute_generative_model_scores` == the reference's bundle
    (`metric.py:35-58`): prdc dict + fid key, float-valued."""
    a, b = _scenarios()["shifted"]
    ours = compute_generative_model_scores(a, b)
    assert set(ours) == {"precision", "recall", "density", "coverage", "fid"}
    ref = _ref_prdc(a, b)
    ref["fid"] = _ref_frechet(a, b)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-6,
                                   err_msg=k)
