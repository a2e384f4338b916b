"""LPIPS perceptual distance + retrieval rerank (VERDICT r2 item #7).

Reference surface: `preprocess/build_retrieval_indexes_LPIPS.py:1-154`
(exact pairwise LPIPS tables).  The rebuild reranks the cheap backbone's
candidate pool by the same metric class — these tests pin metric axioms
(identity, symmetry, positivity), ranking behavior (an exact duplicate
wins), and the CLI arm's cache naming.
"""

import numpy as np
import pytest

from ralf_tpu.retrieval.lpips import lpips_rerank, make_lpips_fns

SIZE = 32  # keep VGG taps cheap on CPU; metric properties are size-free


@pytest.fixture(scope="module")
def fns(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("lpips_cache"))
    return make_lpips_fns(cache, size=SIZE)


def _imgs(n, seed=0, hw=(40, 30)):
    rng = np.random.default_rng(seed)
    return rng.random((n, *hw, 3), dtype=np.float32)


def test_metric_axioms(fns):
    embed, dist = fns
    x = _imgs(3, seed=1)
    y = _imgs(3, seed=2)
    tx, ty = embed(x), embed(y)
    d_xy = np.asarray(dist(tx, ty))
    d_yx = np.asarray(dist(ty, tx))
    d_xx = np.asarray(dist(tx, tx))
    assert d_xy.shape == (3,)
    np.testing.assert_allclose(d_xx, 0.0, atol=1e-6)  # identity
    np.testing.assert_allclose(d_xy, d_yx, rtol=1e-5)  # symmetry
    assert (d_xy > 1e-4).all()  # distinct randoms are far apart


def test_small_perturbation_is_closer_than_random(fns):
    embed, dist = fns
    x = _imgs(2, seed=3)
    near = np.clip(x + np.random.default_rng(0).normal(0, 0.02, x.shape)
                   .astype(np.float32), 0, 1)
    far = _imgs(2, seed=4)
    tx = embed(x)
    d_near = np.asarray(dist(tx, embed(near)))
    d_far = np.asarray(dist(tx, embed(far)))
    assert (d_near < d_far).all(), (d_near, d_far)


def test_rerank_puts_duplicate_first(fns, tmp_path):
    gallery = _imgs(10, seed=5)
    # queries ARE gallery rows 7 and 2; candidate pools contain them last
    queries = gallery[[7, 2]]
    candidates = np.array([[0, 1, 3, 7], [4, 5, 6, 2]])
    out = lpips_rerank(
        lambda rows: queries[rows],
        candidates,
        lambda rows: gallery[rows],
        cache_dir=str(tmp_path),
        size=SIZE,
        chunk=1,  # exercise the chunked path
    )
    assert out.shape == candidates.shape
    assert out[0, 0] == 7 and out[1, 0] == 2
    assert sorted(out[0]) == sorted(candidates[0])  # a permutation, no loss


@pytest.mark.slow
def test_build_caches_lpips_arm(tmp_path):
    """`--rerank lpips` writes tables under the 'lpips' backbone key (the
    reference's `_lpips_..._table` cache-name contract)."""
    import subprocess
    import sys

    from conftest import cli_subprocess_env

    r = subprocess.run(
        [sys.executable, "-m", "ralf_tpu.cli.build_caches",
         "--what", "retrieval", "--synthetic", "--cache-dir", str(tmp_path),
         "--top-k", "4", "--rerank", "lpips", "--lpips-size", "32"],
        capture_output=True, text=True, env=cli_subprocess_env(), timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from ralf_tpu import cache as cache_mod

    table = cache_mod.load_retrieval_table(
        str(tmp_path), "pku10", "val", "lpips", 4
    )
    assert table is not None and table.shape[1] == 4
