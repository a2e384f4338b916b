"""Quantify the VGG-baseline vs AlexNet-lins LPIPS substitution (VERDICT
r3 item #6): on a shared synthetic gallery, rerank every query's candidate
pool with BOTH arms of `retrieval.lpips` and report

  * top1_agreement  — fraction of queries whose best candidate matches,
  * topk_overlap    — mean |top-half ∩ top-half| / (pool/2),
  * mean_spearman   — mean Spearman rho between the two orderings.

With the released `lpips_alex.pth` + VGG checkpoint dropped into
--cache-dir this measures the real substitution; without them both towers
run randomly initialized (still a meaningful architecture-level number:
the taps, scaling, and lins plumbing are identical to the weighted case).

Usage: python scripts/lpips_rank_agreement.py [--cache-dir cache] [--size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rho between two orderings of the same candidate set."""
    n = a.shape[0]
    ra = np.empty(n)
    rb = np.empty(n)
    ra[np.argsort(a, kind="stable")] = np.arange(n)
    rb[np.argsort(b, kind="stable")] = np.arange(n)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 0.0


def rank_agreement(cache_dir: str = "cache", n_gallery: int = 64,
                   n_query: int = 16, pool: int = 16, size: int = 64,
                   seed: int = 0) -> dict:
    import jax.numpy as jnp

    from ralf_tpu.retrieval.lpips import make_lpips_fns

    rng = np.random.default_rng(seed)
    gallery = rng.random((n_gallery, size, size, 3), dtype=np.float32)
    # queries = perturbed gallery rows, so "correct" neighbors exist
    q_rows = rng.choice(n_gallery, size=n_query, replace=False)
    queries = np.clip(
        gallery[q_rows]
        + rng.normal(0, 0.05, (n_query, size, size, 3)).astype(np.float32),
        0, 1)
    pools = np.stack([
        rng.choice(n_gallery, size=pool, replace=False) for _ in range(n_query)
    ])
    pools[:, 0] = q_rows  # every pool contains the true neighbor

    orders = {}
    dists = {}
    for net in ("alex", "vgg"):
        embed, dist = make_lpips_fns(cache_dir, size=size, net=net)
        d = np.zeros((n_query, pool), np.float32)
        for qi in range(n_query):
            q_taps = embed(jnp.asarray(queries[qi:qi + 1]))
            c_taps = embed(jnp.asarray(gallery[pools[qi]]))
            qc = [jnp.repeat(t, pool, axis=0) for t in q_taps]
            d[qi] = np.asarray(dist(qc, c_taps))
        dists[net] = d
        orders[net] = np.argsort(d, axis=1, kind="stable")

    half = pool // 2
    top1 = float(np.mean(orders["alex"][:, 0] == orders["vgg"][:, 0]))
    overlap = float(np.mean([
        len(set(orders["alex"][q, :half]) & set(orders["vgg"][q, :half])) / half
        for q in range(n_query)
    ]))
    rho = float(np.mean([
        _spearman(dists["alex"][q], dists["vgg"][q]) for q in range(n_query)
    ]))
    # sanity: both arms should put the true (perturbed-source) neighbor first
    true_first = {net: float(np.mean(orders[net][:, 0] == 0))
                  for net in orders}
    return {
        "top1_agreement": top1,
        "topk_overlap": overlap,
        "mean_spearman": rho,
        "true_neighbor_first": true_first,
        "n_query": n_query,
        "pool": pool,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cache-dir", default="cache")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--n-gallery", type=int, default=64)
    p.add_argument("--n-query", type=int, default=16)
    p.add_argument("--pool", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    stats = rank_agreement(args.cache_dir, args.n_gallery, args.n_query,
                           args.pool, args.size, args.seed)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
