"""Offline cache builders: retrieval tables, k-means token vocabularies,
relationship tables.

Reference equivalents:
  * `preprocess/build_retrieval_indexes.py` (+_LPIPS/_cross_dataset) and
    `preprocess/rerank_indexes.py` — faiss index + per-split top-k tables
  * `preprocess/save_clustering_coordinates.py` — sklearn k-means centers
    per geometry key for the adaptive (kmeans) tokenizer
  * `preprocess/precompute_relationship.py` — full pairwise relation
    clause table per sample

    python -m ralf_tpu.cli.build_caches --what retrieval|clusters|relationships \
        --dataset pku10 [--data-dir ...] [--synthetic] --cache-dir cache/

Artifacts go to `{cache_dir}` with names mirroring the reference's cache
conventions so jobs can address them the same way.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np


def build_relationships_table(datasets) -> dict:
    """{sample_id: clause list} over the given splits.

    Clause element letters index into the layout ORDER, so the table is
    only valid under the same deterministic element order the consumer
    sees.  Canonicalize with the AR pipeline's sorts — exactly what the
    reference bakes into its table name (`task_preprocessor.py:499`:
    `..._using_canvas_sort_label_lexico.pt`).  Consumers
    (`core/conditioning._lookup_relationships` via the CLIs) only load the
    table when the job's transforms are those deterministic sorts.
    """
    from ralf_tpu.core.layout import Layout
    from ralf_tpu.core.relationships import describe_relationships
    from ralf_tpu.data.transforms import compose

    sort = compose(["sort_label", "sort_lexicographic"])
    rng = np.random.default_rng(0)  # sorts are deterministic; rng unused
    table: dict = {}
    for ds in datasets:
        idx = np.arange(len(ds))
        lay = ds.get_layouts(idx)
        out = {k: v.copy() for k, v in lay.items()}
        for b in range(idx.shape[0]):
            n = int(lay["mask"][b].sum())
            if n <= 1:
                continue
            sample = {k: lay[k][b, :n] for k in
                      ("label", "center_x", "center_y", "width", "height")}
            sample = sort(sample, rng)
            for k, v in sample.items():
                out[k][b, :n] = v
        rels = describe_relationships(Layout.fromdict(out))
        for i, r in zip(ds.get_ids(idx), rels):
            table[str(i)] = r
    return table


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["retrieval", "clusters", "relationships"],
                   required=True)
    p.add_argument("--dataset", default="pku10")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cache-dir", default="cache")
    p.add_argument("--top-k", type=int, default=32)
    p.add_argument("--backbone", default="saliency")
    p.add_argument("--rerank", choices=["none", "mmr", "random", "lpips"],
                   default="none")
    p.add_argument("--lpips-size", type=int, default=224,
                   help="LPIPS input resolution (224 = VGG-parity; smaller "
                        "trades fidelity for builder speed)")
    p.add_argument("--lpips-net", choices=["alex", "vgg"], default="alex",
                   help="alex = the reference's exact AlexNet+lins metric "
                        "(weights from cache/lpips_alex.pth when present); "
                        "vgg = the baseline-weights VGG arm on the shared "
                        "R_shm checkpoint")
    p.add_argument("--cross-dataset-dir", default=None,
                   help="gallery from another dataset (cross-dataset study)")
    args = p.parse_args()

    from ralf_tpu.config import FrameworkConfig, build_datasets
    from ralf_tpu.data.dataset import DatasetConfig

    cfg = FrameworkConfig(
        dataset=DatasetConfig(name=args.dataset, data_dir=args.data_dir),
        synthetic_data=args.synthetic,
    )
    train_ds, val_ds, test_ds = build_datasets(cfg)
    os.makedirs(args.cache_dir, exist_ok=True)

    if args.what == "retrieval":
        from ralf_tpu import cache as cache_mod
        from ralf_tpu.retrieval.retriever import Retriever, mmr_rerank

        gallery_ds = train_ds
        gallery_name = args.dataset
        table_key = args.dataset  # cache key for the query-side tables
        if args.cross_dataset_dir:
            other = FrameworkConfig(
                dataset=DatasetConfig(
                    name="cgl" if "pku" in args.dataset else "pku10",
                    data_dir=args.cross_dataset_dir,
                )
            )
            gallery_ds, _, _ = build_datasets(other)
            gallery_name = other.dataset.name
            # cross-dataset tables must not collide with same-dataset ones:
            # a normal run would silently load foreign-gallery neighbors
            table_key = f"{args.dataset}_gallery_{gallery_name}"
        # gallery features persist alongside the tables so train/inference
        # runs do zero re-embedding (consumed by Retriever.build)
        retriever = Retriever.build(
            gallery_ds, args.backbone,
            cache_dir=args.cache_dir, dataset_name=gallery_name,
        )
        for split, ds in (("train", train_ds), ("val", val_ds), ("test", test_ds)):
            table = retriever.precompute_table(
                ds, args.top_k,
                is_train_split=(split == "train" and not args.cross_dataset_dir),
            )
            backbone_key = args.backbone
            if args.rerank == "mmr":
                feats = np.asarray(retriever.features)
                # rerank per batch to bound memory
                out = np.zeros_like(table[:, : args.top_k // 2])
                for s in range(0, len(ds), 256):
                    idx = np.arange(s, min(s + 256, len(ds)))
                    qf = np.asarray(retriever.embed(ds.get_images(idx)))
                    out[idx] = mmr_rerank(feats, table[idx], qf, args.top_k // 2)
                table = out
            elif args.rerank == "lpips":
                # perceptual rerank of the cheap backbone's candidate pool
                # (reference `build_retrieval_indexes_LPIPS.py`, redesigned
                # O(N*M) — see retrieval/lpips.py); saved under its own
                # backbone key like the reference's `_lpips_` cache names
                from ralf_tpu.retrieval.lpips import lpips_rerank

                table = lpips_rerank(
                    lambda rows: ds.get_images(rows),
                    table,
                    lambda rows: gallery_ds.get_images(rows),
                    cache_dir=args.cache_dir,
                    size=args.lpips_size,
                    net=args.lpips_net,
                )
                backbone_key = "lpips"
            path = cache_mod.save_retrieval_table(
                args.cache_dir, table_key, split, backbone_key, table
            )
            logging.info("%s: table %s -> %s", split, table.shape, path)

    elif args.what == "clusters":
        from ralf_tpu.core.bucketizer import fit_kmeans_1d
        from ralf_tpu.core.layout import GEO_KEYS

        lay = train_ds.get_layouts(np.arange(len(train_ds)))
        mask = lay["mask"]
        weights = {}
        for key in GEO_KEYS:
            vals = lay[key][mask]
            for n in [2**i for i in range(1, 9)]:
                weights[f"{key}-{n}"] = fit_kmeans_1d(vals, n)
        from ralf_tpu import cache as cache_mod

        path = cache_mod.kmeans_clusters_path(args.cache_dir, args.dataset)
        with open(path, "wb") as f:
            pickle.dump(weights, f)
        logging.info("wrote %s (%d entries)", path, len(weights))

    else:  # relationships
        table = build_relationships_table([train_ds, val_ds, test_ds])
        from ralf_tpu import cache as cache_mod

        path = cache_mod.relationships_path(args.cache_dir, args.dataset)
        with open(path, "wb") as f:
            pickle.dump(table, f)
        logging.info("wrote %s (%d samples)", path, len(table))


if __name__ == "__main__":
    main()
