"""Evaluation entry point.

Reference equivalent: `python eval.py --input-dir <generated_samples_*>`
(`eval.py:184-542`): consumes the inference pickles, computes the
validity filter, the six heuristic metric families, layout-FID + prdc
against the GT split features, averages over seeds, and writes
`scores_all.json` + a paste-friendly `scores_all.txt`.

Protocol parity beyond the metric math:
  * GT FIDNet features are cached per (dataset, split, extractor) in the
    cache dir (`eval.py:335-350`) — repeated evaluations skip the GT pass.
  * `--split both` evaluates the val AND test pickles in one run, like
    the reference's dual-split loop (`eval.py:282-308`).
  * `--image-metrics` adds the image-side columns: image-FID on
    InceptionV3 features of layout-masked canvases (`eval.py:126-181`,
    `metric.py:644-700`) and R_shm, the VGG16 feature distance between a
    canvas and its layout-masked version (`metric.py:703-743`).  Both
    towers are on-device flax ports (models/towers.py); pretrained
    weights load from the cache dir when present, else the towers run
    randomly initialized with a loud warning.

    python -m ralf_tpu.cli.evaluate --input-dir tmp/jobs/.../generated_samples_uncond \
        --job-dir tmp/jobs/... [--fidnet-dir tmp/fidnet] [--image-metrics]
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import pickle

import numpy as np


def records_to_layout(records: list[dict], S: int):
    import jax.numpy as jnp

    from ralf_tpu.core.layout import Layout

    B = len(records)
    arrs = {k: np.zeros((B, S), np.float32)
            for k in ("center_x", "center_y", "width", "height")}
    label = np.zeros((B, S), np.int64)
    mask = np.zeros((B, S), bool)
    for i, r in enumerate(records):
        n = min(len(r["label"]), S)
        label[i, :n] = r["label"][:n]
        mask[i, :n] = True
        for k in arrs:
            arrs[k][i, :n] = r[k][:n]
    return Layout(label=jnp.asarray(label), mask=jnp.asarray(mask),
                  **{k: jnp.asarray(v) for k, v in arrs.items()})


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--job-dir", default=None)
    p.add_argument("--split", default="test", choices=["val", "test", "both"],
                   help="'both' evaluates val and test pickles in one run "
                        "(`eval.py:282-308`)")
    p.add_argument("--fidnet-dir", default=None,
                   help="trained FIDNet checkpoint dir (fid_train CLI)")
    p.add_argument("--cache-dir", default="cache",
                   help="GT-feature cache + pretrained tower checkpoints")
    p.add_argument("--image-metrics", action="store_true",
                   help="add image-FID (InceptionV3 on masked canvases) "
                        "and R_shm (VGG16 feature distance)")
    p.add_argument("--unannotated", action="store_true",
                   help="no-GT split: heuristic metrics only, no FID/prdc "
                        "(eval_unanno.py equivalent)")
    p.add_argument("--eval-batch-size", type=int, default=512,
                   help="image streaming chunk: canvases are fetched and "
                        "featurized EB at a time (like eval.py:395-406), so "
                        "peak host RAM is O(EB x H x W) instead of the whole "
                        "split (~8 GB/split at CGL scale)")
    args = p.parse_args()

    import jax

    from ralf_tpu import cache as cache_mod
    from ralf_tpu.config import FrameworkConfig, build_datasets
    from ralf_tpu.eval.metrics import (
        compute_alignment,
        compute_generative_model_scores,
        compute_overlap,
        compute_overlay,
        compute_saliency_aware_metrics,
        compute_underlay_effectiveness,
        compute_validity,
        nanmean,
    )
    from ralf_tpu.models.fidnet import FIDNetV3

    job_dir = args.job_dir or os.path.dirname(args.input_dir.rstrip("/"))
    cfg = FrameworkConfig.load(job_dir)
    S = cfg.dataset.max_seq_length
    names = list(cfg.dataset.label_names)
    text_id = names.index("text") if "text" in names else 0
    underlay_id = names.index("underlay") if "underlay" in names else len(names) - 1

    train_ds, val_ds, test_ds = build_datasets(cfg)

    # FIDNet features (trained checkpoint when available, else random —
    # relative comparisons remain possible, absolute FID needs training)
    fidnet = FIDNetV3(num_labels=len(names), max_bbox=S)
    if args.fidnet_dir:
        from ralf_tpu.train.fid_trainer import FIDNetTrainer

        t = FIDNetTrainer(len(names), S, job_dir=args.fidnet_dir)
        fid_params = t.load()
        feat_tag = "trained"
    else:
        from ralf_tpu.core.layout import random_layout

        fid_params = fidnet.init(
            jax.random.PRNGKey(0), random_layout(np.random.default_rng(0), 2, S, len(names))
        )["params"]
        feat_tag = "untrained"
        logging.warning("no --fidnet-dir: FID uses an UNTRAINED extractor")

    feat_fn = jax.jit(
        lambda lay: fidnet.apply({"params": fid_params}, lay,
                                 method=FIDNetV3.extract_features)
    )

    image_feature_fns = None
    if args.image_metrics:
        from ralf_tpu.eval.image_metrics import tower_feature_fn

        image_feature_fns = {
            "inception": tower_feature_fn("inception", args.cache_dir),
            "vgg": tower_feature_fn("vgg", args.cache_dir),
        }

    splits = ["val", "test"] if args.split == "both" else [args.split]
    combined: dict[str, dict] = {}
    for split in splits:
        ds = {"val": val_ds, "test": test_ds}[split]
        if args.unannotated:
            # canvases must come from the SAME split the pickles were
            # generated on — the with_no_annotation parquet dir when the
            # dump provides it (mirrors cli/inference.py's source switch)
            try:
                from ralf_tpu.data.dataset import HFParquetDataset

                ds = HFParquetDataset(cfg.dataset, "with_no_annotation")
            except Exception:
                logging.warning("no with_no_annotation split; evaluating "
                                "against %s canvases", split)
        idx = np.arange(len(ds))
        gt_layout = records_to_layout(_gt_records(ds, idx), S)
        EB = max(1, args.eval_batch_size)

        def image_chunks(n: int):
            """Stream (row_idx, images[f32]) EB rows at a time — canvases
            are the only split-sized tensors; layouts stay tiny."""
            for s in range(0, n, EB):
                ci = np.arange(s, min(s + EB, n))
                yield ci, np.asarray(ds.get_images(ci), np.float32)

        gt_feats = None
        if not args.unannotated:
            # GT features cached per (dataset, split, extractor) like the
            # reference's cache/eval_gt_features (`eval.py:335-350`)
            gt_feats = cache_mod.load_gt_features(
                args.cache_dir, cfg.dataset.name, split, feat_tag,
                expect_rows=len(ds),
            )
            if gt_feats is None:
                gt_feats = np.asarray(feat_fn(gt_layout))
                cache_mod.save_gt_features(
                    args.cache_dir, cfg.dataset.name, split, feat_tag, gt_feats
                )

        all_scores = []
        pkl_glob = os.path.join(args.input_dir, f"{split}_*.pkl")
        for pkl_path in sorted(glob.glob(pkl_glob)):
            if pkl_path.endswith("_violation.pkl"):
                continue
            with open(pkl_path, "rb") as f:
                data = pickle.load(f)
            layout = records_to_layout(data["results"], S)
            layout, validity = compute_validity(layout)
            B = layout.label.shape[0]

            scores = {"validity": float(validity)}
            # layout-only metrics run on the whole split at once — the
            # tensors are [B, S] and tiny; only CANVASES are streamed
            scores["alignment-LayoutGAN++"] = nanmean(compute_alignment(layout))
            scores["overlap-LayoutGAN++"] = nanmean(compute_overlap(layout))
            scores["overlay"] = nanmean(compute_overlay(layout, underlay_id))
            ue = compute_underlay_effectiveness(layout, underlay_id)
            scores["underlay_effectiveness_loose"] = nanmean(ue["underlay_effectiveness_loose"])
            scores["underlay_effectiveness_strict"] = nanmean(ue["underlay_effectiveness_strict"])

            # saliency-aware metrics per image chunk (per-sample values
            # concatenate exactly; nanmean is order-invariant)
            sal_parts: dict[str, list] = {}
            rshm_parts, real_feats, fake_feats = [], [], []
            for ci, img_c in image_chunks(B):
                lay_c = jax.tree.map(lambda a: a[ci], layout)
                sal = compute_saliency_aware_metrics(
                    lay_c, img_c, text_id, underlay_id
                )
                for k, v in sal.items():
                    sal_parts.setdefault(k, []).append(np.asarray(v))
                if image_feature_fns is not None:
                    from ralf_tpu.eval.image_metrics import (
                        compute_rshm,
                        masked_features,
                    )

                    if not args.unannotated:
                        gt_c = jax.tree.map(lambda a: a[ci], gt_layout)
                        real_feats.append(masked_features(
                            gt_c, img_c, image_feature_fns["inception"]))
                        fake_feats.append(masked_features(
                            lay_c, img_c, image_feature_fns["inception"]))
                    rshm_parts.append(compute_rshm(
                        lay_c, img_c, image_feature_fns["vgg"]))
            for k, parts in sal_parts.items():
                scores[k] = nanmean(np.concatenate(parts))

            if gt_feats is not None:  # FID/prdc need GT layouts
                feats = np.asarray(feat_fn(layout))
                scores.update(compute_generative_model_scores(gt_feats, feats))
            if image_feature_fns is not None:
                if real_feats:
                    fid = compute_generative_model_scores(
                        np.concatenate(real_feats), np.concatenate(fake_feats)
                    )
                    scores.update({f"image_{k}": v for k, v in fid.items()})
                scores["R_shm"] = float(np.mean(np.concatenate(rshm_parts)))
            all_scores.append(scores)
            logging.info("%s: %s", os.path.basename(pkl_path),
                         {k: round(v, 4) for k, v in scores.items()})

        if not all_scores:
            logging.warning("no %s pickles under %s", split, args.input_dir)
            continue
        # 3-seed mean +- std protocol (`eval.py:91-122`)
        keys = all_scores[0].keys()
        agg = {k: {"mean": float(np.mean([s[k] for s in all_scores])),
                   "std": float(np.std([s[k] for s in all_scores]))} for k in keys}
        combined[split] = agg
        suffix = "" if args.split != "both" else f"_{split}"
        out_json = os.path.join(args.input_dir, f"scores_all{suffix}.json")
        with open(out_json, "w") as f:
            json.dump(agg, f, indent=2)
        with open(os.path.join(args.input_dir, f"scores_all{suffix}.txt"), "w") as f:
            f.write("\t".join(keys) + "\n")
            f.write("\t".join(f"{agg[k]['mean']:.4f}±{agg[k]['std']:.4f}" for k in keys) + "\n")
    print(json.dumps(combined if args.split == "both"
                     else combined.get(splits[0], {}), indent=2))


def _gt_records(ds, idx):
    lay = ds.get_layouts(idx)
    out = []
    for i in range(len(idx)):
        m = lay["mask"][i]
        out.append({
            "label": lay["label"][i][m].tolist(),
            **{k: lay[k][i][m].tolist() for k in
               ("center_x", "center_y", "width", "height")},
        })
    return out


if __name__ == "__main__":
    main()
