"""Training entry point.

Reference equivalent: `python -m image2layout.train.train +experiment=...`
(`image2layout/train/train.py`).  Usage:

    python -m ralf_tpu.cli.train --experiment ralf --dataset pku10 \
        --job-dir tmp/jobs/ralf_pku --epochs 2 --synthetic \
        train.lr=1e-4 generator_kwargs.top_k=16

Dotted key=value overrides play the role of the reference's hydra
overrides / bash task files.  GAN experiments route to the adversarial
trainer automatically.
"""

from __future__ import annotations

import argparse
import logging

import jax


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", default="ralf")
    p.add_argument("--dataset", default="pku10")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--job-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--task", default="uncond", help="auxiliary task")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="hermetic synthetic dataset (no parquet dumps needed)")
    p.add_argument("--cache-dir", default="cache",
                   help="offline-artifact dir (retrieval tables, gallery "
                        "features, kmeans vocabularies — cli.build_caches)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the rolling mid-epoch 'step' "
                        "checkpoint in job-dir (see --save-every-steps)")
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="rolling mid-epoch checkpoint cadence (train steps)")
    p.add_argument("--save-every-secs", type=float, default=0.0,
                   help="rolling mid-epoch checkpoint cadence (wall seconds)")
    p.add_argument("--uint8-images", action="store_true",
                   help="fast host input pipeline: canvases travel to the "
                        "device as raw uint8 and are normalized on chip "
                        "at the encoder ingress (~3x host batches/sec, 4x "
                        "less host->device traffic; bit-identical training "
                        "up to the f32 rounding of x/255)")
    p.add_argument("--allow-linear-fallback", action="store_true",
                   help="permit kmeans-preset tokenizers to downgrade to the "
                        "linear vocabulary when centers are missing")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args()

    from ralf_tpu.config import (
        EXPERIMENTS,
        build_config,
        build_datasets,
        build_generator,
        build_tokenizer,
    )
    from ralf_tpu.data.dataset import BatchLoader, DatasetConfig

    cfg = build_config(args.experiment, args.overrides)
    cfg.dataset = DatasetConfig(name=args.dataset, data_dir=args.data_dir)
    cfg.auxiliary_task = args.task
    cfg.debug = args.debug
    cfg.synthetic_data = args.synthetic
    cfg.cache_dir = args.cache_dir
    if args.allow_linear_fallback:  # don't clobber a dotted override
        cfg.allow_linear_fallback = True
    if args.epochs:
        cfg.train.epochs = args.epochs
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    if args.save_every_steps:
        cfg.train.save_every_steps = args.save_every_steps
    if args.save_every_secs:
        cfg.train.save_every_secs = args.save_every_secs
    cfg.train.job_dir = args.job_dir or f"tmp/jobs/{args.experiment}_{args.dataset}_{args.task}"
    if args.debug:
        cfg.train.epochs = 1
    cfg.save(cfg.train.job_dir)

    train_ds, val_ds, test_ds = build_datasets(cfg)
    tokenizer = build_tokenizer(cfg)
    gen = build_generator(cfg, tokenizer)

    # relation task: precomputed clause table (build_caches --what
    # relationships) as the fast path for per-batch conditioning — the
    # reference's RelationshipPreprocessor consumes its dict the same way.
    # Clause letters index into element ORDER, so the table (built under
    # the canonical sorts) only applies to deterministic-sort pipelines.
    deterministic_order = set(cfg.transforms) <= {
        "image", "sort_label", "sort_lexicographic"
    }
    if (args.task in ("relation", "multitask") and deterministic_order
            and hasattr(gen, "relationships_table")):
        from ralf_tpu import cache as cache_mod

        gen.relationships_table = cache_mod.load_relationships(
            cfg.cache_dir, cfg.dataset.name
        )

    if cfg.experiment == "retriever":
        # the top-1 copy baseline is non-learnable (`retriever.py:91-132`):
        # there is nothing to train — the saved config is the whole job;
        # inference rebuilds the gallery from the train split
        print(f"done: {cfg.train.job_dir} (retriever is non-learnable; "
              "config saved, no checkpoint needed)")
        return

    import numpy as _np

    image_dtype = _np.uint8 if args.uint8_images else _np.float32
    train_loader = BatchLoader(train_ds, cfg.train.batch_size,
                               transforms=cfg.transforms, seed=cfg.train.seed,
                               image_dtype=image_dtype)
    val_loader = BatchLoader(val_ds, cfg.train.batch_size, shuffle=False,
                             transforms=cfg.transforms, seed=cfg.train.seed,
                             image_dtype=image_dtype)

    needs_retrieval = cfg.experiment in ("ralf",) or cfg.generator_kwargs.get(
        "with_retrieval"
    )
    mesh = None
    if needs_retrieval:
        from ralf_tpu import cache as cache_mod
        from ralf_tpu.retrieval.retriever import Retriever
        from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

        retriever = Retriever.build(
            train_ds, cache_dir=cfg.cache_dir, dataset_name=cfg.dataset.name
        )
        gs = cfg.train.gallery_shards
        if gs > 1:  # row-shard the gallery; remaining devices = data axis
            from ralf_tpu.parallel.mesh import GALLERY_AXIS, make_mesh

            n = len(jax.devices())
            if n % gs:
                raise SystemExit(
                    f"train.gallery_shards={gs} must divide device count {n}"
                )
            mesh = make_mesh((n // gs, gs))
            retriever.shard_gallery(mesh, GALLERY_AXIS)
        top_k = cfg.generator_kwargs.get("top_k", 16)
        # precomputed top-k tables (cli.build_caches --what retrieval); a
        # cache hit skips the per-run gallery scoring pass entirely
        tables = {
            split: cache_mod.load_retrieval_table(
                cfg.cache_dir, cfg.dataset.name, split,
                retriever.backbone_name, top_k, expect_rows=len(ds),
            )
            for split, ds in (("train", train_ds), ("val", val_ds))
        }
        train_loader = RetrievalAugmentedLoader(
            train_loader, retriever, top_k, is_train_split=True,
            table=tables["train"],
        )
        val_loader = RetrievalAugmentedLoader(
            val_loader, retriever, top_k, table=tables["val"]
        )

    cap = 2 if cfg.debug else None
    if cfg.experiment in ("cglgan", "cglgan_ra", "dsgan", "dsgan_ra", "icvt"):
        if cfg.experiment == "icvt":
            from ralf_tpu.train.trainer import Trainer

            trainer = Trainer(gen, cfg.train, mesh=mesh)
            trainer.fit(train_loader, val_loader, num_steps_cap=cap,
                        resume=args.resume)
        else:
            from ralf_tpu.train.gan_trainer import GANTrainer

            trainer = GANTrainer(gen, cfg.train, mesh=mesh)
            trainer.fit_gan(train_loader, num_steps_cap=cap)
    else:
        from ralf_tpu.train.trainer import Trainer

        trainer = Trainer(gen, cfg.train, mesh=mesh)
        trainer.fit(train_loader, val_loader, num_steps_cap=cap,
                    resume=args.resume)
    print(f"done: {cfg.train.job_dir}")


if __name__ == "__main__":
    main()
