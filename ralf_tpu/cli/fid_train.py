"""Train the per-dataset FIDNetV3 feature extractor.

Reference equivalent: `python -m image2layout.train.fid.train`
(`image2layout/train/fid/train.py`).

    python -m ralf_tpu.cli.fid_train --dataset pku10 --job-dir tmp/fidnet/pku10 \
        --epochs 10 --synthetic
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="pku10")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--job-dir", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args()

    from ralf_tpu.config import FrameworkConfig, build_datasets
    from ralf_tpu.data.dataset import BatchLoader, DatasetConfig
    from ralf_tpu.train.fid_trainer import FIDNetTrainer

    cfg = FrameworkConfig(
        dataset=DatasetConfig(name=args.dataset, data_dir=args.data_dir),
        synthetic_data=args.synthetic, debug=args.debug,
    )
    train_ds, _, _ = build_datasets(cfg)
    trainer = FIDNetTrainer(
        cfg.dataset.num_labels, cfg.dataset.max_seq_length, lr=args.lr,
        job_dir=args.job_dir or f"tmp/fidnet/{args.dataset}",
    )
    loader = BatchLoader(train_ds, args.batch_size, with_images=False)
    trainer.fit(loader, epochs=args.epochs,
                num_steps_cap=2 if args.debug else None)
    print(f"saved FIDNet to {trainer.job_dir}")


if __name__ == "__main__":
    main()
