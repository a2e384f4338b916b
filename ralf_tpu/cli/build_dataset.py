"""Offline dataset builder: raw annotations + images -> parquet shards.

Reference equivalent: `image2layout/hfds_builder/dump_dataset.py` (plus
the saliency/inpainting stages it assumes ran first).

    python -m ralf_tpu.cli.build_dataset --dataset-type pku \
        --dataset-root /datasets/PosterLayout/raw \
        --splits-dir /path/to/data_splits/splits/pku \
        --output-dir /datasets/PosterLayout/pku10

Expects the reference's directory layout: `image/{split}/input/*.png`,
`image/{split}/saliency/*.png`, `image/{split}/saliency_sub/*.png` (the
two saliency maps are combined by pixel max); images resize to 240x350.
The saliency maps come from cli.saliency; inpainted train canvases from
preprocess/inpainting.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from collections import defaultdict


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-type", choices=["pku", "cgl"], required=True)
    p.add_argument("--dataset-root", required=True)
    p.add_argument("--splits-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-seq-length", type=int, default=10)
    p.add_argument("--num-shards", type=int, default=8)
    args = p.parse_args()

    import datasets as hfds
    import numpy as np
    from PIL import Image

    from ralf_tpu.data.dataset import IMAGE_H, IMAGE_W
    from ralf_tpu.preprocess.readers import load_split_mapping, read_cgl, read_pku

    reader = read_pku if args.dataset_type == "pku" else read_cgl
    samples = reader(args.dataset_root, args.max_seq_length)
    mapping = load_split_mapping(args.splits_dir)

    per_split = defaultdict(list)
    vocab: dict[str, int] = defaultdict(int)
    for s in samples:
        ident = s["identifier"]
        if ident not in mapping and ident.endswith(".jpg"):
            ident = ident.replace(".jpg", ".png")
        if ident not in mapping:
            continue
        split = mapping[ident]
        base = os.path.join(args.dataset_root, "image", s["split"])
        img = Image.open(os.path.join(base, "input", f"{s['id']}.png")).convert("RGB")
        sal = np.asarray(
            Image.open(os.path.join(base, "saliency", f"{s['id']}.png")).convert("L")
        )
        sal_sub_path = os.path.join(base, "saliency_sub", f"{s['id']}.png")
        if os.path.exists(sal_sub_path):
            sal = np.maximum(
                sal, np.asarray(Image.open(sal_sub_path).convert("L"))
            )
        record = {
            "id": s["id"],
            "image_width": s["image_width"],
            "image_height": s["image_height"],
            "image": img.resize((IMAGE_W, IMAGE_H)),
            "saliency": Image.fromarray(sal).resize((IMAGE_W, IMAGE_H)),
            "label": [e["label"] for e in s["elements"]],
            "center_x": [e["center_x"] for e in s["elements"]],
            "center_y": [e["center_y"] for e in s["elements"]],
            "width": [e["width"] for e in s["elements"]],
            "height": [e["height"] for e in s["elements"]],
        }
        for lab in record["label"]:
            vocab[lab] += 1
        per_split[split].append(record)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "vocabulary.json"), "w") as f:
        json.dump({"label": dict(vocab)}, f)

    names = sorted(vocab)
    for split, records in per_split.items():
        for r in records:
            r["label"] = [names.index(x) for x in r["label"]]
        ds = hfds.Dataset.from_list(records)
        out = os.path.join(args.output_dir, split)
        os.makedirs(out, exist_ok=True)
        shards = args.num_shards if split == "train" else 1
        for i in range(shards):
            shard = ds if shards == 1 else ds.shard(shards, i)
            shard.to_parquet(
                os.path.join(out, f"{split}-{i:05d}-of-{shards:05d}.parquet")
            )
        logging.info("%s: %d records", split, len(records))


if __name__ == "__main__":
    main()
