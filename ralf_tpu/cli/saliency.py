"""Saliency map builder (offline stage 2).

Reference equivalent: `image2layout/hfds_builder/saliency_detection.py`:
ISNet at 1024^2 -> `saliency/*.png`, BASNet at 256^2 -> `saliency_sub/*.png`
(the dataset dump combines them by pixel max).

    python -m ralf_tpu.cli.saliency --model isnet \
        --input-dir .../image/train/input --output-dir .../image/train/saliency \
        [--weights isnet.ckpt]

--weights accepts either a flax/orbax checkpoint dir or the released
torch .pth files (isnet-general-use.pth / gdi-basnet.pth) — those are
converted on load via convert_{isnet,basnet}_state_dict (parity pinned by
tests/test_saliency_parity.py).  Without weights the maps come from
randomly initialized nets — fine for pipeline smoke tests, not for real
dataset builds (the .pth files are download-only; zero-egress images
can't fetch them).
"""

from __future__ import annotations

import argparse
import glob
import logging
import os


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["isnet", "basnet"], default="isnet")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ralf_tpu.preprocess.saliency_models import (
        BASNet,
        ISNetDIS,
        basnet_preprocess,
        convert_basnet_state_dict,
        convert_isnet_state_dict,
        isnet_preprocess,
    )

    size = 1024 if args.model == "isnet" else 256
    net = ISNetDIS() if args.model == "isnet" else BASNet()
    preprocess = isnet_preprocess if args.model == "isnet" else basnet_preprocess
    if args.weights and os.path.exists(args.weights):
        if args.weights.endswith((".pth", ".pt")):  # released torch weights
            import torch

            sd = torch.load(args.weights, map_location="cpu")
            if not isinstance(sd, dict) or "state_dict" in sd:
                sd = sd.get("state_dict", sd)
            convert = (convert_isnet_state_dict if args.model == "isnet"
                       else convert_basnet_state_dict)
            variables = convert(sd)
        else:
            import orbax.checkpoint as ocp

            variables = jax.jit(net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
            )
            variables = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.weights), jax.device_get(variables)
            )
    else:
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
        )
        logging.warning("running with UNTRAINED %s weights", args.model)

    fwd = jax.jit(lambda v, x: net.apply(v, x))
    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.png")))
    for s in range(0, len(paths), args.batch_size):
        chunk = paths[s : s + args.batch_size]
        imgs, shapes = [], []
        for path in chunk:
            im = Image.open(path).convert("RGB")
            shapes.append(im.size)
            imgs.append(np.asarray(im.resize((size, size)), np.float32) / 255.0)
        sal = np.asarray(fwd(variables, jnp.asarray(preprocess(np.stack(imgs)))))
        sal = (sal - sal.min((1, 2), keepdims=True)) / np.maximum(
            sal.max((1, 2), keepdims=True) - sal.min((1, 2), keepdims=True), 1e-8
        )
        for path, m, wh in zip(chunk, sal, shapes):
            out = Image.fromarray((m * 255).astype(np.uint8)).resize(wh)
            out.save(os.path.join(args.output_dir, os.path.basename(path)))
    logging.info("wrote %d maps", len(paths))


if __name__ == "__main__":
    main()
