"""Saliency map builder (offline stage 2).

Reference equivalent: `image2layout/hfds_builder/saliency_detection.py`:
ISNet at 1024^2 -> `saliency/*.png`, BASNet at 256^2 -> `saliency_sub/*.png`
(the dataset dump combines them by pixel max).

    python -m ralf_tpu.cli.saliency --model isnet \
        --input-dir .../image/train/input --output-dir .../image/train/saliency \
        [--weights isnet.ckpt]

Without ported weights the maps come from randomly initialized nets —
fine for pipeline smoke tests, not for real dataset builds (weights are
download-only; see utils/torch_port for the conversion hooks).
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

    from ralf_tpu.preprocess.saliency_models import BASNet, ISNetDIS

    size = 1024 if args.model == "isnet" else 256
    net = ISNetDIS() if args.model == "isnet" else BASNet()
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    if args.weights and os.path.exists(args.weights):
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.weights), jax.device_get(variables)
        )
    else:
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
        sal = np.asarray(fwd(variables, jnp.asarray(np.stack(imgs))))
        sal = (sal - sal.min((1, 2), keepdims=True)) / np.maximum(
            sal.max((1, 2), keepdims=True) - sal.min((1, 2), keepdims=True), 1e-8
        )
        for path, m, wh in zip(chunk, sal, shapes):
            out = Image.fromarray((m * 255).astype(np.uint8)).resize(wh)
            out.save(os.path.join(args.output_dir, os.path.basename(path)))
    logging.info("wrote %d maps", len(paths))


if __name__ == "__main__":
    main()
