"""Image-side evaluation features: image-FID and R_shm.

Parity targets:
  * `metric.py:644-700` SingletonTimmInceptionV3 — InceptionV3 features of
    layout-masked canvases; computed per run, though the reported FID is
    the layout-feature one (`eval.py:450`).
  * `metric.py:703-743` compute_rshm — L2 distance between a pretrained
    VGG16's logits on the original vs layout-masked canvas.

Both depend on pretrained torch networks that are download-only.  The
implementations here take any `feature_fn(images [B,H,W,3]) -> [B,D]`
(e.g. a TorchScript export run on host CPU via
`retrieval.retriever._torch_embedder`, or a flax port once weights are on
disk); `torch_feature_fn` builds one from a cache/*.pt file.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ralf_tpu.core.layout import Layout
from ralf_tpu.eval.metrics import compute_generative_model_scores
from ralf_tpu.eval.visualizer import mask_out_bbox_area


def torch_feature_fn(kind: str) -> Callable:
    """TorchScript feature extractor from cache/{kind}.pt (host CPU)."""
    path = f"cache/{kind}.pt"
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{kind} weights not found at {path}; image-side metrics need "
            "the pretrained network (download-only — see README status)."
        )
    import torch

    model = torch.jit.load(path, map_location="cpu").eval()

    def fn(images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32)[..., :3].transpose(0, 3, 1, 2)
        with torch.no_grad():
            return model(torch.tensor(x)).numpy()

    return fn


def compute_image_fid(
    gt_layout: Layout,
    pred_layout: Layout,
    images: np.ndarray,
    feature_fn: Callable,
) -> dict[str, float]:
    """FID between InceptionV3-style features of GT-masked vs pred-masked
    canvases (`eval.py:126-181`)."""
    feats_real = feature_fn(mask_out_bbox_area(gt_layout, images))
    feats_fake = feature_fn(mask_out_bbox_area(pred_layout, images))
    out = compute_generative_model_scores(feats_real, feats_fake)
    return {f"image_{k}": v for k, v in out.items()}


def compute_rshm(
    layout: Layout, images: np.ndarray, feature_fn: Callable
) -> np.ndarray:
    """Per-sample L2 between features of the canvas and its layout-masked
    version (`metric.py:703-743`); higher = layout occludes salient
    content more."""
    f_img = feature_fn(np.asarray(images)[..., :3])
    f_masked = feature_fn(mask_out_bbox_area(layout, images))
    return np.sqrt(((f_img - f_masked) ** 2).sum(-1))
