"""Image-side evaluation features: image-FID and R_shm.

Parity targets:
  * `metric.py:644-700` SingletonTimmInceptionV3 — InceptionV3 features of
    layout-masked canvases; computed per run, though the reported FID is
    the layout-feature one (`eval.py:450`).
  * `metric.py:703-743` compute_rshm — L2 distance between a pretrained
    VGG16's logits on the original vs layout-masked canvas.

Both towers are flax ports running fully on-device (models/towers.py:
`inception` for image-FID, `vgg` for R_shm); `tower_feature_fn` builds a
jitted extractor, loading pretrained weights from the cache dir when a
checkpoint exists and falling back to a loudly-warned random
initialization otherwise (this environment cannot download weights —
the converters in utils/torch_port stand ready for real checkpoints).
The functions below also accept any custom
`feature_fn(images [B,H,W,3]) -> [B,D]`.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ralf_tpu.core.layout import Layout
from ralf_tpu.eval.metrics import compute_generative_model_scores
from ralf_tpu.eval.visualizer import mask_out_bbox_area


def tower_feature_fn(kind: str, cache_dir: str = "cache",
                     batch_size: int = 64) -> Callable:
    """Batched on-device feature extractor for `inception` (image-FID,
    `metric.py:644-700`) or `vgg` (R_shm, `metric.py:607-643`)."""
    from ralf_tpu.models.towers import build_feature_fn

    jitted = build_feature_fn(kind, cache_dir)

    def fn(images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32)
        out = [
            np.asarray(jitted(x[s:s + batch_size]))
            for s in range(0, len(x), batch_size)
        ]
        return np.concatenate(out, 0)

    return fn


def masked_features(
    layout: Layout, images: np.ndarray, feature_fn: Callable
) -> np.ndarray:
    """Features of layout-masked canvases — the chunkable unit of
    image-FID (cli/evaluate streams canvases through this EB at a time)."""
    return np.asarray(feature_fn(mask_out_bbox_area(layout, images)))


def compute_image_fid(
    gt_layout: Layout,
    pred_layout: Layout,
    images: np.ndarray,
    feature_fn: Callable,
) -> dict[str, float]:
    """FID between InceptionV3-style features of GT-masked vs pred-masked
    canvases (`eval.py:126-181`)."""
    feats_real = masked_features(gt_layout, images, feature_fn)
    feats_fake = masked_features(pred_layout, images, feature_fn)
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
