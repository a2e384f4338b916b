"""Inpainting stage of the offline dataset builder.

Reference equivalent: `image2layout/hfds_builder/inpainting.py` +
`models/inpainting.py` — removes the GT layout elements from train
posters with the big-lama model; the inpaint mask is the dilated union
of the GT boxes.

The mask construction is reimplemented here in numpy (no OpenCV).  The
LaMa FFC generator itself is a native jax module (`preprocess/lama.py`)
that runs batched on the TPU; the released `big-lama.pt` TorchScript
binary is used only as a weight container (torch loads it on the host,
`convert_lama_state_dict` maps it — parity pinned by tests/test_lama.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ralf_tpu.core.layout import Layout


def box_union_mask(layout: Layout, height: int, width: int,
                   dilate: int = 9) -> np.ndarray:
    """Dilated union of GT boxes, uint8 [B, H, W] in {0, 255}
    (`hfds_builder/inpainting.py:88-129`)."""
    mask = np.zeros((np.asarray(layout.label).shape[0], height, width), np.uint8)
    m = np.asarray(layout.mask)
    l = np.clip((np.asarray(layout.center_x) - np.asarray(layout.width) / 2) * width, 0, width)
    r = np.clip((np.asarray(layout.center_x) + np.asarray(layout.width) / 2) * width, 0, width)
    t = np.clip((np.asarray(layout.center_y) - np.asarray(layout.height) / 2) * height, 0, height)
    b = np.clip((np.asarray(layout.center_y) + np.asarray(layout.height) / 2) * height, 0, height)
    l, r, t, b = (np.round(x).astype(int) for x in (l, r, t, b))
    for i in range(mask.shape[0]):
        for e in range(m.shape[1]):
            if m[i, e]:
                mask[i, max(t[i, e] - dilate, 0) : b[i, e] + dilate,
                     max(l[i, e] - dilate, 0) : r[i, e] + dilate] = 255
    return mask


def inpaint(images: np.ndarray, masks: np.ndarray,
            lama_path: str = "cache/big-lama.pt",
            batch_size: int = 8) -> np.ndarray:
    """[B, H, W, 3] uint8/float images + [B, H, W] {0,255} masks ->
    inpainted float images in [0, 1].

    Runs the jax FFC generator batched on the accelerator (the reference
    loops one sample at a time through TorchScript on the host,
    `models/inpainting.py:41-58`).  Inputs are padded to a multiple of 8
    (`prepare_img_and_mask`) and cropped back.
    """
    if not os.path.exists(lama_path):
        raise FileNotFoundError(
            f"LaMa weights not found at {lama_path}. Download big-lama.pt "
            "(see the reference README) and pass its path; inpainting is a "
            "one-time offline preprocessing step."
        )
    from ralf_tpu.preprocess.lama import (
        infer_config,
        lama_forward,
        load_lama_params,
        pad_to_modulo,
    )

    params = load_lama_params(lama_path)
    cfg = infer_config(params)
    imgs = np.asarray(images, np.float32)
    if imgs.max() > 1.0:
        imgs = imgs / 255.0
    msk = (np.asarray(masks) > 127).astype(np.float32)[..., None]
    imgs_p, (H, W) = pad_to_modulo(imgs)
    msk_p, _ = pad_to_modulo(msk)
    out = []
    for s in range(0, imgs_p.shape[0], batch_size):
        res = lama_forward(params, imgs_p[s : s + batch_size],
                           msk_p[s : s + batch_size], cfg)
        out.append(np.asarray(res, np.float32))
    return np.concatenate(out)[:, :H, :W]
