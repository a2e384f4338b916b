"""Inpainting stage of the offline dataset builder.

Reference equivalent: `image2layout/hfds_builder/inpainting.py` +
`models/inpainting.py` — removes the GT layout elements from train
posters with the TorchScript big-lama model; the inpaint mask is the
dilated union of the GT boxes.

The mask construction is reimplemented here in numpy (no OpenCV).  The
LaMa network itself ships only as a downloadable TorchScript binary
(`big-lama.pt`, `models/inpainting.py:15-40`); when that file exists on
disk we run it through torch (a one-time CPU preprocessing step outside
the TPU framework proper — SURVEY §2.9), otherwise `inpaint` raises with
instructions.
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
            lama_path: str = "cache/big-lama.pt") -> np.ndarray:
    """[B, H, W, 3] uint8/float + [B, H, W] masks -> inpainted images."""
    if not os.path.exists(lama_path):
        raise FileNotFoundError(
            f"LaMa TorchScript model not found at {lama_path}. Download "
            "big-lama.pt (see the reference README) and pass its path; "
            "inpainting is a one-time offline preprocessing step."
        )
    import torch

    model = torch.jit.load(lama_path, map_location="cpu").eval()
    imgs = np.asarray(images, np.float32)
    if imgs.max() > 1.0:
        imgs = imgs / 255.0
    out = []
    with torch.no_grad():
        for img, msk in zip(imgs, masks):
            ti = torch.tensor(img.transpose(2, 0, 1))[None]
            tm = torch.tensor((msk > 127).astype(np.float32))[None, None]
            res = model(ti, tm)[0].numpy().transpose(1, 2, 0)
            out.append(res)
    return np.stack(out)
