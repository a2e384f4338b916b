"""Layout rendering utilities.

Parity target: `image2layout/train/helpers/visualizer.py`: translucent
per-class boxes composited over the canvas (`:60-88`), grid montage
(`:91-142`), and `mask_out_bbox_area` (`:147-177`) used to compute
image-FID features on layout-masked canvases.

Pure numpy rasterization — these feed TensorBoard-style logging and the
image-FID mask, not the training hot path.
"""

from __future__ import annotations

import numpy as np

from ralf_tpu.core.layout import Layout

# per-class RGBA palette (text, logo, underlay, embellishment, ...)
PALETTE = np.asarray(
    [
        (0.298, 0.447, 0.690),
        (0.866, 0.517, 0.321),
        (0.333, 0.658, 0.407),
        (0.768, 0.305, 0.321),
        (0.505, 0.447, 0.698),
    ],
    np.float32,
)


def render_layout(
    layout: Layout, images: np.ndarray, alpha: float = 0.5, border: int = 2
) -> np.ndarray:
    """[B, H, W, >=3] canvases + layouts -> [B, H, W, 3] rendered posters."""
    imgs = np.asarray(images)[..., :3].copy()
    B, H, W = imgs.shape[:3]
    lab = np.asarray(layout.label)
    mask = np.asarray(layout.mask)
    l = np.clip((np.asarray(layout.center_x) - np.asarray(layout.width) / 2) * W, 0, W)
    r = np.clip((np.asarray(layout.center_x) + np.asarray(layout.width) / 2) * W, 0, W)
    t = np.clip((np.asarray(layout.center_y) - np.asarray(layout.height) / 2) * H, 0, H)
    b = np.clip((np.asarray(layout.center_y) + np.asarray(layout.height) / 2) * H, 0, H)
    l, r, t, b = (np.round(x).astype(int) for x in (l, r, t, b))
    for i in range(B):
        for e in range(lab.shape[1]):
            if not mask[i, e] or r[i, e] <= l[i, e] or b[i, e] <= t[i, e]:
                continue
            color = PALETTE[lab[i, e] % len(PALETTE)]
            region = imgs[i, t[i, e] : b[i, e], l[i, e] : r[i, e]]
            imgs[i, t[i, e] : b[i, e], l[i, e] : r[i, e]] = (
                (1 - alpha) * region + alpha * color
            )
            # opaque border
            bb = border
            imgs[i, t[i, e] : b[i, e], l[i, e] : l[i, e] + bb] = color
            imgs[i, t[i, e] : b[i, e], max(r[i, e] - bb, 0) : r[i, e]] = color
            imgs[i, t[i, e] : t[i, e] + bb, l[i, e] : r[i, e]] = color
            imgs[i, max(b[i, e] - bb, 0) : b[i, e], l[i, e] : r[i, e]] = color
    return np.clip(imgs, 0, 1)


def montage(images: np.ndarray, ncols: int = 4, pad: int = 2) -> np.ndarray:
    """[N, H, W, 3] -> one grid image."""
    imgs = np.asarray(images)
    N, H, W, C = imgs.shape
    nrows = (N + ncols - 1) // ncols
    out = np.ones((nrows * (H + pad) - pad, ncols * (W + pad) - pad, C), imgs.dtype)
    for i in range(N):
        rr, cc = divmod(i, ncols)
        out[rr * (H + pad) : rr * (H + pad) + H, cc * (W + pad) : cc * (W + pad) + W] = imgs[i]
    return out


def mask_out_bbox_area(layout: Layout, images: np.ndarray,
                       fill: float = 0.5) -> np.ndarray:
    """Gray-fill every layout box on the canvas (`visualizer.py:147-177`) —
    the input to the image-FID feature extractor."""
    imgs = np.asarray(images)[..., :3].copy()
    B, H, W = imgs.shape[:3]
    mask = np.asarray(layout.mask)
    l = np.round(np.clip((np.asarray(layout.center_x) - np.asarray(layout.width) / 2), 0, 1) * W).astype(int)
    r = np.round(np.clip((np.asarray(layout.center_x) + np.asarray(layout.width) / 2), 0, 1) * W).astype(int)
    t = np.round(np.clip((np.asarray(layout.center_y) - np.asarray(layout.height) / 2), 0, 1) * H).astype(int)
    b = np.round(np.clip((np.asarray(layout.center_y) + np.asarray(layout.height) / 2), 0, 1) * H).astype(int)
    for i in range(B):
        for e in range(mask.shape[1]):
            if mask[i, e]:
                imgs[i, t[i, e] : b[i, e], l[i, e] : r[i, e]] = fill
    return imgs
