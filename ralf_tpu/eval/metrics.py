"""Layout quality metrics, vmapped jnp — the full eval contract.

Parity targets (`image2layout/train/helpers/metric.py`):
  * alignment (LayoutGAN++)            `metric.py:78-127`
  * overlap (LayoutGAN++)              `metric.py:130-186`
  * overlay (PosterLayout)             `metric.py:376-416`
  * underlay effectiveness loose/strict `metric.py:419-501`
  * utilization / occlusion / unreadability `metric.py:515-585`
  * validity (area > 0.1% canvas)      `metric.py:342-373`

TPU redesign: every metric is a batched, statically shaped jnp function
over padded [B, S] layouts + [B, H, W, *] images — no per-layout Python
loops, no multiprocessing pool (`metric.py:311-333`), one jit per metric.
Box rasterization uses rounded-integer pixel-index comparisons to mirror
the reference's `canvas[t:b, l:r] = 1` semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.layout import Layout


def _coords(layout: Layout, validate: bool = True):
    """(xl, xc, xr, yt, yc, yb), optionally clamped to the canvas."""
    xl = layout.center_x - layout.width / 2.0
    xr = layout.center_x + layout.width / 2.0
    yt = layout.center_y - layout.height / 2.0
    yb = layout.center_y + layout.height / 2.0
    if validate:
        xl, xr = jnp.maximum(xl, 0.0), jnp.minimum(xr, 1.0)
        yt, yb = jnp.maximum(yt, 0.0), jnp.minimum(yb, 1.0)
    return xl, layout.center_x, xr, yt, layout.center_y, yb


@jax.jit
def compute_alignment(layout: Layout) -> jax.Array:
    """alignment-LayoutGAN++ per sample [B]: -log10(1 - min edge delta)."""
    xl, xc, xr, yt, yc, yb = _coords(layout)
    mask = layout.mask
    B, S = mask.shape
    X = jnp.stack([xl, xc, xr, yt, yc, yb], axis=1)  # [B, 6, S]
    D = jnp.abs(X[:, :, :, None] - X[:, :, None, :])  # [B, 6, S, S]
    eye = jnp.eye(S, dtype=bool)
    D = jnp.where(eye[None, None], 1.0, D)
    D = jnp.transpose(D, (0, 2, 1, 3))  # [B, S, 6, S]
    D = jnp.where(mask[:, :, None, None], D, 1.0)
    # min over both the axis and the other-element dims
    m = jnp.min(D, axis=(2, 3))  # [B, S]
    m = jnp.where(m == 1.0, 0.0, m)
    score = jnp.sum(-jnp.log10(1.0 - m), axis=1)
    n = jnp.sum(mask, axis=1)
    return jnp.where(n > 0, score / jnp.maximum(n, 1), 0.0)


@jax.jit
def compute_overlap(layout: Layout) -> jax.Array:
    """overlap-LayoutGAN++ per sample [B]: sum of pairwise ai/a1 ratios / n."""
    layout = layout.clean_padding()
    mask = layout.mask
    B, S = mask.shape
    xl, _, xr, yt, _, yb = _coords(layout)
    l1, r1, t1, b1 = xl[:, :, None], xr[:, :, None], yt[:, :, None], yb[:, :, None]
    l2, r2, t2, b2 = xl[:, None, :], xr[:, None, :], yt[:, None, :], yb[:, None, :]
    a1 = (r1 - l1) * (b1 - t1)  # [B, S, 1]
    lm, rm = jnp.maximum(l1, l2), jnp.minimum(r1, r2)
    tm, bm = jnp.maximum(t1, t2), jnp.minimum(b1, b2)
    inter = jnp.where((lm < rm) & (tm < bm), (rm - lm) * (bm - tm), 0.0)
    pair_ok = mask[:, :, None] & mask[:, None, :] & ~jnp.eye(S, dtype=bool)[None]
    inter = jnp.where(pair_ok, inter, 0.0)
    ratio = jnp.where(a1 > 0, inter / jnp.where(a1 > 0, a1, 1.0), 0.0)
    score = jnp.sum(ratio, axis=(1, 2))
    n = jnp.sum(mask, axis=1)
    return jnp.where(n > 0, score / jnp.maximum(n, 1), 0.0)


def _pairwise_iou_terms(layout: Layout):
    """(inter, a1, a2) with clamped boxes, [B, S, S] (i rows, j cols)."""
    xl, _, xr, yt, _, yb = _coords(layout)
    l1, r1, t1, b1 = xl[:, :, None], xr[:, :, None], yt[:, :, None], yb[:, :, None]
    l2, r2, t2, b2 = xl[:, None, :], xr[:, None, :], yt[:, None, :], yb[:, None, :]
    a1 = (r1 - l1) * (b1 - t1)
    a2 = (r2 - l2) * (b2 - t2)
    lm, rm = jnp.maximum(l1, l2), jnp.minimum(r1, r2)
    tm, bm = jnp.maximum(t1, t2), jnp.minimum(b1, b2)
    inter = jnp.where((lm < rm) & (tm < bm), (rm - lm) * (bm - tm), 0.0)
    return inter, jnp.broadcast_to(a1, inter.shape), jnp.broadcast_to(a2, inter.shape)


@functools.partial(jax.jit, static_argnames=("underlay_id",))
def compute_overlay(layout: Layout, underlay_id: int) -> jax.Array:
    """PosterLayout overlay per sample [B]: mean pairwise IoU over valid
    non-underlay elements; NaN (reference: None) when fewer than 2."""
    keep = layout.mask & (layout.label != underlay_id)
    inter, a1, a2 = _pairwise_iou_terms(layout)
    union = a1 + a2 - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    S = keep.shape[1]
    pair_ok = keep[:, :, None] & keep[:, None, :] & ~jnp.eye(S, dtype=bool)[None]
    n_pairs = jnp.sum(pair_ok, axis=(1, 2))
    mean_iou = jnp.sum(jnp.where(pair_ok, iou, 0.0), axis=(1, 2)) / jnp.maximum(
        n_pairs, 1
    )
    return jnp.where(n_pairs > 0, mean_iou, jnp.nan)


@functools.partial(jax.jit, static_argnames=("underlay_id",))
def compute_underlay_effectiveness(layout: Layout, underlay_id: int):
    """loose = mean over underlays of max ai/a2 against non-underlay
    elements; strict = mean of [any element fully inside].  NaN when the
    sample has no underlay or <2 elements."""
    mask = layout.mask
    S = mask.shape[1]
    is_under = mask & (layout.label == underlay_id)
    inter, a1, a2 = _pairwise_iou_terms(layout)
    # score of pair (i=underlay, j=any valid element not underlay)
    ratio = jnp.where(a2 > 0, inter / jnp.where(a2 > 0, a2, 1.0), 0.0)
    pair_ok = (
        is_under[:, :, None]
        & mask[:, None, :]
        & ~is_under[:, None, :]
        & ~jnp.eye(S, dtype=bool)[None]
    )
    neg = jnp.where(pair_ok, ratio, -jnp.inf)
    best = jnp.max(neg, axis=2)  # [B, S] per-underlay best ai/a2
    has_pair = jnp.any(pair_ok, axis=2)
    loose_i = jnp.where(has_pair, best, 0.0)
    thresh = 1.0 - jnp.finfo(jnp.float32).eps
    strict_i = jnp.where(has_pair, (best >= thresh).astype(jnp.float32), 0.0)

    n_elem = jnp.sum(mask, axis=1)
    n_under = jnp.sum(is_under, axis=1)
    denom = jnp.maximum(n_under, 1)
    loose = jnp.sum(jnp.where(is_under, loose_i, 0.0), axis=1) / denom
    strict = jnp.sum(jnp.where(is_under, strict_i, 0.0), axis=1) / denom
    valid = (n_under > 0) & (n_elem >= 2)
    return {
        "underlay_effectiveness_loose": jnp.where(valid, loose, jnp.nan),
        "underlay_effectiveness_strict": jnp.where(valid, strict, jnp.nan),
    }


@jax.jit
def compute_validity(layout: Layout, thresh: float = 1e-3):
    """(filtered_layout, validity_ratio): drop elements with area <= 0.1%
    of the canvas (`metric.py:342-373`)."""
    ok = layout.mask & (layout.width * layout.height > thresh)
    total = jnp.sum(layout.mask)
    ratio = jnp.where(total > 0, jnp.sum(ok) / jnp.maximum(total, 1), 1.0)
    filtered = Layout(
        label=jnp.where(ok, layout.label, 0),
        center_x=jnp.where(ok, layout.center_x, 0.0),
        center_y=jnp.where(ok, layout.center_y, 0.0),
        width=jnp.where(ok, layout.width, 0.0),
        height=jnp.where(ok, layout.height, 0.0),
        mask=ok,
    )
    return filtered, ratio


def _pixel_box_mask(layout: Layout, H: int, W: int, keep: jax.Array) -> jax.Array:
    """[B, H, W] union raster of kept boxes, reference `canvas[t:b, l:r]`
    semantics (rounded integer bounds, half-open)."""
    xl, _, xr, yt, _, yb = _coords(layout)
    l = jnp.round(xl * W).astype(jnp.int32)
    r = jnp.round(xr * W).astype(jnp.int32)
    t = jnp.round(yt * H).astype(jnp.int32)
    b = jnp.round(yb * H).astype(jnp.int32)
    ys = jnp.arange(H)[None, None, :, None]  # [1,1,H,1]
    xs = jnp.arange(W)[None, None, None, :]  # [1,1,1,W]
    inside = (
        (ys >= t[:, :, None, None])
        & (ys < b[:, :, None, None])
        & (xs >= l[:, :, None, None])
        & (xs < r[:, :, None, None])
    )
    inside &= keep[:, :, None, None]
    return jnp.any(inside, axis=1)


def sobel_gradient_map(images: jax.Array) -> jax.Array:
    """[B, H, W, 3] RGB in [0,1] -> [B, H, W] normalized gradient magnitude
    (cv2-equivalent Sobel on the BT.601 gray image, `metric.py:504-512`)."""
    gray = (
        0.299 * images[..., 0] + 0.587 * images[..., 1] + 0.114 * images[..., 2]
    ) * 255.0
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    g = gray[:, None]  # [B, 1, H, W]
    pad = [(0, 0), (0, 0), (1, 1), (1, 1)]
    gp = jnp.pad(g, pad, mode="edge")  # cv2 default BORDER_REFLECT_101 approx
    gx = jax.lax.conv(gp, kx[None, None], (1, 1), "VALID")
    gy = jax.lax.conv(gp, ky[None, None], (1, 1), "VALID")
    mag = jnp.sqrt((gx**2 + gy**2) / 2.0)[:, 0]
    peak = jnp.max(mag, axis=(1, 2), keepdims=True)
    return mag / jnp.maximum(peak, 1e-8)


@functools.partial(jax.jit, static_argnames=("text_id", "underlay_id"))
def compute_saliency_aware_metrics(
    layout: Layout,
    images: jax.Array,  # [B, H, W, 4] RGB + saliency
    text_id: int,
    underlay_id: int,
):
    saliency = images[..., 3]
    B, H, W = saliency.shape
    box = _pixel_box_mask(layout, H, W, layout.mask)  # [B, H, W]

    inv = 1.0 - saliency
    utilization = jnp.sum(inv * box, axis=(1, 2)) / jnp.maximum(
        jnp.sum(inv, axis=(1, 2)), 1e-8
    )

    box_area = jnp.sum(box, axis=(1, 2))
    occlusion = jnp.where(
        box_area > 0,
        jnp.sum(saliency * box, axis=(1, 2)) / jnp.maximum(box_area, 1),
        0.0,
    )

    text_mask = _pixel_box_mask(layout, H, W, layout.mask & (layout.label == text_id))
    under_mask = _pixel_box_mask(
        layout, H, W, layout.mask & (layout.label == underlay_id)
    )
    special = text_mask & ~under_mask
    grad = sobel_gradient_map(images[..., :3])
    sp_area = jnp.sum(special, axis=(1, 2))
    unread = jnp.where(
        sp_area > 0,
        jnp.sum(grad * special, axis=(1, 2)) / jnp.maximum(sp_area, 1),
        0.0,
    )
    return {
        "utilization": utilization,
        "occlusion": occlusion,
        "unreadability": unread,
    }


# --------------------------------------------------------------------------
# distribution metrics: FID + precision/recall/density/coverage
# --------------------------------------------------------------------------


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets (numpy; sqrtm via eigendecomposition of
    sigma_a @ sigma_b, equivalent to pytorch_fid's scipy.sqrtm path)."""
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    sa = np.cov(feats_a, rowvar=False)
    sb = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    # tr(sqrtm(sa @ sb)) = sum of sqrt eigenvalues of sa @ sb
    eigs = np.linalg.eigvals(sa @ sb)
    eigs = np.where(np.real(eigs) > 0, eigs, 0.0)
    covmean_trace = np.sum(np.sqrt(eigs)).real
    return float(diff @ diff + np.trace(sa) + np.trace(sb) - 2.0 * covmean_trace)


def compute_prdc(
    real: np.ndarray, fake: np.ndarray, nearest_k: int = 5
) -> dict[str, float]:
    """precision/recall/density/coverage (Naeem et al. 2020), numpy."""

    def pairwise(a, b):
        return np.sqrt(
            np.maximum(
                (a**2).sum(1)[:, None] + (b**2).sum(1)[None] - 2 * a @ b.T, 0.0
            )
        )

    def kth_radius(x, k):
        d = pairwise(x, x)
        return np.sort(d, axis=1)[:, k]  # exclude self at col 0

    r_real = kth_radius(real, nearest_k)
    r_fake = kth_radius(fake, nearest_k)
    d_rf = pairwise(real, fake)

    precision = float((d_rf < r_real[:, None]).any(axis=0).mean())
    recall = float((d_rf < r_fake[None, :]).any(axis=1).mean())
    density = float(
        (1.0 / nearest_k) * (d_rf < r_real[:, None]).sum(axis=0).mean()
    )
    coverage = float((d_rf.min(axis=1) < r_real).mean())
    return {
        "precision": precision,
        "recall": recall,
        "density": density,
        "coverage": coverage,
    }


def compute_generative_model_scores(
    feats_real: np.ndarray, feats_fake: np.ndarray, nearest_k: int = 5
) -> dict[str, float]:
    """FID + prdc bundle (`metric.py:35-58`)."""
    out = compute_prdc(feats_real, feats_fake, nearest_k)
    out["fid"] = frechet_distance(feats_real, feats_fake)
    return out


def nanmean(values: jax.Array) -> float:
    """Reference aggregation: metrics returning None per layout are simply
    dropped before averaging (`run_parallel`, `metric.py:311-333`)."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    return float(v.mean()) if v.size else float("nan")
