"""Shared GAN infrastructure: packed layouts, DETR-style matching losses,
straight-through argmax, IoU-aware reordering.

Parity targets (`image2layout/train/models/common_gan/`):
  * `layout_initializer.py` — packed [B, S, 2, K] layout tensors (one-hot
    class row + box row, K = num_classes + no-object; CGL pads boxes to 5),
    gaussian random init layouts with class-frequency coefs
  * `rec_loss.py:18-230`   — HungarianMatcher (2/5/2 costs) + SetCriterion
    (weighted CE + L1 + gIoU over matched pairs)
  * `argmax.py`            — straight-through ArgMax (+ reorder variant)
  * `design_seq.py:31-137` — IoU-grouping element reorder (underlay
    'deco' groups pulled next to their contents)

TPU redesign: matching costs are computed on device ([B, S, S] batched)
and the assignment itself is solved ON DEVICE by the jittable exact
Jonker-Volgenant solver (`ops/assignment.batched_lsa`) — the axon TPU
runtime does not support host callbacks at all, so the earlier
pure_callback->scipy route crashed GAN training on real hardware; the
reference runs the whole criterion on host per batch element.  The
straight-through argmax is a `jax.custom_vjp` with identity backward.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.layout import Layout

# class-frequency priors for random class init (`dsgan.py:86-90`)
DS_COEF = {4: (0.8, 1.0, 1.0, 0.1), 5: (0.8, 0.8, 1.0, 1.0, 0.1)}


# --------------------------------------------------------------------------
# packed layout representation
# --------------------------------------------------------------------------


def pack_layout(layout: Layout, num_classes_total: int) -> jax.Array:
    """Layout -> packed [B, S, 2, K]: row 0 one-hot class (pads = the
    no-object class K-1), row 1 cxcywh boxes zero-padded to K."""
    K = num_classes_total
    label = jnp.where(layout.mask, layout.label, K - 1)
    cls = jax.nn.one_hot(label, K)
    box = jnp.stack(
        [layout.center_x, layout.center_y, layout.width, layout.height], axis=-1
    )
    box = jnp.pad(box, ((0, 0), (0, 0), (0, K - 4)))
    return jnp.stack([cls, box], axis=2)


def unpack_outputs(pred_logits: jax.Array, pred_boxes: jax.Array,
                   num_classes_total: int) -> Layout:
    """Model heads -> Layout; the no-object class empties an element
    (`common_gan/base_model.py:189-203`)."""
    label = jnp.argmax(pred_logits, axis=-1)
    mask = label != (num_classes_total - 1)
    b = pred_boxes[..., :4]
    return Layout(
        label=jnp.where(mask, label, 0).astype(jnp.int32),
        center_x=jnp.where(mask, b[..., 0], 0.0),
        center_y=jnp.where(mask, b[..., 1], 0.0),
        width=jnp.where(mask, b[..., 2], 0.0),
        height=jnp.where(mask, b[..., 3], 0.0),
        mask=mask,
    )


def random_init_layout(rng: np.random.Generator, batch: int, S: int, K: int,
                       coef: Optional[tuple] = None,
                       n_elements: Optional[np.ndarray] = None) -> np.ndarray:
    """Gaussian random packed layout (`layout_initializer.py:128-168`):
    class ~ coef prior, box from N(0.5, 0.15) xyxy corners -> cxcywh.

    `n_elements` ([batch] ints in [1, S], e.g. from
    core.seq_length.SeqLengthDistribution) pins the element count of each
    init: positions >= n start as the no-object class (K-1)."""
    coef = np.asarray(coef if coef is not None else [1.0] * K, np.float64)
    cls_idx = rng.choice(K, size=(batch, S), p=coef / coef.sum())
    if n_elements is not None:
        beyond = np.arange(S)[None, :] >= np.asarray(n_elements)[:, None]
        cls_idx = np.where(beyond, K - 1, cls_idx)
    cls = np.eye(K, dtype=np.float32)[cls_idx]
    xyxy = rng.normal(0.5, 0.15, size=(batch, S, 4)).astype(np.float32)
    x0, y0, x1, y1 = np.split(xyxy, 4, axis=-1)
    box = np.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], -1)
    box = np.pad(box, ((0, 0), (0, 0), (0, K - 4)))
    return np.stack([cls, box], axis=2)


# --------------------------------------------------------------------------
# straight-through argmax
# --------------------------------------------------------------------------


@jax.custom_vjp
def straight_through_argmax(packed: jax.Array) -> jax.Array:
    """Hardens the class row to a one-hot; gradient passes through
    unchanged (`argmax.py:9-20`)."""
    cls = packed[:, :, 0]
    hard = jax.nn.one_hot(jnp.argmax(cls, -1), cls.shape[-1], dtype=cls.dtype)
    return packed.at[:, :, 0].set(hard)


def _st_fwd(packed):
    return straight_through_argmax(packed), None


def _st_bwd(_, g):
    return (g,)


straight_through_argmax.defvjp(_st_fwd, _st_bwd)


# --------------------------------------------------------------------------
# reorder (design_seq) — host-side numpy
# --------------------------------------------------------------------------


def _box_iou_xyxy(b: np.ndarray) -> np.ndarray:
    area = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(b[:, None, :2], b[None, :, :2])
    rb = np.minimum(b[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / (union + 1e-6)


def reorder(cls_mapped: np.ndarray, box_cxcywh: np.ndarray,
            max_elem: Optional[int] = None) -> list[int]:
    """IoU-grouping order over the PosterLayout canonical class mapping
    (0=bg, 1=text, 2=logo, 3=deco/underlay): logos first, each pulled
    together with the underlay group it touches, then texts by area desc,
    stray underlays, then background (`design_seq.py:31-137`)."""
    n = len(cls_mapped)
    max_elem = max_elem or n
    cx, cy, w, h = box_cxcywh[:, 0], box_cxcywh[:, 1], box_cxcywh[:, 2], box_cxcywh[:, 3]
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    iou = _box_iou_xyxy(xyxy)
    area = np.clip(w, 0, None) * np.clip(h, 0, None)

    cls_np = np.asarray(cls_mapped)
    text = np.where(cls_np == 1)[0]
    logo = np.where(cls_np == 2)[0]
    deco = np.where(cls_np == 3)[0]

    order_text = sorted(text.tolist(), key=lambda i: area[i], reverse=True)
    order_deco = sorted(deco.tolist(), key=lambda i: area[i])

    connection: dict[int, int] = {}
    reverse_connection: dict[int, list[int]] = {}
    for d in order_deco:
        con = []
        for grp in (logo, text):
            for i in grp:
                if iou[d, i] > 0:
                    connection[int(i)] = int(d)
                    con.append(int(i))
        for i in deco:
            if i != d and iou[d, i] > 0:
                con.append(int(i))
        reverse_connection[int(d)] = con

    order: list[int] = []

    def pull(i: int) -> None:
        if i in connection:
            d = connection[i]
            for j in reverse_connection.get(d, []):
                if j not in order:
                    order.append(j)
            if d not in order:
                order.append(d)
        elif i not in order:
            order.append(i)

    for i in logo:
        pull(int(i))
    for i in order_text:
        if len(order) >= max_elem:
            break
        pull(int(i))
    order += [d for d in deco.tolist() if d not in order]
    if len(order) < max_elem:
        order += np.where(cls_np == 0)[0].tolist()
    return [int(i) for i in order[: min(n, max_elem)]]


# --------------------------------------------------------------------------
# Hungarian matching + SetCriterion
# --------------------------------------------------------------------------




def _box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N,4] x [M,4] xyxy -> [N,M] gIoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / (union + 1e-6)
    ltm = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rbm = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    whm = jnp.clip(rbm - ltm, 0, None)
    hull = whm[..., 0] * whm[..., 1]
    return iou - (hull - union) / (hull + 1e-6)


def hungarian_match(pred_logits: jax.Array, pred_boxes: jax.Array,
                    tgt_labels: jax.Array, tgt_boxes: jax.Array,
                    cost_class: float = 2.0, cost_bbox: float = 5.0,
                    cost_giou: float = 2.0) -> jax.Array:
    """[B, S] matched target slot per query.  Square matching over all S
    slots (the reference also feeds padded no-object slots as targets —
    `common_gan/base_model.py:242-245`)."""
    B, S = pred_logits.shape[:2]
    pred_boxes = pred_boxes[..., :4]
    tgt_boxes = tgt_boxes[..., :4]
    prob = jax.nn.softmax(pred_logits, -1)
    # c_cls[b, i, j] = -prob[b, i, tgt_labels[b, j]]
    c_cls = -jnp.take_along_axis(
        prob, jnp.broadcast_to(tgt_labels[:, None, :], (B, S, S)), axis=2
    )
    c_l1 = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), axis=-1
    )
    giou = jax.vmap(generalized_box_iou)(
        _box_cxcywh_to_xyxy(pred_boxes), _box_cxcywh_to_xyxy(tgt_boxes)
    )
    cost = cost_bbox * c_l1 + cost_class * c_cls + cost_giou * -giou
    cost = jnp.nan_to_num(cost, nan=1e5, posinf=1e5, neginf=-1e5)
    cost = jax.lax.stop_gradient(cost)
    # exact on-device Jonker-Volgenant (no host callbacks: unsupported by
    # the axon TPU runtime) — scipy-parity fuzz-tested in test_gan.py
    from ralf_tpu.ops.assignment import batched_lsa

    return batched_lsa(cost)


def set_criterion(pred_logits: jax.Array, pred_boxes: jax.Array,
                  tgt_labels: jax.Array, tgt_boxes: jax.Array,
                  empty_weight: jax.Array,
                  num_classes_total: int) -> dict[str, jax.Array]:
    """DETR losses over the Hungarian assignment (`rec_loss.py:104-230`):
    weighted CE on all queries, L1 + gIoU on matched pairs normalized by
    the total target count."""
    pred_boxes = pred_boxes[..., :4]
    tgt_boxes = tgt_boxes[..., :4]
    match = hungarian_match(pred_logits, pred_boxes, tgt_labels, tgt_boxes)
    tgt_l = jnp.take_along_axis(tgt_labels, match, axis=1)  # [B, S]
    tgt_b = jnp.take_along_axis(tgt_boxes, match[..., None], axis=1)

    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), -1)
    w = empty_weight[tgt_l]
    ce = -jnp.take_along_axis(logp, tgt_l[..., None], -1)[..., 0]
    loss_ce = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)

    num_boxes = tgt_labels.shape[0] * tgt_labels.shape[1]
    loss_bbox = jnp.sum(jnp.abs(pred_boxes - tgt_b)) / num_boxes
    giou = jax.vmap(
        lambda a, b: jnp.diagonal(
            generalized_box_iou(_box_cxcywh_to_xyxy(a), _box_cxcywh_to_xyxy(b))
        )
    )(pred_boxes[..., :4], tgt_b[..., :4])
    loss_giou = jnp.sum(1.0 - giou) / num_boxes

    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def hinge_embedding_loss(x: jax.Array, target: jax.Array,
                         margin: float = 1.0) -> jax.Array:
    """torch.nn.HingeEmbeddingLoss semantics (`common_gan/base_model.py:62`)."""
    return jnp.mean(jnp.where(target > 0, x, jnp.maximum(0.0, margin - x)))
