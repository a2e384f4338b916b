"""Pairwise layout relationships (size + location), canvas included.

Parity with `image2layout/train/helpers/relationships.py:11-166` and the
offline precompute `image2layout/preprocess/precompute_relationship.py`:

  * RelSize: smaller/equal/larger with a +-10% area band
  * RelLoc between elements: top/bottom/left/right/center by strict
    separation of the two boxes
  * RelLoc element-vs-canvas: thirds of center_y
  * `compute_relation`: stochastically sparsified bitmask edge list over
    (canvas + elements), the conditioning signal of relation-task models
  * `describe_relationships`: the full clause list
    [label_A, elem_A, rel, label_B, elem_B] the constraint encoder consumes
    (canvas clauses use ('canvas', 'pad') as the B side)

Host-side numpy by design: this is input-pipeline work with inherently
ragged output; the static-shape consumers are in core/conditioning.py.
A vmapped jnp re-detection (for violation metrics) lives in eval/violations.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Optional

import numpy as np

from ralf_tpu.core.layout import Layout

REL_SIZE_ALPHA = 0.1
EDGE_RATIO = 0.1


class RelSize(IntEnum):
    UNKNOWN = 0
    SMALLER = 1
    EQUAL = 2
    LARGER = 3


class RelLoc(IntEnum):
    UNKNOWN = 4
    LEFT = 5
    TOP = 6
    RIGHT = 7
    BOTTOM = 8
    CENTER = 9


# mirror-image of each relation when the pair order flips
RELATIVE_RELATION = {
    RelLoc.LEFT: RelLoc.RIGHT,
    RelLoc.RIGHT: RelLoc.LEFT,
    RelLoc.TOP: RelLoc.BOTTOM,
    RelLoc.BOTTOM: RelLoc.TOP,
    RelLoc.CENTER: RelLoc.CENTER,
    RelLoc.UNKNOWN: RelLoc.UNKNOWN,
    RelSize.SMALLER: RelSize.LARGER,
    RelSize.LARGER: RelSize.SMALLER,
    RelSize.EQUAL: RelSize.EQUAL,
    RelSize.UNKNOWN: RelSize.UNKNOWN,
}

# per-sample element identifiers used inside relation clauses
ELEM_LETTERS = tuple("ABCDEFGHIJK")


def detect_size_relation(area_a: float, area_b: float) -> RelSize:
    """Relation of B's area to A's, with a +-alpha equality band."""
    if (1 - REL_SIZE_ALPHA) * area_a < area_b < (1 + REL_SIZE_ALPHA) * area_a:
        return RelSize.EQUAL
    return RelSize.LARGER if area_a < area_b else RelSize.SMALLER


def detect_loc_relation(ltrb_a, ltrb_b) -> RelLoc:
    """Where box B sits relative to box A (strict separation, else CENTER)."""
    la, ta, ra, ba = ltrb_a
    lb, tb, rb, bb = ltrb_b
    if bb <= ta:
        return RelLoc.TOP
    if ba <= tb:
        return RelLoc.BOTTOM
    if rb <= la:
        return RelLoc.LEFT
    if ra <= lb:
        return RelLoc.RIGHT
    return RelLoc.CENTER


def detect_canvas_relation(center_y: float) -> RelLoc:
    """Vertical third of the canvas an element's center falls in."""
    if center_y < 1.0 / 3:
        return RelLoc.TOP
    if center_y < 2.0 / 3:
        return RelLoc.CENTER
    return RelLoc.BOTTOM


def _ltrb(cx, cy, w, h):
    return (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)


def compute_relation(
    layout: Layout, rng: np.random.Generator, edge_ratio: float = EDGE_RATIO
) -> dict[str, np.ndarray]:
    """Sparse bitmask edge conditioning over (canvas, elements).

    Index 0 is the canvas (a full-canvas pseudo element); edges are sampled
    with probability `edge_ratio`.  Output shapes are static:
      edge_indexes   int64 [B, E, 2]  (-1 fill)
      edge_attributes int64 [B, E]    bitmask over RelSize|RelLoc
    with E = (S+1)(S+2)/2.
    """
    label = np.asarray(layout.label)
    mask = np.asarray(layout.mask)
    B, S = label.shape
    cx = np.concatenate([np.full((B, 1), 0.5), np.asarray(layout.center_x)], 1)
    cy = np.concatenate([np.full((B, 1), 0.5), np.asarray(layout.center_y)], 1)
    w = np.concatenate([np.full((B, 1), 1.0), np.asarray(layout.width)], 1)
    h = np.concatenate([np.full((B, 1), 1.0), np.asarray(layout.height)], 1)
    aug_n = 1 + mask.sum(1)

    rel_unk = (1 << RelSize.UNKNOWN) | (1 << RelLoc.UNKNOWN)
    E = (S + 1) * (S + 2) // 2
    edge_idx = np.full((B, E, 2), -1, np.int64)
    edge_attr = np.full((B, E), rel_unk, np.int64)

    for b in range(B):
        cnt = 0
        for i in range(aug_n[b]):
            for j in range(i + 1, aug_n[b]):
                if rng.random() > edge_ratio:
                    continue
                rel = 1 << detect_size_relation(w[b, i] * h[b, i], w[b, j] * h[b, j])
                if i == 0:
                    rel |= 1 << detect_canvas_relation(cy[b, j])
                else:
                    rel |= 1 << detect_loc_relation(
                        _ltrb(cx[b, i], cy[b, i], w[b, i], h[b, i]),
                        _ltrb(cx[b, j], cy[b, j], w[b, j], h[b, j]),
                    )
                edge_idx[b, cnt] = (i, j)
                edge_attr[b, cnt] = rel
                cnt += 1
    return {"edge_indexes": edge_idx, "edge_attributes": edge_attr}


def describe_relationships(
    layout: Layout, label_names: Optional[list[str]] = None
) -> list[list[tuple]]:
    """Full clause list per sample, the precompute-table equivalent.

    Each clause is (label_A, elem_A:RelElement-letter-index, relation,
    label_B_or_'canvas', elem_B_or_'pad').  Elements are enumerated in
    REVERSED valid order, matching the reference precompute
    (`precompute_relationship.py:74-75` iterates valid_elements[::-1]).
    """
    label = np.asarray(layout.label)
    mask = np.asarray(layout.mask)
    B, S = label.shape
    geos = {k: np.asarray(layout.geo(k)) for k in ("center_x", "center_y", "width", "height")}
    out = []
    for b in range(B):
        valid = [i for i in range(S) if mask[b, i]][::-1]
        letters = {elem: ELEM_LETTERS[pos] for pos, elem in enumerate(valid)}
        loc_clauses, size_clauses, canvas_clauses = [], [], []
        for idx, i in enumerate(valid):
            bi = tuple(geos[k][b, i] for k in ("center_x", "center_y", "width", "height"))
            a_i = bi[2] * bi[3]
            for j in valid[idx + 1 :]:
                bj = tuple(geos[k][b, j] for k in ("center_x", "center_y", "width", "height"))
                loc = detect_loc_relation(_ltrb(*bi), _ltrb(*bj))
                size = detect_size_relation(a_i, bj[2] * bj[3])
                loc_clauses.append(
                    (int(label[b, i]), letters[i], loc, int(label[b, j]), letters[j])
                )
                size_clauses.append(
                    (int(label[b, i]), letters[i], size, int(label[b, j]), letters[j])
                )
            canvas_clauses.append(
                (int(label[b, i]), letters[i], detect_canvas_relation(bi[1]), "canvas", "pad")
            )
        out.append(loc_clauses + size_clauses + canvas_clauses)
    return out
