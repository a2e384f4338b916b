"""Constraint-violation measurement.

Parity target: `image2layout/train/models/layoutformerpp/violate.py`:
  * c / cwh / refinement — token equality between the condition and the
    generated sequence at the known positions (`:91-140`)
  * relation — geometric re-detection of every conditioned relation on
    the generated layout (`:143-236`)
  * uncond / partial — trivially zero (`:81-88`)

Results aggregate to the reference's `{split}_{seed}_violation.csv`
columns: total, viorated [sic], rate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ralf_tpu.core.conditioning import MASK_ID, Condition, normalize_task
from ralf_tpu.core.layout import Layout
from ralf_tpu.core.relationships import (
    RelLoc,
    RelSize,
    detect_canvas_relation,
    detect_loc_relation,
    detect_size_relation,
)
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer


def calculate_violation(
    cond: Condition,
    seq: np.ndarray,  # [B, 5S] generated tokens (no BOS)
    layout: Optional[Layout],
    tokenizer: LayoutSequenceTokenizer,
) -> dict[str, float]:
    task = normalize_task(cond.task)
    if task in ("uncond", "partial", "gt"):
        return {"total": 1, "viorated": 0}
    if task == "relation":
        assert layout is not None
        return calculate_relation_violation(cond, layout)

    off = 1 if tokenizer.has_bos_eos else 0
    ctok = np.asarray(cond.seq)[:, off:]
    cmask = np.asarray(cond.seq_mask)[:, off:]
    known = cmask & (ctok != tokenizer.pad_id) & (ctok != MASK_ID)
    if "mask" in tokenizer.special_tokens:
        known &= ctok != tokenizer.name_to_id("mask")
    if tokenizer.has_bos_eos:
        known &= ctok != tokenizer.eos_id
    if task == "refinement":
        L = ctok.shape[1]
        known &= (np.arange(L) % tokenizer.N_var_per_element == 0)[None, :]
    seq = np.asarray(seq)
    violated = int((seq[known] != ctok[known]).sum())
    return {"total": int(known.sum()), "viorated": violated}


def calculate_relation_violation(cond: Condition, layout: Layout) -> dict[str, float]:
    """Re-detect each conditioned clause on the generated layout.

    Clauses reference elements by their per-sample letter (assigned over
    the reversed valid order of the CONDITION layout); the generated
    layout is indexed positionally the same way the reference's
    constraint machine does (`violate.py:159-229`).
    """
    size_rels = set(RelSize)
    total = violated = 0
    cx = np.asarray(layout.center_x)
    cy = np.asarray(layout.center_y)
    w = np.asarray(layout.width)
    h = np.asarray(layout.height)

    def ltrb(b, i):
        return (cx[b, i] - w[b, i] / 2, cy[b, i] - h[b, i] / 2,
                cx[b, i] + w[b, i] / 2, cy[b, i] + h[b, i] / 2)

    rels = cond.relations or []
    chosen = getattr(cond, "sampled_relations", None) or rels
    for b, clauses in enumerate(chosen):
        S = cx.shape[1]
        for la, ea, rel, lb, eb in clauses:
            i = ord(ea) - ord("A")
            if i >= S:
                continue
            total += 1
            if lb == "canvas":
                detected = detect_canvas_relation(cy[b, i])
                if isinstance(rel, RelSize):
                    detected = detect_size_relation(w[b, i] * h[b, i], 1.0)
            else:
                j = ord(eb) - ord("A")
                if j >= S:
                    continue
                if rel in size_rels:
                    detected = detect_size_relation(
                        w[b, i] * h[b, i], w[b, j] * h[b, j]
                    )
                else:
                    detected = detect_loc_relation(ltrb(b, i), ltrb(b, j))
            if detected != rel:
                violated += 1
    return {"total": max(total, 1), "viorated": violated}
