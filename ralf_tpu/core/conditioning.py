"""Task conditioning: masked token sequences, constraint sequences, and the
vectorized decode-space restriction.

Covers the reference's three cooperating modules with a static-shape,
TPU-first design:

  * `helpers/task.py:45-183` (get_condition) — build the per-task partial
    token sequence, with `-1` marking unknown slots;
  * `models/layoutformerpp/task_preprocessor.py` — serialize the user
    constraint into its own token language (task tokens, `sep`, relation
    clauses) for the constraint encoder;
  * `models/layoutformerpp/decoding_space_restriction.py:5-106` — the
    per-step logit restriction.  The reference loops over batch indices on
    the host at every decode step; here the whole policy is collapsed into
    ONE precomputed `forced_tokens [B, L]` array (`-1` = free, else the
    token id the step must emit) consumed on device by the decode loop.

All builders are host-side numpy with explicit RNG — this is input-pipeline
work with ragged intermediates; outputs are fixed-shape arrays that feed
straight into jitted programs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from ralf_tpu.core.layout import GEO_KEYS, Layout
from ralf_tpu.core.relationships import (
    RelLoc,
    RelSize,
    compute_relation,
    describe_relationships,
)
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer

MASK_ID = -1  # unknown-slot marker inside condition sequences
REFINEMENT_NOISE_STD = 0.01  # `helpers/task.py:16`
RELATION_SIZE = 10  # percent of precomputed relations sampled as conditions

COND_TYPES = ("c", "cwh", "partial", "gt", "refinement", "relation", "none", "uncond")

# attributes fixed by each task (`helpers/task.py:34-42`)
TASK_VARS = {
    "c": ("label",),
    "cwh": ("label", "width", "height"),
    "relation": ("label",),
    "refinement": ("label", "width", "height", "center_x", "center_y"),
    "partial": ("label", "width", "height", "center_x", "center_y"),
}

TASK_TOKENS = (
    "end_of_task",
    "label",
    "label_size",
    "relationship",
    "refinement",
    "completion",
    "uncondition",
)
CONST_SPECIAL_TOKENS = ("sep", "relation_sep", "canvas")
TASK_OF = {
    None: "uncondition",
    "none": "uncondition",
    "uncond": "uncondition",
    "c": "label",
    "cwh": "label_size",
    "gt": "uncondition",  # full copy-through: no constraint head of its own
    "partial": "completion",
    "refinement": "refinement",
    "relation": "relationship",
}


def normalize_task(task: Optional[str]) -> str:
    return "uncond" if task in (None, "none", "uncond") else task


@dataclasses.dataclass
class Condition:
    """Fixed-shape conditioning bundle handed to a model's sample()."""

    image: Any  # [B, H, W, 4] float32
    task: str  # static
    seq: Optional[np.ndarray] = None  # [B, 1+5S] int32, -1 = unknown
    seq_mask: Optional[np.ndarray] = None  # [B, 1+5S] bool, True = known
    const_seq: Optional[np.ndarray] = None  # [B, Lc] int32
    const_mask: Optional[np.ndarray] = None  # [B, Lc] bool, True = valid
    retrieved: Optional[dict] = None  # retrieval arrays (RALF)
    edges: Optional[dict] = None  # relation bitmask edges
    relations: Optional[list] = None  # all relation clauses (precompute table)
    sampled_relations: Optional[list] = None  # the clauses actually conditioned on
    ids: Optional[np.ndarray] = None


class ConstraintVocabulary:
    """Extended vocabulary of the user-constraint encoder.

    ids [0, N_tok_total) are the layout tokenizer's; then task tokens,
    `sep`/`relation_sep`/`canvas`, element letters A.., RelLoc, RelSize
    (`task_preprocessor.py:24-37,65-82`).
    """

    def __init__(self, tokenizer: LayoutSequenceTokenizer) -> None:
        self.tokenizer = tokenizer
        S = tokenizer.max_seq_length
        self.extra_tokens: list = (
            list(TASK_TOKENS)
            + list(CONST_SPECIAL_TOKENS)
            + [f"elem_{i}" for i in range(S)]  # A, B, C, ... letters
            + [f"loc_{r.name}" for r in RelLoc]
            + [f"size_{r.name}" for r in RelSize]
        )
        self._extra = {t: tokenizer.N_total + i for i, t in enumerate(self.extra_tokens)}

    @property
    def N_total(self) -> int:
        return self.tokenizer.N_total + len(self.extra_tokens)

    def id(self, name: str) -> int:
        if name in self._extra:
            return self._extra[name]
        return self.tokenizer.name_to_id(name)  # pad/bos/eos/mask

    def elem_id(self, letter_index: int) -> int:
        return self._extra[f"elem_{letter_index}"]

    def rel_id(self, rel) -> int:
        if isinstance(rel, RelLoc):
            return self._extra[f"loc_{rel.name}"]
        return self._extra[f"size_{rel.name}"]

    def const_len(self, task: str) -> int:
        """Static constraint-sequence length per task (worst case)."""
        S = self.tokenizer.max_seq_length
        task = normalize_task(task)
        if task in ("uncond", "gt"):
            return 4  # bos task eot eos
        n_var = len(TASK_VARS[task])
        body = n_var * S + (S - 1)  # tokens + separators
        if task == "partial":
            body = n_var  # only the single kept element survives
        n = 4 + body
        if task == "relation":
            # label part + worst-case sampled clauses (6 tokens each)
            total_rel = S * (S - 1) + S  # loc + size pairs + canvas
            n += (total_rel * RELATION_SIZE // 100 + 1) * 6
        return n


# --------------------------------------------------------------------------
# get_condition
# --------------------------------------------------------------------------


def _lookup_relationships(
    relationships: Optional[dict], ids: Optional[np.ndarray], layout: Layout
) -> list:
    """Per-sample clause lists: from the precomputed table when available
    (keyed by sample id as str), else computed on the fly.  A partial table
    falls back per-row, so a stale cache can't silently drop conditions."""
    if relationships is None or ids is None:
        return describe_relationships(layout)
    rows = [str(i) for i in np.asarray(ids).tolist()]
    if all(r in relationships for r in rows):
        return [relationships[r] for r in rows]
    return describe_relationships(layout)


def get_condition(
    layout: Layout,
    image: Any,
    task: Optional[str],
    tokenizer: LayoutSequenceTokenizer,
    rng: np.random.Generator,
    ids: Optional[np.ndarray] = None,
    retrieved: Optional[dict] = None,
    relationships: Optional[dict] = None,
) -> tuple[Condition, Layout]:
    """Build the per-task condition; returns (condition, target_layout).

    target_layout is the layout the training loss should encode — for
    refinement it is the NOISED layout, mirroring the reference's in-place
    mutation of the batch (`helpers/task.py:145-165`).

    relationships: optional precomputed {sample_id: clause list} table
    (written by `cli/build_caches.py --what relationships`, loaded via
    `cache.load_relationships`) — the precomputed fast path the reference's
    `RelationshipPreprocessor` consumes (`preprocess/precompute_relationship
    .py`).  Equivalent to the on-the-fly `describe_relationships` (asserted
    in tests/test_cache.py); on CGL-scale splits it saves the O(S^2)
    pairwise geometry pass per batch.
    """
    assert task in COND_TYPES or task is None
    task_n = normalize_task(task)
    enc = tokenizer.encode(layout)
    seq = np.asarray(enc["seq"]).copy()
    mask = np.asarray(enc["mask"]).copy()
    B, T = seq.shape
    C = tokenizer.N_var_per_element
    pad_id = tokenizer.pad_id
    # AR tokenizers prepend BOS; diffusion/MaskGIT tokenizers don't, and
    # mark unknowns with their [MASK] token instead of -1
    off = 1 if tokenizer.has_bos_eos else 0
    sp = tokenizer.special_tokens
    mask_id = tokenizer.name_to_id("mask") if "mask" in sp else MASK_ID

    cond = Condition(image=image, task=task_n, ids=ids, retrieved=retrieved)
    target = layout

    if task_n == "uncond":
        pass

    elif task_n == "partial":
        # keep (BOS +) the first element's tokens, everything else unknown
        new_seq = np.full_like(seq, mask_id)
        new_mask = np.zeros_like(mask)
        new_seq[:, : off + C] = seq[:, : off + C]
        new_mask[:, : off + C] = True
        cond.seq, cond.seq_mask = new_seq, new_mask

    elif task_n in ("c", "cwh", "relation"):
        if task_n == "relation":
            cond.edges = compute_relation(layout, rng)
            cond.relations = _lookup_relationships(relationships, ids, layout)
        pos = np.arange(T)
        attr_ind = (pos - off) % C
        keep = np.zeros((B, T), bool)
        keep[:, :off] = True  # BOS
        for attr in TASK_VARS[task_n]:
            keep |= (attr_ind == list(tokenizer.var_order).index(attr))[None, :]
        seq_c = np.where(keep, seq, mask_id)
        seq_c = np.where(mask, seq_c, pad_id)  # element count is given
        cond.seq = seq_c
        cond.seq_mask = (mask & keep) | ~mask

    elif task_n == "gt":
        cond.seq, cond.seq_mask = seq, mask

    elif task_n == "refinement":
        noisy = {}
        for key in GEO_KEYS:
            v = np.asarray(layout.geo(key))
            v = np.clip(v + rng.normal(0, REFINEMENT_NOISE_STD, v.shape), 0.0, 1.0)
            noisy[key] = np.where(np.asarray(layout.mask), v, 0.0).astype(np.float32)
        target = Layout(
            label=layout.label,
            center_x=noisy["center_x"],
            center_y=noisy["center_y"],
            width=noisy["width"],
            height=noisy["height"],
            mask=layout.mask,
        )
        enc_n = tokenizer.encode(target)
        cond.seq = np.asarray(enc_n["seq"]).copy()
        cond.seq_mask = mask  # all given positions are trusted
    else:
        raise NotImplementedError(task)

    return cond, target


# --------------------------------------------------------------------------
# constraint-sequence serialization (user-constraint encoder input)
# --------------------------------------------------------------------------


def _parse_cond_elements(
    cond_seq: np.ndarray, tokenizer: LayoutSequenceTokenizer
) -> tuple[np.ndarray, np.ndarray]:
    """cond seq [B, 1+5S] -> (per-var token table [B, 5, S], valid [B, S]).

    The 5-row order is the tokenizer's var_order.  Elements whose label slot
    holds pad/eos are invalid (`task_preprocessor.py:149-258`).
    """
    tok = tokenizer
    off = 1 if tok.has_bos_eos else 0
    body = cond_seq[:, off:].reshape(cond_seq.shape[0], tok.max_seq_length, -1)
    body = np.swapaxes(body, 1, 2)  # [B, C, S]
    label_row = list(tok.var_order).index("label")
    labels = body[:, label_row]
    valid = (labels != tok.pad_id) & (labels != MASK_ID)
    if tok.has_bos_eos:
        valid &= labels != tok.eos_id
    if "mask" in tok.special_tokens:
        valid &= labels != tok.name_to_id("mask")
    return body, valid


def build_constraint_sequence(
    cond: Condition,
    vocab: ConstraintVocabulary,
    rng: np.random.Generator,
    shuffle: Optional[bool] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Serialize a Condition into (const_seq [B, Lc], const_mask [B, Lc]).

    Layout: [bos, <task>, end_of_task, BODY..., eos, pad...] with
    `sep`-separated per-element groups; relation adds `relation_sep` and
    clause groups.  Static per-task length from vocab.const_len.
    """
    tok = vocab.tokenizer
    task = normalize_task(cond.task)
    Lc = vocab.const_len(task)
    pad, bos, eos = tok.pad_id, tok.bos_id, tok.eos_id
    sep = vocab.id("sep")

    B = np.asarray(cond.image).shape[0] if cond.seq is None else cond.seq.shape[0]
    out = np.full((B, Lc), pad, np.int32)
    head = [bos, vocab.id(TASK_OF[task]), vocab.id("end_of_task")]

    if shuffle is None:
        # cwh / refinement keep dataset order; c / partial / relation shuffle
        shuffle = task in ("c", "partial", "relation")

    if task in ("uncond", "gt"):
        row = head + [eos]
        out[:, : len(row)] = row
        return out, out != pad

    var_rows = {v: list(tok.var_order).index(v) for v in TASK_VARS[task]}
    body_vars = list(TASK_VARS[task])
    table, valid = _parse_cond_elements(cond.seq, tok)

    for b in range(B):
        idx = np.nonzero(valid[b])[0]
        if shuffle and len(idx) > 1:
            idx = rng.permutation(idx)
        groups = []
        for e in idx:
            groups.append([int(table[b, var_rows[v], e]) for v in body_vars])
        body: list[int] = []
        for gi, g in enumerate(groups):
            if gi:
                body.append(sep)
            body.extend(g)

        if task == "relation":
            body.append(vocab.id("relation_sep"))
            rels = cond.relations[b] if cond.relations else []
            n_sample = max(len(rels) * RELATION_SIZE // 100, 1)
            if cond.sampled_relations is None:
                cond.sampled_relations = [[] for _ in range(B)]
            if len(rels) > 0:
                chosen = [rels[i] for i in rng.permutation(len(rels))[:n_sample]]
                cond.sampled_relations[b] = chosen
                for ci, clause in enumerate(chosen):
                    la, ea, rel, lb, eb = clause
                    toks = [
                        int(la),
                        vocab.elem_id(ord(ea) - ord("A")),
                        vocab.rel_id(rel),
                        vocab.id("canvas") if lb == "canvas" else int(lb),
                        pad if eb == "pad" else vocab.elem_id(ord(eb) - ord("A")),
                    ]
                    if ci:
                        body.append(sep)
                    body.extend(toks)

        row = head + body + [eos]
        assert len(row) <= Lc, (task, len(row), Lc)
        out[b, : len(row)] = row

    const_mask = out != pad
    # BOS/EOS/head are always valid; pads are not
    return out, const_mask


# --------------------------------------------------------------------------
# decode-space restriction -> forced-token array
# --------------------------------------------------------------------------


def build_forced_tokens(
    cond: Condition, tokenizer: LayoutSequenceTokenizer
) -> np.ndarray:
    """Collapse the per-task decode restriction into forced[B, L] (int32).

    forced[b, t] == -1  -> step t samples freely
    forced[b, t] == v   -> step t must emit token v

    Policy parity (`decoding_space_restriction.py:98-106`):
      c / cwh      : every known cond token is forced; positions at/after
                     the cond's first pad force EOS
      refinement / relation : same, but only at label slots
      partial      : the kept first element is forced verbatim (the
                     reference seeds the decoder with those 5 tokens)
      uncond / gt / none : free
    """
    assert tokenizer.has_bos_eos, "forced-token decode is for AR tokenizers"
    L = tokenizer.max_token_length
    C = tokenizer.N_var_per_element
    task = normalize_task(cond.task)

    if cond.seq is None or task == "uncond":
        B = np.asarray(cond.image).shape[0]
        return np.full((B, L), MASK_ID, np.int32)

    body = cond.seq[:, 1:].astype(np.int32)  # [B, L]
    forced = np.where(body == tokenizer.pad_id, tokenizer.eos_id, body)

    if task in ("refinement", "relation"):
        label_slot = (np.arange(L) % C) == 0
        forced = np.where(label_slot[None, :], forced, MASK_ID)
    elif task == "partial":
        forced = np.full_like(body, MASK_ID)
        forced[:, :C] = body[:, :C]
    elif task not in ("c", "cwh", "gt"):
        # gt forces the ENTIRE body: the reference's gt arm is "just copy"
        # (task.py:135 pass-through / diffusion strong-constraint replace)
        forced = np.full_like(body, MASK_ID)
    return forced.astype(np.int32)
