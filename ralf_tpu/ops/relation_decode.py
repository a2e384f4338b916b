"""Relation-constrained AR decoding with batched on-device backtracking.

Reference counterpart: `models/autoreg.py:223-392` (sample_relation) +
`models/layoutformerpp/relation_restriction.py` — a per-sample host-side
while-loop token automaton with probability pruning, backtracking to a
violation-specific index, retry counters and full resets; batch size is
effectively 1 and every step round-trips device<->host.

TPU redesign: generation proceeds element-by-element (5 cached decoder
steps per element).  For each element the sampler draws up to R candidate
attempts FROM THE SAME cache snapshot (explicit KV caches make rewinding
free), geometrically decodes each candidate on device, counts violated
relation clauses against the already-accepted prefix, and keeps the first
satisfying attempt (else the fewest-violations one).  Retries bump the
temperature like the reference's backtrack path (`autoreg.py:349-353`).
All of it is one jitted scan — the whole batch backtracks independently
in parallel, no host round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.conditioning import Condition
from ralf_tpu.core.relationships import REL_SIZE_ALPHA, RelLoc, RelSize
from ralf_tpu.core.sampling import NEG_INF, SamplingConfig, sample
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer
from ralf_tpu.models.nn import TokenDecoder

MAX_CONSTRAINTS = 16  # per element; 10% sampling yields ~1-2 on average
CANVAS = -1


def build_relation_tensors(cond: Condition, S: int) -> dict:
    """Sampled clauses -> fixed-shape per-element constraint tensors.

    For clause (label_A, ea, rel, label_B, eb), the check runs while
    generating element max(ea, eb) — both sides exist by then.  Letters
    map positionally (A -> element 0), matching how the reference's
    violation calculator indexes generated elements (`violate.py:159-229`).

    Returns {anchor_a, anchor_b [B,S,C], rel [B,S,C], valid [B,S,C]}.
    """
    rels = cond.sampled_relations or []
    B = len(rels) if rels else np.asarray(cond.image).shape[0]
    a = np.zeros((B, S, MAX_CONSTRAINTS), np.int32)
    b = np.zeros((B, S, MAX_CONSTRAINTS), np.int32)
    r = np.zeros((B, S, MAX_CONSTRAINTS), np.int32)
    valid = np.zeros((B, S, MAX_CONSTRAINTS), bool)
    counts = np.zeros((B, S), np.int32)
    for bi, clauses in enumerate(rels):
        for la, ea, rel, lb, eb in clauses:
            i = ord(ea) - ord("A")
            j = CANVAS if lb == "canvas" else ord(eb) - ord("A")
            if i >= S or (j != CANVAS and j >= S):
                continue
            anchor = i if j == CANVAS else max(i, j)
            c = counts[bi, anchor]
            if c >= MAX_CONSTRAINTS:
                continue
            a[bi, anchor, c] = i
            b[bi, anchor, c] = j
            r[bi, anchor, c] = int(rel)
            valid[bi, anchor, c] = True
            counts[bi, anchor] = c + 1
    return {
        "anchor_a": jnp.asarray(a),
        "anchor_b": jnp.asarray(b),
        "rel": jnp.asarray(r),
        "valid": jnp.asarray(valid),
    }


# ---- vectorized relation detectors (jnp mirrors of relationships.py) ------


def _detect_size(area_a: jax.Array, area_b: jax.Array) -> jax.Array:
    eq = (area_b > (1 - REL_SIZE_ALPHA) * area_a) & (
        area_b < (1 + REL_SIZE_ALPHA) * area_a
    )
    larger = area_a < area_b
    return jnp.where(eq, int(RelSize.EQUAL),
                     jnp.where(larger, int(RelSize.LARGER), int(RelSize.SMALLER)))


def _detect_loc(la, ta, ra, ba, lb, tb, rb, bb) -> jax.Array:
    top = bb <= ta
    bottom = ba <= tb
    left = rb <= la
    right = ra <= lb
    return jnp.where(
        top, int(RelLoc.TOP),
        jnp.where(bottom, int(RelLoc.BOTTOM),
                  jnp.where(left, int(RelLoc.LEFT),
                            jnp.where(right, int(RelLoc.RIGHT),
                                      int(RelLoc.CENTER)))),
    )


def _detect_canvas(cy: jax.Array) -> jax.Array:
    return jnp.where(cy < 1 / 3, int(RelLoc.TOP),
                     jnp.where(cy < 2 / 3, int(RelLoc.CENTER),
                               int(RelLoc.BOTTOM)))


def count_violations(geo: dict, elem_idx: jax.Array, tensors: dict) -> jax.Array:
    """[B] violated-clause count for the element being generated.

    geo: {'cx','cy','w','h'} arrays [B, S] of accepted geometry with the
    candidate written at elem_idx.
    """
    a_idx = tensors["anchor_a"]  # [B, S, C]
    b_idx = tensors["anchor_b"]
    rel = tensors["rel"]
    valid = tensors["valid"]
    B, S, C = a_idx.shape
    row = lambda t: jax.lax.dynamic_slice_in_dim(t, 0, S, 1)  # identity; clarity

    def gather(v, idx):  # v [B,S], idx [B,C] -> [B,C]
        return jnp.take_along_axis(v, idx, axis=1)

    a_at = jnp.take_along_axis(a_idx, elem_idx[:, None, None], 1)[:, 0]  # [B,C]
    b_at = jnp.take_along_axis(b_idx, elem_idx[:, None, None], 1)[:, 0]
    rel_at = jnp.take_along_axis(rel, elem_idx[:, None, None], 1)[:, 0]
    val_at = jnp.take_along_axis(valid, elem_idx[:, None, None], 1)[:, 0]

    is_canvas = b_at == CANVAS
    b_safe = jnp.maximum(b_at, 0)
    cx_a, cy_a = gather(geo["cx"], a_at), gather(geo["cy"], a_at)
    w_a, h_a = gather(geo["w"], a_at), gather(geo["h"], a_at)
    cx_b, cy_b = gather(geo["cx"], b_safe), gather(geo["cy"], b_safe)
    w_b, h_b = gather(geo["w"], b_safe), gather(geo["h"], b_safe)

    area_a, area_b = w_a * h_a, w_b * h_b
    det_size = _detect_size(area_a, jnp.where(is_canvas, 1.0, area_b))
    det_loc = _detect_loc(
        cx_a - w_a / 2, cy_a - h_a / 2, cx_a + w_a / 2, cy_a + h_a / 2,
        cx_b - w_b / 2, cy_b - h_b / 2, cx_b + w_b / 2, cy_b + h_b / 2,
    )
    det_loc = jnp.where(is_canvas, _detect_canvas(cy_a), det_loc)
    is_size_rel = rel_at <= int(RelSize.LARGER)
    detected = jnp.where(is_size_rel, det_size, det_loc)
    violated = val_at & (detected != rel_at)
    return jnp.sum(violated, axis=1)


# ---- the decode loop --------------------------------------------------------


def relation_aware_decode(
    decoder: TokenDecoder,
    dec_vars,
    memory: jax.Array,
    tokenizer: LayoutSequenceTokenizer,
    forced: jax.Array,  # [B, 5S] label forcing from the relation cond
    tensors: dict,
    sampling: SamplingConfig,
    key: jax.Array,
    max_retries: int = 8,
    retry_temperature: float = 1.5,  # `autoreg.py:351`
    kv_quant: bool = False,  # int8 shared cross-memory, as in ar_decode
    self_quant: bool = False,  # int8 per-token self caches, as in ar_decode
) -> jax.Array:
    """Returns token sequences [B, 5S]."""
    B = memory.shape[0]
    S = tokenizer.max_seq_length
    Cvar = tokenizer.N_var_per_element
    L = tokenizer.max_token_length
    V = tokenizer.N_total
    token_ok = jnp.asarray(tokenizer.token_mask)
    centers = {
        k: jnp.asarray(tokenizer.bucketizers[k].centers)
        for k in ("center_x", "center_y", "width", "height")
    }
    offs = {k: tokenizer.geo_offset(k) for k in centers}
    nbin = tokenizer.N_bbox_per_var
    var_order = list(tokenizer.var_order)

    cache0 = decoder.apply(
        dec_vars, B, L, self_quant, method=TokenDecoder.init_cache
    )
    cross = decoder.apply(dec_vars, memory, kv_quant,
                          method=TokenDecoder.cross_kv)
    positions = jnp.arange(L)
    vocab_iota = jnp.arange(V)

    def run_segment(cache, prev_tok, elem, attempt_key, temp_scale):
        """Decode one element's Cvar tokens from a cache snapshot."""
        def step(carry, s):
            cache, prev, key = carry
            t = elem * Cvar + s
            keep = positions[None, :] <= t  # pads don't occur pre-EOS here
            x = decoder.apply(dec_vars, prev, t, method=TokenDecoder.embed_step)
            x, cache = decoder.apply(
                dec_vars, x, t, cache, cross, jnp.broadcast_to(keep, (B, L)),
                None, method=TokenDecoder.step,
            )
            logits = decoder.apply(dec_vars, x, method=TokenDecoder.head)[:, 0]
            pos_ok = jax.lax.dynamic_slice_in_dim(token_ok, t, 1, 0)[0]
            logits = jnp.where(pos_ok[None], logits.astype(jnp.float32), NEG_INF)
            f = jax.lax.dynamic_slice_in_dim(forced, t, 1, 1)[:, 0]
            flog = jnp.where(vocab_iota[None] == f[:, None], 0.0, NEG_INF)
            logits = jnp.where((f >= 0)[:, None], flog, logits)
            key, sub = jax.random.split(key)
            tok = sample(sub, logits, sampling,
                         temperature=sampling.temperature * temp_scale)
            return (cache, tok, key), tok

        (cache, last, _), toks = jax.lax.scan(
            step, (cache, prev_tok, attempt_key), jnp.arange(Cvar)
        )
        return cache, last, jnp.swapaxes(toks, 0, 1)  # [B, Cvar]

    def tokens_to_geo(toks, elem, geo):
        """Write candidate element geometry into geo dict at elem."""
        new = {}
        for gk, short in (("center_x", "cx"), ("center_y", "cy"),
                          ("width", "w"), ("height", "h")):
            col = var_order.index(gk)
            idx = jnp.clip(toks[:, col] - offs[gk], 0, nbin - 1)
            val = centers[gk][idx]
            new[short] = geo[short].at[:, elem].set(val)
        return new

    def element_body(carry, elem):
        cache, prev_tok, geo, key = carry

        def attempt(r, st):
            best_cache, best_prev, best_toks, best_viol, done, key = st
            key, sub = jax.random.split(key)
            temp = jnp.where(r > 0, retry_temperature, 1.0)
            cand_cache, cand_prev, cand_toks = run_segment(
                cache, prev_tok, elem, sub, temp
            )
            cand_geo = tokens_to_geo(cand_toks, elem, geo)
            viol = count_violations(cand_geo, jnp.full((B,), elem), {
                "anchor_a": tensors["anchor_a"],
                "anchor_b": tensors["anchor_b"],
                "rel": tensors["rel"],
                "valid": tensors["valid"],
            })
            # penalize out-of-vocab geometry (pad/eos in a geo slot): such
            # an element decodes to zeros and breaks its clauses at eval
            label_col = var_order.index("label")
            lbl = cand_toks[:, label_col]
            is_real = lbl < tokenizer.N_label
            oov = jnp.zeros((B,), jnp.int32)
            for gk in centers:
                col = var_order.index(gk)
                tk = cand_toks[:, col] - offs[gk]
                oov = oov + ((tk < 0) | (tk >= nbin)).astype(jnp.int32)
            viol = viol + jnp.where(is_real, oov, 0)
            better = (~done) & (viol < best_viol)
            sel = lambda a, b: jnp.where(
                better.reshape((B,) + (1,) * (a.ndim - 1)), a, b
            )
            best_cache = jax.tree.map(sel, cand_cache, best_cache)
            best_prev = jnp.where(better, cand_prev, best_prev)
            best_toks = sel(cand_toks, best_toks)
            best_viol = jnp.where(better, viol, best_viol)
            done = done | (best_viol == 0)
            return best_cache, best_prev, best_toks, best_viol, done, key

        init = (cache, prev_tok, jnp.zeros((B, Cvar), jnp.int32),
                jnp.full((B,), 10**6), jnp.zeros((B,), bool), key)
        best_cache, best_prev, best_toks, _, _, key = jax.lax.fori_loop(
            0, max_retries, attempt, init
        )
        geo = tokens_to_geo(best_toks, elem, geo)
        return (best_cache, best_prev, geo, key), best_toks

    bos = jnp.full((B,), tokenizer.bos_id, jnp.int32)
    geo0 = {k: jnp.zeros((B, S)) for k in ("cx", "cy", "w", "h")}
    (_, _, _, _), toks = jax.lax.scan(
        element_body, (cache0, bos, geo0, key), jnp.arange(S)
    )
    # [S, B, Cvar] -> [B, S*Cvar]
    return jnp.transpose(toks, (1, 0, 2)).reshape(B, L)
