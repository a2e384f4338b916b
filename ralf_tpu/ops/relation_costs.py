"""Differentiable relation-constraint costs (CLG-LO) + diffusion logit
adjustment.

Parity targets: `diffusion/discrete/clg_lo.py` (the 14 hinge-style cost
terms over a bitmask edge graph with the canvas as pseudo-element 0) and
`logit_adjustment.py:94-176` (`_stochastic_convert`: expected coordinates
from the geometry-bin softmax; `update_logits_for_relation`: a few SGD
steps on the reverse-step log-probs driven by the relation costs, skipped
for t < 10).

TPU redesign: costs are fully vectorized over [B, E] edge tensors, and
the SGD loop is an unrolled `jax.grad` fixed-point inside the jitted
sampler — no torch Parameter/optimizer machinery.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ralf_tpu.core.layout import GEO_KEYS
from ralf_tpu.core.relationships import REL_SIZE_ALPHA, RelLoc, RelSize
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer


def _relu(x):
    return jnp.maximum(x, 0.0)


def _le(a, b):  # violated amount of a <= b
    return _relu(a - b)


def _lt(a, b, eps: float = 1e-8):
    return _relu(a - b + eps)


def _gather(v: jax.Array, idx: jax.Array) -> jax.Array:
    """v [B, S+1], idx [B, E] (negatives -> 0, masked by cond anyway)."""
    return jnp.take_along_axis(v, jnp.maximum(idx, 0), axis=1)


def stochastic_convert(
    log_prob: jax.Array, tokenizer: LayoutSequenceTokenizer
) -> dict[str, jax.Array]:
    """[B, L, V] log-probs -> expected geometry {key: [B, S]}
    (`logit_adjustment.py:94-124`)."""
    C = tokenizer.N_var_per_element
    N = tokenizer.N_bbox_per_var
    out = {}
    for key in GEO_KEYS:
        col = list(tokenizer.var_order).index(key)
        off = tokenizer.geo_offset(key)
        logits = log_prob[:, col::C, off : off + N]  # [B, S, N]
        probs = jax.nn.softmax(logits, axis=-1)
        centers = jnp.asarray(tokenizer.bucketizers[key].centers)
        out[key] = jnp.sum(probs * centers[None, None, :], axis=-1)
    return out


def relation_cost(
    bbox_flat: jax.Array,  # [B, S+1, 4] cxcywh, row 0 = canvas
    edge_idx: jax.Array,  # [B, E, 2]
    edge_attr: jax.Array,  # [B, E] bitmask
) -> jax.Array:
    """Mean total violated amount over the 14 CLG-LO terms."""
    cx, cy, w, h = (bbox_flat[..., i] for i in range(4))
    area = w * h
    l, r = cx - w / 2, cx + w / 2
    t, b = cy - h / 2, cy + h / 2
    zi, zj = edge_idx[..., 0], edge_idx[..., 1]
    valid = zi >= 0

    def has(rel):
        return (edge_attr & (1 << int(rel))) != 0

    is_canvas_i = zi == 0
    ai, aj = _gather(area, zi), _gather(area, zj)
    yc_j = _gather(cy, zj)
    li, lj = _gather(l, zi), _gather(l, zj)
    ti, tj = _gather(t, zi), _gather(t, zj)
    ri, rj = _gather(r, zi), _gather(r, zj)
    bi, bj = _gather(b, zi), _gather(b, zj)

    total = jnp.zeros(bbox_flat.shape[0])

    def acc(total, cost, cond):
        cond = cond & valid
        return total + jnp.sum(jnp.where(cond, cost, 0.0), axis=1)

    # size terms (both canvas and non-canvas i, `clg_lo.py:33-82,200-206`)
    for canvas in (False, True):
        ci = is_canvas_i == canvas
        total = acc(total, _le(aj, (1 - REL_SIZE_ALPHA) * ai),
                    ci & has(RelSize.SMALLER))
        total = acc(total,
                    _lt((1 - REL_SIZE_ALPHA) * ai, aj)
                    + _lt(aj, (1 + REL_SIZE_ALPHA) * ai),
                    ci & has(RelSize.EQUAL))
        total = acc(total, _le((1 + REL_SIZE_ALPHA) * ai, aj),
                    ci & has(RelSize.LARGER))

    # canvas location terms (thirds of yc, `clg_lo.py:85-122`)
    total = acc(total, _le(yc_j, 1 / 3), is_canvas_i & has(RelLoc.TOP))
    total = acc(total, _lt(1 / 3, yc_j) + _lt(yc_j, 2 / 3),
                is_canvas_i & has(RelLoc.CENTER))
    total = acc(total, _le(2 / 3, yc_j), is_canvas_i & has(RelLoc.BOTTOM))

    # pairwise location terms (`clg_lo.py:125-194`)
    ei = ~is_canvas_i
    overlap_band = _lt(ti, bj) + _lt(tj, bi)  # vertical overlap for L/R/C
    total = acc(total, _le(bj, ti), ei & has(RelLoc.TOP))
    total = acc(total, _le(bi, tj), ei & has(RelLoc.BOTTOM))
    total = acc(total, _le(rj, li) + overlap_band, ei & has(RelLoc.LEFT))
    total = acc(total, _le(ri, lj) + overlap_band, ei & has(RelLoc.RIGHT))
    total = acc(total, _lt(li, rj) + _lt(lj, ri) + overlap_band,
                ei & has(RelLoc.CENTER))
    # the reference averages the 14 per-term losses
    # (`logit_adjustment.py:169-171`: torch.stack(loss).mean() over the
    # `relation` list) — match that normalization exactly so
    # relation_lambda means the same SGD step size on both sides
    return jnp.mean(total) / 14.0


def update_logits_for_relation(
    log_prob: jax.Array,  # [B, L, V]
    t: jax.Array,  # [B] timestep
    edge_idx: jax.Array,
    edge_attr: jax.Array,
    tokenizer: LayoutSequenceTokenizer,
    relation_lambda: float = 1.0,
    num_update: int = 3,
) -> jax.Array:
    """A few plain-SGD steps on the reverse-step log-probs, gated off for
    t < 10 (`logit_adjustment.py:144-176`)."""
    B = log_prob.shape[0]
    canvas = jnp.tile(jnp.asarray([0.5, 0.5, 1.0, 1.0])[None, None], (B, 1, 1))

    def cost_fn(lp):
        coords = stochastic_convert(lp, tokenizer)
        bbox = jnp.stack([coords[k] for k in GEO_KEYS], axis=-1)
        return relation_cost(
            jnp.concatenate([canvas, bbox], axis=1), edge_idx, edge_attr
        )

    gate = (t >= 10).astype(log_prob.dtype)[:, None, None]
    lp = log_prob
    for _ in range(num_update):
        g = jax.grad(cost_fn)(lp)
        lp = lp - relation_lambda * g * gate
    return lp
