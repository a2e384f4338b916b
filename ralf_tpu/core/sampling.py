"""Unified logit-sampling strategies, pure-functional with explicit PRNG.

Parity with `image2layout/train/helpers/sampling.py:18-71` (deterministic /
random / top-k / top-p / gumbel), but written as a single jittable function
over a static config — the strategy branch resolves at trace time so the
decode loop compiles to one XLA program per strategy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Mirrors the hydra sampling group (`train/config/sampling.py:50-58`).

    top_p_prefilter: optionally restrict nucleus sampling to this many
    highest logits via `lax.top_k` before the cumsum mask.  Measured on
    TPU v5e the exact full-vocab sort path is FASTER inside the decode
    scan than a top-k prefilter (lax.top_k lowers poorly there), so the
    default is 0 = exact.

    top_p: nucleus mass.  The default sort-free bisection filter keeps ALL
    tokens tied exactly at the threshold probability (the sort oracle keeps
    one), and p >= 1.0 is a no-op; otherwise verified equivalent to the
    sort formulation (test_top_p_bisect_matches_sort_oracle).
    """

    name: str = "random"  # deterministic | random | top_k | top_p | gumbel
    temperature: float = 1.0
    top_k: int = 5
    top_p: float = 0.9
    top_p_prefilter: int = 0


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits along the last axis, -inf the rest."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering; always keeps the argmax.  (Sort formulation —
    kept as the reference/test oracle for top_p_filter_bisect.)"""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # keep sorted positions whose prefix mass <= p; position 0 always kept
    keep_sorted = (cum <= p) | (jnp.arange(logits.shape[-1]) == 0)
    # threshold = min kept logit per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def top_p_filter_bisect(logits: jax.Array, p: float, iters: int = 26) -> jax.Array:
    """Sort-free nucleus filtering (the decode-scan default on TPU).

    The nucleus {i : cumsum_desc(prob)_i <= p} equals {i : prob_i >= t*}
    for the smallest threshold t* with S(t) = sum(prob[prob >= t]) <= p,
    because S is monotone decreasing in t.  Binary search on t needs only
    masked sums — no [.., V] sort, which costs ~0.23ms/step on the v5e
    decode scan.  26 iterations shrink the bracket to maxprob * 2^-26,
    far below the generic gap between adjacent float probabilities.
    Ties at the exact threshold keep ALL tied tokens (the sort keeps one);
    identical on non-degenerate inputs.
    """
    if p >= 1.0:
        # no-op, matching the sort path: with the full mass allowed no token
        # may be filtered; the converged bracket ~maxp*2^-26 would otherwise
        # still mask tokens whose probability underflows below it.
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    maxp = jnp.max(probs, axis=-1, keepdims=True)
    lo = jnp.zeros_like(maxp)  # S(0) = 1 > p (for p < 1)
    hi = maxp  # if S(maxp) > p only the argmax survives (thresh = maxp)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(
            jnp.where(probs >= mid, probs, 0.0), axis=-1, keepdims=True
        )
        over = mass > p  # t* lies above mid
        return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

    _, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    thresh = jnp.minimum(hi, maxp)  # always keep the argmax
    return jnp.where(probs < thresh, NEG_INF, logits)


def _nucleus_sample_prefiltered(
    key: jax.Array, scaled: jax.Array, p: float, k: int
) -> jax.Array:
    """Nucleus sampling over the top-k prefilter (k << V).

    lax.top_k returns values sorted descending, so the reference's
    sort+cumsum mask (`sampling.py:41-52`) applies directly to the
    prefiltered slice; the winner maps back through the index table.
    """
    vals, idx = jax.lax.top_k(scaled, k)  # [.., k] sorted desc
    cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
    keep = (cum <= p) | (jnp.arange(k) == 0)
    vals = jnp.where(keep, vals, NEG_INF)
    choice = jax.random.categorical(key, vals, axis=-1)  # [..] in [0, k)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    )


def sample(
    key: Optional[jax.Array],
    logits: jax.Array,
    cfg: SamplingConfig,
    temperature: Optional[float] = None,
) -> jax.Array:
    """logits [..., V] -> sampled token ids [...] (int32)."""
    if cfg.name == "deterministic":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t = temperature if temperature is not None else cfg.temperature
    scaled = logits / t

    if cfg.name == "top_p" and 0 < cfg.top_p_prefilter < logits.shape[-1]:
        return _nucleus_sample_prefiltered(
            key, scaled, cfg.top_p, cfg.top_p_prefilter
        )

    if cfg.name == "top_k":
        scaled = top_k_filter(scaled, cfg.top_k)
    elif cfg.name == "top_p":
        scaled = top_p_filter_bisect(scaled, cfg.top_p)
    elif cfg.name == "gumbel":
        # the reference adds gumbel noise and then *samples* from the noisy
        # softmax (`sampling.py:57-62`) — i.e. doubly stochastic
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, scaled.shape)
        c = 1e-30
        scaled = scaled + -jnp.log(-jnp.log(u + c) + c)
    elif cfg.name == "random":
        pass
    else:
        raise ValueError(f"unknown sampling strategy: {cfg.name}")

    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
