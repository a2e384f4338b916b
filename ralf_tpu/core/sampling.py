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
    """Mirrors the hydra sampling group (`train/config/sampling.py:50-58`)."""

    name: str = "random"  # deterministic | random | top_k | top_p | gumbel
    temperature: float = 1.0
    top_k: int = 5
    top_p: float = 0.9


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits along the last axis, -inf the rest."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering; always keeps the argmax."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # keep sorted positions whose prefix mass <= p; position 0 always kept
    keep_sorted = (cum <= p) | (jnp.arange(logits.shape[-1]) == 0)
    # threshold = min kept logit per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


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

    if cfg.name == "top_k":
        scaled = top_k_filter(scaled, cfg.top_k)
    elif cfg.name == "top_p":
        scaled = top_p_filter(scaled, cfg.top_p)
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
