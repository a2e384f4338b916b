"""Masking helpers for masked-parallel decoders (MaskGIT) and diffusion.

Parity with `image2layout/train/helpers/mask.py`: `batch_topk_mask` keeps
the reference's -inf >= -inf quirk (a row whose mask is all-False returns
all-True — MaskGIT's uncond sampling RELIES on this to re-mask everything
after step 0, `models/maskgit.py:196-268`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def batch_topk_mask(
    scores: jax.Array,  # [B, S] float
    topk: jax.Array,  # [B] int >= 1
    mask: Optional[jax.Array] = None,  # [B, S] True = eligible
) -> tuple[jax.Array, jax.Array]:
    """(topk_mask [B,S] bool, kth_score [B,1]): the k largest eligible
    scores per row (>= k-th threshold semantics, ties included)."""
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    sorted_desc = jnp.sort(scores, axis=-1)[:, ::-1]
    idx = jnp.clip(topk - 1, 0, scores.shape[1] - 1)[:, None]
    kth = jnp.take_along_axis(sorted_desc, idx, axis=1)  # [B, 1]
    return scores >= kth, kth


def sequence_mask(length: jax.Array, maxlen: int) -> jax.Array:
    """[B] lengths -> [B, maxlen] bool."""
    return jnp.arange(maxlen)[None, :] < length[:, None]


def sample_mask(key: jax.Array, mask: jax.Array, ratio: jax.Array) -> jax.Array:
    """Randomly pick ~ratio of True positions per row (at least 1)."""
    scores = jax.random.uniform(key, mask.shape)
    n_elem = jnp.sum(mask, axis=-1)
    topk = jnp.maximum((ratio * n_elem).astype(jnp.int32), 1)
    picked, _ = batch_topk_mask(scores, topk, mask=mask)
    return picked & mask


def mask_schedule(ratio: jax.Array, schedule: str = "linear") -> jax.Array:
    """MaskGIT mask-rate schedules (`models/maskgit.py:25-60`):
    ratio in [0,1] -> mask rate in (0,1]."""
    if schedule == "linear":
        r = 1.0 - ratio
    elif schedule == "cosine":
        r = jnp.cos(jnp.pi * 0.5 * ratio)
    elif schedule == "square":
        r = 1.0 - ratio**2
    elif schedule == "cubic":
        r = 1.0 - ratio**3
    elif schedule == "sqrt":
        r = 1.0 - jnp.sqrt(ratio)
    else:
        raise NotImplementedError(schedule)
    return jnp.clip(r, 1e-6, 1.0).astype(jnp.float32)
