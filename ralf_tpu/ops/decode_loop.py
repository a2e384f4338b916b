"""Fused, fully-batched, KV-cached autoregressive decode — the framework's
hot path.

One `lax.scan` over `max_token_length` single-token steps; per step:
embed -> N cached decoder layers (cross-attn K/V projected ONCE before the
scan) -> logit head -> static per-position `token_mask` -> per-sample
`forced_tokens` restriction -> sampling.  Everything stays on device; the
whole decode is one XLA program.

This replaces the reference decode (`models/autoreg.py:166-192`), which
re-forwards the ENTIRE prefix through the decoder at every step (50x
redundant compute at full length), moves logits to host for per-batch-index
Python restriction loops (`decoding_space_restriction.py:17-38`) and
re-uploads — the throughput gap called out in BASELINE.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.sampling import NEG_INF, SamplingConfig, sample
from ralf_tpu.models.nn import TokenDecoder


def ar_decode(
    decoder: TokenDecoder,
    params,
    memory: jax.Array,  # [B, M, D]
    mem_keep: Optional[jax.Array],  # [B, M] or None (reference parity: None)
    token_mask: jax.Array,  # [L, V] bool — static per-position validity
    forced: jax.Array,  # [B, L] int32 — -1 free, else forced token id
    max_len: int,  # L = tokenizer.max_token_length (static)
    bos_id: int,
    pad_id: int,
    sampling: SamplingConfig,
    key: jax.Array,
    kv_quant: bool = False,  # int8 cross-KV (halves per-step HBM traffic)
    self_quant: bool = False,  # int8 per-token self caches (halves that stream)
) -> jax.Array:
    """Returns sampled token sequences [B, L] (BOS stripped)."""
    B = memory.shape[0]
    V = token_mask.shape[1]

    cache = decoder.apply(
        params, B, max_len, self_quant, method=TokenDecoder.init_cache
    )
    cross = decoder.apply(params, memory, kv_quant, method=TokenDecoder.cross_kv)
    bos = jnp.full((B,), bos_id, jnp.int32)
    keep0 = jnp.zeros((B, max_len), bool)
    positions = jnp.arange(max_len)
    vocab_iota = jnp.arange(V)

    def step(carry, t):
        cache, prev_tok, keep, key = carry
        # register the fed token's validity (pad tokens are not attended)
        keep = jax.lax.dynamic_update_slice_in_dim(
            keep, (prev_tok != pad_id)[:, None], t, axis=1
        )
        self_keep = keep & (positions <= t)[None, :]

        x = decoder.apply(params, prev_tok, t, method=TokenDecoder.embed_step)
        x, cache = decoder.apply(
            params, x, t, cache, cross, self_keep, mem_keep, method=TokenDecoder.step
        )
        logits = decoder.apply(params, x, method=TokenDecoder.head)[:, 0]  # [B, V]

        # static positional validity (label slot vs geometry slot vs special)
        pos_ok = jax.lax.dynamic_slice_in_dim(token_mask, t, 1, axis=0)[0]
        logits = jnp.where(pos_ok[None, :], logits, NEG_INF)

        # per-sample task restriction: forced token wins outright
        f = jax.lax.dynamic_slice_in_dim(forced, t, 1, axis=1)[:, 0]  # [B]
        is_forced = (f >= 0)[:, None]
        forced_logits = jnp.where(vocab_iota[None, :] == f[:, None], 0.0, NEG_INF)
        logits = jnp.where(is_forced, forced_logits, logits)

        tok = sample(jax.random.fold_in(key, t), logits, sampling)
        return (cache, tok, keep, key), tok

    (_, _, _, _), toks = jax.lax.scan(
        step, (cache, bos, keep0, key), jnp.arange(max_len)
    )
    return jnp.swapaxes(toks, 0, 1)  # [B, L]


def make_decode_fn(decoder: TokenDecoder, token_mask: np.ndarray, *,
                   max_len: int, bos_id: int, pad_id: int,
                   sampling: SamplingConfig):
    """Close over the static pieces; returns a jittable
    (params, memory, mem_keep, forced, key) -> tokens function."""
    tm = jnp.asarray(token_mask)

    @functools.partial(jax.jit, static_argnames=())
    def fn(params, memory, mem_keep, forced, key):
        return ar_decode(
            decoder, params, memory, mem_keep, tm, forced,
            max_len, bos_id, pad_id, sampling, key,
        )

    return fn
