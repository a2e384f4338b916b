"""Pallas TPU kernel: fused single-query attention for the AR decode loop.

The decode hot op is one query token attending over the precomputed
cross-attention K/V caches ([B, H, Dh, M] bandwidth-friendly layout, see
models/nn.py project_kv_t).  XLA lowers the einsum pair + softmax to
three kernels with intermediate HBM round-trips for the [B, H, M] score
tensor; this kernel fuses score -> softmax -> value reduction in VMEM so
each K/V byte is read exactly once per step, with the grid pipelining
per-batch blocks (double-buffered DMA) behind compute.

Used by MultiHeadAttention.attend_t when running on TPU with no key bias
(the decode path); falls back to the einsum formulation elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks: q [1, H, Dh], k/v [1, H, Dh, M], o [1, H, Dh]
    q = q_ref[0].astype(jnp.float32)  # [H, Dh]
    k = k_ref[0].astype(jnp.float32)  # [H, Dh, M]
    v = v_ref[0].astype(jnp.float32)
    scores = jnp.sum(q[:, :, None] * k, axis=1) * scale  # [H, M]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.sum(p[:, None, :] * v, axis=2).astype(o_ref.dtype)  # [H, Dh]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention(
    q: jax.Array,  # [B, H, Dh]
    k_t: jax.Array,  # [B, H, Dh, M]
    v_t: jax.Array,  # [B, H, Dh, M]
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k / sqrt(Dh)) v for a single query position, [B, H, Dh]."""
    B, H, Dh = q.shape
    M = k_t.shape[-1]
    scale = Dh**-0.5
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Dh * M * 2,
            bytes_accessed=2 * B * H * Dh * M * k_t.dtype.itemsize,
            transcendentals=B * H * M,
        ),
        interpret=interpret,
    )(q, k_t, v_t)


def pallas_decode_available() -> bool:
    return jax.default_backend() == "tpu"
