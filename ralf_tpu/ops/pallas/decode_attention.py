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


# --------------------------------------------------------------------------
# int8-quantized K/V variant
# --------------------------------------------------------------------------


def quantize_kv(k_t: jax.Array, v_t: jax.Array):
    """[B, H, Dh, M] -> int8 tensors + per-(B,H) fp32 scales.

    Halves the decode loop's dominant HBM traffic (the per-step cross-KV
    reads).  Symmetric per-head absmax quantization; dequantization
    happens inside the kernel in VMEM so the bandwidth saving is real.
    """

    def q(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3), keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return xi.astype(jnp.int8), scale[:, :, 0, 0]  # [B, H]

    ki, ks = q(k_t)
    vi, vs = q(v_t)
    return ki, vi, ks, vs


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention_q8(
    q: jax.Array,  # [B, H, Dh]
    k_i8: jax.Array,  # [B, H, Dh, M] int8
    v_i8: jax.Array,
    k_scale: jax.Array,  # [B, H] fp32
    v_scale: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """int8-KV variant.  The per-head scales fold OUTSIDE the kernel:
    k_scale into the query (scores are linear in q), v_scale onto the
    output (linear in v) — so the kernel is the plain fused attention on
    int8 blocks and the tiny scale tensors never hit VMEM tiling rules."""
    B, H, Dh = q.shape
    M = k_i8.shape[-1]
    q_scaled = q.astype(jnp.float32) * (Dh**-0.5) * k_scale[:, :, None]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, M), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Dh * M * 2,
            bytes_accessed=2 * B * H * Dh * M,
            transcendentals=B * H * M,
        ),
        interpret=interpret,
    )(q_scaled, k_i8, v_i8)
    return (out * v_scale[:, :, None]).astype(q.dtype)
