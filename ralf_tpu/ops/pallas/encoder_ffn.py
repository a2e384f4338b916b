"""Pallas TPU kernel: fused transformer FFN (Linear -> ReLU -> Linear).

XLA materializes the hidden activation h = relu(x W1 + b1) in HBM between
the two matmuls: at B=1024, S=330, F=1024 that is ~0.7GB written + read
back per layer per pass — the FFN runs at the HBM roofline, ~3x its FLOP
bound.  This kernel keeps h in VMEM: HBM traffic drops from ~1.7GB to the
unavoidable x read + out write (~0.35GB) per layer.

Bias handling under this Mosaic toolchain (see encoder_attention.py's
abort inventory: ADDING a broadcast vector to an MXU dot output SIGABRTs):

    relu(h + b1) = max(h, -b1) + b1        (max/select forms compile fine)
    (g + b1) W2 + b2 = g W2 + (b1 W2 + b2)

so the kernel computes ``max(x W1, -b1) W2`` with only a broadcast MAX on
the dot output, and the caller adds the constant tail ``b1 W2 + b2``
outside the kernel (one fused elementwise pass that XLA merges into the
residual add it performs anyway).  ReLU only — gelu does not decompose
this way; gelu callers keep the XLA path.

Inference-forward only by construction; `fused_ffn` installs a custom VJP
that routes the backward through the XLA formulation (recompute-style
remat), so it is safe inside a training loss for frozen towers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, nb1_ref, w2_ref, o_ref):
    # x [bb, S, E]; w1 [E, F]; nb1 [8, F] (-b1, 8 identical sublane rows —
    # size-1 sublane VMEM operands are rejected by the tiling rules);
    # w2 [F, E].  h/g live only in VMEM.
    x = x_ref[...]
    h = jax.lax.dot_general(  # [bb, S, F]
        x, w1_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = jnp.maximum(h, nb1_ref[0:1, :][None].astype(jnp.float32))
    g = g.astype(x.dtype)
    o_ref[...] = jax.lax.dot_general(  # [bb, S, E]
        g, w2_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_block(B: int, S: int, E: int, F: int, itemsize: int) -> int:
    """Rows per grid step against the scoped-VMEM limit, padded tiles.
    Live per row: x/o blocks (double-buffered) + the f32 h tile + the
    bf16 g tile; weights are constant blocks shared across steps."""
    budget = 12 * 1024 * 1024
    sp, ep, fp = _round_up(S, 8), _round_up(E, 128), _round_up(F, 128)
    per_row = (
        2 * 2 * sp * ep * itemsize  # x + o, double-buffered
        + sp * fp * 4  # h (f32 dot output)
        + sp * fp * itemsize  # g (cast)
    )
    weights = (ep * fp + fp * ep) * itemsize + 8 * fp * itemsize
    bb = max(1, (budget - weights) // per_row)
    while B % bb:
        bb -= 1
    return bb


def _reference_ffn(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0).astype(x.dtype) @ w2 + b2


def _fused_forward(x, w1, b1, w2, b2, interpret, block_b):
    B, S, E = x.shape
    F = w1.shape[1]
    bb = block_b or _batch_block(B, S, E, F, x.dtype.itemsize)
    x_spec = pl.BlockSpec((bb, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    w_spec = lambda r, c: pl.BlockSpec(  # noqa: E731 — constant weight block
        (r, c), lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * B * S * E * F * 2,
        bytes_accessed=2 * B * S * E * x.dtype.itemsize,
        transcendentals=0,
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, E), x.dtype),
        grid=(B // bb,),
        in_specs=[
            x_spec,
            w_spec(E, F),
            w_spec(8, F),
            w_spec(F, E),
        ],
        out_specs=x_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype),
        jnp.broadcast_to((-b1.astype(x.dtype))[None, :], (8, F)),
        w2.astype(x.dtype),
    )
    # constant tail (b1 W2 + b2): exact — see module docstring.  XLA fuses
    # this add into the caller's residual add.
    tail = (b1.astype(jnp.float32) @ w2.astype(jnp.float32)) + b2.astype(jnp.float32)
    return out + tail.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def fused_ffn(
    x: jax.Array,  # [B, S, E]
    w1: jax.Array,  # [E, F]
    b1: jax.Array,  # [F]
    w2: jax.Array,  # [F, E]
    b2: jax.Array,  # [E]
    interpret: bool = False,
    block_b: int | None = None,
) -> jax.Array:
    """relu(x W1 + b1) W2 + b2 with the hidden tile kept in VMEM."""

    @jax.custom_vjp
    def _ffn(x, w1, b1, w2, b2):
        return _fused_forward(x, w1, b1, w2, b2, interpret, block_b)

    def _fwd(x, w1, b1, w2, b2):
        return _ffn(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def _bwd(res, g):
        x, w1, b1, w2, b2 = res
        _, vjp = jax.vjp(_reference_ffn, x, w1, b1, w2, b2)
        return vjp(g)

    _ffn.defvjp(_fwd, _bwd)
    return _ffn(x, w1, b1, w2, b2)
