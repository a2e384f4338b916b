"""Pallas TPU kernel: fused bidirectional self-attention for encoder stacks.

Layout sequences are short (image memory 330 tokens, constraint sequences
<64, FIDNet layouts 10), so the whole [S, S] score matrix for a batch
block fits in VMEM.  XLA materializes the fp32 score tensor in HBM
between the QK matmul, the softmax, and the PV matmul — at B=1024, H=8,
S=330 that is ~3.6GB per layer per pass of pure round-trip traffic, which
made the 6-layer ViT encoder ~7x slower than its FLOP bound.  This kernel
runs score -> (+key bias) -> softmax -> value reduction entirely in VMEM.

Operands stay in the projections' natural [B, S, E] layout (E = H * Dh on
the 128-lane axis, no padding); heads are split by static lane slices
inside VMEM.  Transposing to a head-major layout in HBM instead costs 4
minor-dim transposes per layer, which measured ~3x the kernel's own
runtime, and [.., Dh=32] layouts pad HBM tiles 4x.

Inference-only (no custom VJP): callers gate on `deterministic` so the
training path keeps XLA's autodiff-able einsum formulation.

Supported bias: an optional per-key additive vector [B, S] (the
key-padding "keep" mask).  Causal or arbitrary [S, S] biases use the XLA
path (the AR decode never calls this kernel — it has its own single-query
kernels in decode_attention.py).

Mosaic constraint (this TPU toolchain): ADDING a [bb, 1, S] vector to the
MXU dot output aborts the compiler ("limits <= dim" SIGABRT) at any
S > ~8, in every formulation tried (pre- or post-copy, slice or
broadcast) — while MULTIPLYING the same shape after the exp compiles and
runs.  The kernel therefore receives exp(bias) "keep weights" and
computes p = exp(min(scores - m, 0)) * w, which is exactly softmax with
additive masking.  m is the max over KEPT scores (select-formulated, not
an add), so kept weights cannot collectively underflow, and fully-masked
rows fall back to uniform attention — matching the XLA oracle, where the
fp32 add of the finite NEG_INF bias rounds every logit to exactly -1e9 —
instead of 0/0 NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend_block(q, k, v, keep_w, o_ref, nhead: int, q_chunk: int = 0):
    # q/k/v [Bb, S, E] (scale pre-folded into q); keep_w [Bb, 1, S] exp(bias)
    # multiplied in AFTER the exp (see module docstring).  Each head's output
    # is stored straight into its o_ref lane slice — holding all H lane-padded
    # [Bb, S, Dh] head buffers for a final concat OOMs scoped VMEM at small S.
    # q_chunk > 0 additionally tiles the query dim so only a [Bb, q_chunk, S]
    # score tile is live at a time, letting the batch block grow.
    Bb, S, E = q.shape
    Dh = E // nhead
    chunks = [(0, S)]
    if 0 < q_chunk < S:
        chunks = [(c, min(q_chunk, S - c)) for c in range(0, S, q_chunk)]
    for h in range(nhead):
        sl = slice(h * Dh, (h + 1) * Dh)
        kh, vh = k[..., sl], v[..., sl]
        for c0, cn in chunks:
            qc = slice(c0, c0 + cn)
            scores = jax.lax.dot_general(  # [Bb, cn, S_k], contract Dh lanes
                q[:, qc, sl], kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if keep_w is not None:
                # Masked softmax without NaN poisoning (ADVICE r1, medium):
                #  * m must be the max over KEPT scores — a masked score far
                #    above every kept one would otherwise underflow all kept
                #    weights to 0 and give 0/0.
                #  * a fully-masked row (zero-element layout through the
                #    FIDNet dec_transformer) must match the XLA oracle:
                #    fp32 `scores + (-1e9)` rounds every logit to exactly
                #    -1e9 (eps at 1e9 is 64), so the oracle is UNIFORM
                #    attention — not NaN.
                # Only select/min/mul forms are used below; the [bb,1,S]
                # vector ADD that Mosaic rejects (module docstring) never
                # appears.
                kept_any = jnp.max(keep_w, axis=-1, keepdims=True) > 0.0
                s_eff = jnp.where(kept_any, scores, 0.0)
                m_kept = jnp.max(
                    jnp.where(keep_w > 0.0, s_eff, -jnp.inf),
                    axis=-1, keepdims=True,
                )
                m = jnp.where(kept_any, m_kept, 0.0)
                # kept entries have scores <= m; the clamp only neuters
                # masked entries (their weight is zeroed by w anyway).
                # Dead rows: s_eff == m == 0 -> p uniform.
                p = jnp.exp(jnp.minimum(s_eff - m, 0.0))
                w = jnp.where(kept_any, keep_w, 1.0)
                p = p * w
                p = p / jnp.maximum(
                    jnp.sum(p, axis=-1, keepdims=True), 1e-30
                )
            else:
                m = jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
            p = p.astype(v.dtype)
            o_ref[:, qc, sl] = jax.lax.dot_general(  # [Bb, cn, Dh]
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, nhead: int, q_chunk: int = 0):
    _attend_block(
        q_ref[...], k_ref[...], v_ref[...], None, o_ref, nhead, q_chunk
    )


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, nhead: int,
                 q_chunk: int = 0):
    _attend_block(
        q_ref[...], k_ref[...], v_ref[...], b_ref[:, 0:1, :], o_ref, nhead,
        q_chunk
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _q_chunk(S: int) -> int:
    """Query-dim tiling is DISABLED by default: every chunked variant
    (q_chunk 32/64/128 x bb 8-32 at S=330) aborts this Mosaic toolchain at
    compile — the ragged final chunk's partial-sublane o_ref store is the
    suspected trigger.  The q_chunk parameter remains for experimentation
    (interpret mode and CPU are fine)."""
    return 0


def _batch_block(B: int, H: int, S: int, E: int, itemsize: int,
                 q_chunk: int = 0) -> int:
    """Batch rows per grid step, sized against the 16MB scoped-VMEM limit
    using PADDED tile shapes (sublane 8 / lane 128 — at S=4 the f32 score
    tile is 1024x the nominal bytes).  Budget covers the live score + prob
    tiles, the double-buffered q/k/v/o blocks, and one head accumulator.
    Budget 12MB of the 16MB scoped limit: at S=330 un-chunked this gives
    bb=4 — bb=2 makes 512 tiny grid steps and measured 76.8ms/layer (vs
    ~1ms at bb=4), while bb=8 un-chunked fails to compile (scoped OOM)."""
    budget = 12 * 1024 * 1024
    sq = min(S, q_chunk) if q_chunk else S
    ss, sl = _round_up(sq, 8), _round_up(S, 128)
    ep = _round_up(E, 128)
    per_row = (
        2 * ss * sl * 4  # scores + p (f32)
        + 2 * 4 * _round_up(S, 8) * ep * itemsize  # q/k/v/o blocks, 2x-buffered
        + ss * _round_up(E // H, 128) * 4  # per-head PV accumulator
    )
    bb = max(1, budget // per_row)
    while B % bb:
        bb -= 1
    return bb


def _reference_attention(q, k, v, nhead, key_bias):
    """XLA einsum formulation — the kernel's autodiff oracle."""
    B, S, E = q.shape
    Dh = E // nhead
    qh = q.reshape(B, S, nhead, Dh)
    kh = k.reshape(B, S, nhead, Dh)
    vh = v.reshape(B, S, nhead, Dh)
    logits = jnp.einsum(
        "bshd,bmhd->bhsm", qh, kh, preferred_element_type=jnp.float32
    )
    if key_bias is not None:
        logits = logits + key_bias[:, None, None, :].astype(logits.dtype)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhsm,bmhd->bshd", p, vh).reshape(B, S, E)


@functools.partial(
    jax.jit, static_argnames=("nhead", "interpret", "block_b", "q_chunk")
)
def fused_encoder_attention(
    q: jax.Array,  # [B, S, E] — scale already applied
    k: jax.Array,  # [B, S, E]
    v: jax.Array,  # [B, S, E]
    nhead: int,
    key_bias: jax.Array | None = None,  # [B, S] additive (0 keep / -inf drop)
    interpret: bool = False,
    block_b: int | None = None,  # override rows/grid-step (must divide B)
    q_chunk: int | None = None,  # override query-dim tile inside the kernel
) -> jax.Array:
    """Multi-head softmax(q k^T + key_bias) v fused in VMEM -> [B, S, E].

    Differentiable: the Pallas call has no VJP of its own, so a custom_vjp
    routes the backward through the XLA einsum formulation (recompute-style
    remat).  This matters for frozen towers (e.g. the RALF FIDNet layout
    encoder) that run deterministic=True INSIDE a training loss — autodiff
    linearizes through them even when their params receive no update.
    """

    @jax.custom_vjp
    def _attn(q, k, v, key_bias):
        return _fused_forward(q, k, v, nhead, key_bias, interpret, block_b, q_chunk)

    def _fwd(q, k, v, key_bias):
        return _attn(q, k, v, key_bias), (q, k, v, key_bias)

    def _bwd(res, g):
        q, k, v, key_bias = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_attention(q_, k_, v_, nhead, key_bias),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None

    _attn.defvjp(_fwd, _bwd)
    return _attn(q, k, v, key_bias)


def _fused_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    nhead: int,
    key_bias: jax.Array | None,
    interpret: bool,
    block_b: int | None,
    q_chunk: int | None,
) -> jax.Array:
    B, S, E = q.shape
    qc = _q_chunk(S) if q_chunk is None else q_chunk
    bb = block_b or _batch_block(B, nhead, S, E, q.dtype.itemsize, qc)
    qkv_spec = pl.BlockSpec((bb, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * B * S * S * E * 2
    bytes_acc = 4 * B * S * E * q.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_acc, transcendentals=B * nhead * S * S
    )
    if key_bias is None:
        return pl.pallas_call(
            functools.partial(_kernel, nhead=nhead, q_chunk=qc),
            out_shape=jax.ShapeDtypeStruct((B, S, E), q.dtype),
            grid=(B // bb,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec],
            out_specs=qkv_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
    # bias rides as exp(bias) keep-weights shaped [B, 8, S]: a size-1
    # sublane dim in a VMEM operand is rejected by the tiling rules, and
    # 8 identical rows cost nothing at this size.  exp(-1e9) underflows
    # to exactly 0.0, exp(0) == 1.0 — the multiplicative form of the mask.
    keep_w = jnp.exp(key_bias.astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_kernel_bias, nhead=nhead, q_chunk=qc),
        out_shape=jax.ShapeDtypeStruct((B, S, E), q.dtype),
        grid=(B // bb,),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((bb, 8, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, jnp.broadcast_to(keep_w[:, None, :], (B, 8, S)))
