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

Forward-only kernels, differentiable wrappers: both public entries
install a custom VJP whose backward routes through the XLA einsum
formulation (recompute-style remat), so frozen towers running
deterministic=True inside a training loss still autodiff.  Callers gate
on `deterministic` anyway so dropout-active training keeps pure XLA.

Supported bias: a per-key additive vector [B, S] (the key-padding "keep"
mask) — or, on the QKV-folded entry, real-valued per-head [B, H, S]
logits.  Causal or arbitrary [S, S] biases use the XLA path (the AR
decode never calls this kernel — it has its own single-query kernels in
decode_attention.py).

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


def _attend_block(q, k, v, keep_w, o_ref, nhead: int, q_chunk: int = 0,
                  per_head_keep: bool = False):
    # q/k/v [Bb, S, E] (scale pre-folded into q); keep_w [Bb, Hp, S] exp(bias)
    # — row 0 shared across heads, or (per_head_keep) row h for head h
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
        kw = None
        if keep_w is not None:
            kw = keep_w[:, h : h + 1, :] if per_head_keep else keep_w[:, 0:1, :]
        for c0, cn in chunks:
            qc = slice(c0, c0 + cn)
            scores = jax.lax.dot_general(  # [Bb, cn, S_k], contract Dh lanes
                q[:, qc, sl], kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if kw is not None:
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
                kept_any = jnp.max(kw, axis=-1, keepdims=True) > 0.0
                s_eff = jnp.where(kept_any, scores, 0.0)
                m_kept = jnp.max(
                    jnp.where(kw > 0.0, s_eff, -jnp.inf),
                    axis=-1, keepdims=True,
                )
                m = jnp.where(kept_any, m_kept, 0.0)
                # kept entries have scores <= m; the clamp only neuters
                # masked entries (their weight is zeroed by w anyway).
                # Dead rows: s_eff == m == 0 -> p uniform.
                p = jnp.exp(jnp.minimum(s_eff - m, 0.0))
                w = jnp.where(kept_any, kw, 1.0)
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


def _kernel_qkv(x_ref, w_ref, kw_ref, o_ref, *, nhead: int, q_chunk: int = 0):
    # Self-attention with the q/k/v projections folded IN-KERNEL: x [bb,S,E]
    # is read once and qkv = x @ wqkv [bb,S,3E] lives only in VMEM — XLA's
    # separate projections write + read three [B,S,E] tensors through HBM
    # (~1GB/layer at B=1024, S=330).  Biases never enter the kernel: bk
    # cancels in the softmax, bq rides in kw_ref as exp(per-key logit), bv
    # is a constant output offset added by the caller (see
    # fused_encoder_self_attention).
    x = x_ref[...]
    qkv = jax.lax.dot_general(  # [bb, S, 3E], f32 MXU accumulation
        x, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    E = x.shape[-1]
    _attend_block(
        qkv[..., :E], qkv[..., E : 2 * E], qkv[..., 2 * E :],
        kw_ref[...], o_ref, nhead, q_chunk, per_head_keep=True,
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
        kb = (
            key_bias[:, :, None, :]  # per-head [B, H, S]
            if key_bias.ndim == 3
            else key_bias[:, None, None, :]  # shared [B, S]
        )
        logits = logits + kb.astype(logits.dtype)
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


def _batch_block_qkv(B: int, S: int, E: int, itemsize: int) -> int:
    """Rows/grid-step for the QKV-folded kernel: x/o blocks (double-
    buffered) + the bf16 qkv tile + one head's f32 score tile + p + the
    per-head PV accumulator; wqkv is a constant block shared across steps."""
    budget = 12 * 1024 * 1024
    ss, sl = _round_up(S, 8), _round_up(S, 128)
    ep = _round_up(E, 128)
    per_row = (
        2 * 2 * ss * ep * itemsize  # x + o, double-buffered
        + ss * 3 * ep * itemsize  # qkv tile
        + 2 * ss * sl * 4  # scores + p (f32)
        + ss * 128 * 4  # per-head PV accumulator
    )
    weights = ep * 3 * ep * itemsize + 8 * sl * 4
    bb = max(1, (budget - weights) // per_row)
    while B % bb:
        bb -= 1
    return bb


def _reference_self_attention(x, wqkv, nhead, key_bias):
    E = x.shape[-1]
    qkv = (x @ wqkv.astype(x.dtype)).astype(x.dtype)
    return _reference_attention(
        qkv[..., :E], qkv[..., E : 2 * E], qkv[..., 2 * E :], nhead, key_bias
    )


@functools.partial(
    jax.jit, static_argnames=("nhead", "interpret", "block_b", "q_chunk")
)
def fused_encoder_self_attention(
    x: jax.Array,  # [B, S, E]
    wqkv: jax.Array,  # [E, 3E] — concat(Wq * scale, Wk, Wv)
    nhead: int,
    key_bias: jax.Array | None = None,  # [B,S] or PER-HEAD [B,H,S], real-valued OK
    interpret: bool = False,
    block_b: int | None = None,
    q_chunk: int | None = None,
) -> jax.Array:
    """Bias-free self-attention with in-kernel q/k/v projection.

    Computes softmax((x Wq s)(x Wk)^T + key_bias) (x Wv) reading x from HBM
    exactly once.  Projection BIASES are exactly recoverable outside the
    kernel (see fold_qkv_biases / the caller in models/nn.py):

      * bk: adds q_i . bk to every key's logit of query i — a per-query
        constant, which softmax is invariant to.  Dropped exactly.
      * bq: adds (bq s) . (x_j Wk) to key j for EVERY query — a per-key
        additive logit t_j = x_j (Wk (bq s)); the caller computes t with
        one cheap XLA matvec and passes it inside key_bias.  (The constant
        (bq s) . bk term is again per-query, dropped.)
      * bv: out = sum_j p_ij (x_j Wv + bv) = (sum_j p_ij x_j Wv) + bv since
        the p row sums to 1 — the caller adds bv to the kernel output.

    key_bias may therefore be any real-valued per-key logit; -1e9 entries
    (padding) still underflow to weight 0 exactly, and fully-masked rows
    fall back to uniform attention like the XLA oracle.  Differentiable via
    custom_vjp -> XLA reference (recompute remat).
    """

    @jax.custom_vjp
    def _attn(x, wqkv, key_bias):
        return _fused_qkv_forward(
            x, wqkv, nhead, key_bias, interpret, block_b, q_chunk
        )

    def _fwd(x, wqkv, key_bias):
        return _attn(x, wqkv, key_bias), (x, wqkv, key_bias)

    def _bwd(res, g):
        x, wqkv, key_bias = res
        _, vjp = jax.vjp(
            lambda x_, w_: _reference_self_attention(x_, w_, nhead, key_bias),
            x, wqkv,
        )
        dx, dw = vjp(g)
        return dx, dw, None

    _attn.defvjp(_fwd, _bwd)
    return _attn(x, wqkv, key_bias)


def _fused_qkv_forward(
    x: jax.Array,
    wqkv: jax.Array,
    nhead: int,
    key_bias: jax.Array | None,
    interpret: bool,
    block_b: int | None,
    q_chunk: int | None,
) -> jax.Array:
    B, S, E = x.shape
    qc = _q_chunk(S) if q_chunk is None else q_chunk
    bb = block_b or _batch_block_qkv(B, S, E, x.dtype.itemsize)
    x_spec = pl.BlockSpec((bb, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((E, 3 * E), lambda b: (0, 0), memory_space=pltpu.VMEM)
    flops = 2 * B * S * E * 3 * E + 2 * B * S * S * E * 2
    bytes_acc = 2 * B * S * E * x.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_acc, transcendentals=B * nhead * S * S
    )
    if key_bias is None:
        key_bias = jnp.zeros((B, S), jnp.float32)
    # keep-weights [B, Hp, S]: row h = exp(head h's per-key logit).  A
    # shared [B, S] bias is broadcast to all rows; the sublane dim is
    # padded to >=8 (size-1 sublane VMEM operands are rejected) with
    # zero-logit rows that no head reads.
    hp = max(8, _round_up(nhead, 8))
    kb = key_bias.astype(jnp.float32)
    if kb.ndim == 2:
        kb = jnp.broadcast_to(kb[:, None, :], (B, hp, S))
    elif nhead < hp:
        kb = jnp.concatenate(
            [kb, jnp.zeros((B, hp - nhead, S), jnp.float32)], axis=1
        )
    keep_w = jnp.exp(kb)
    return pl.pallas_call(
        functools.partial(_kernel_qkv, nhead=nhead, q_chunk=qc),
        out_shape=jax.ShapeDtypeStruct((B, S, E), x.dtype),
        grid=(B // bb,),
        in_specs=[
            x_spec,
            w_spec,
            pl.BlockSpec((bb, hp, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=x_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(x, wqkv.astype(x.dtype), keep_w)


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
