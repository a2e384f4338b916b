"""Transformer building blocks with first-class KV-cached decoding.

Functional parity with the reference's torch blocks
(`image2layout/train/models/common/common.py:13-135` BaseDecoder,
`nn.TransformerEncoder/Decoder` pre-LN stacks used across the model zoo),
redesigned for TPU decoding:

  * every attention layer exposes an explicit, statically-shaped KV cache
    so autoregressive sampling is one `lax.scan` over single-token steps —
    the reference re-forwards the whole prefix every step with no cache
    (`models/autoreg.py:166-192`);
  * cross-attention K/V over the encoder memory are projected once per
    sequence, not once per step;
  * masks are additive bias tensors computed on device, shapes static.

Conventions: padding masks are True for VALID positions ("keep"), the
inverse of torch's key_padding_mask.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


def keep_to_bias(keep: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool keep-mask [..., S] -> additive bias [..., S] (0 keep / -inf drop)."""
    return jnp.where(keep, 0.0, NEG_INF).astype(dtype)


def causal_bias(S: int, dtype=jnp.float32) -> jax.Array:
    """[S, S] additive causal bias."""
    i = jnp.arange(S)[:, None]
    j = jnp.arange(S)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)


class MultiHeadAttention(nn.Module):
    """Standard MHA with separable K/V projection for cache reuse."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # fuse the single-query decode attention into one Pallas kernel on TPU
    use_pallas_decode: bool = True
    # fold the q/k/v projections INTO the self-attention kernel: measured
    # ~4% SLOWER end-to-end at B=2048 (bb=4 cap; bb=8 exceeds scoped VMEM;
    # the extra in-kernel dots serialize with softmax on the same grid
    # step — BENCH_NOTES negative results), so OFF by default.
    use_qkv_folded: bool = False

    def setup(self) -> None:
        assert self.d_model % self.nhead == 0
        self.head_dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.attn_drop = nn.Dropout(self.dropout)

    def _split(self, x: jax.Array) -> jax.Array:
        B, S, _ = x.shape
        return x.reshape(B, S, self.nhead, self.head_dim)

    def project_kv(self, kv_in: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[B, M, D] -> (k, v) each [B, M, H, Dh].  Used for cache fills."""
        return self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

    def project_kv_t(self, kv_in: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[B, M, D] -> (k, v) each [B, H, Dh, M] — the DECODE cache layout.

        With head_dim=32, the natural [B, M, H, Dh] layout puts 32 elements
        on the 128-lane axis and streams K/V at ~1/4 HBM bandwidth; putting
        M last (lanes) and Dh second-to-last (sublanes) lets the per-step
        single-query attention read the caches at full bandwidth.  This is
        the hot-loop memory layout — measured ~5x decode speedup.
        """
        k, v = self.project_kv(kv_in)
        return jnp.transpose(k, (0, 2, 3, 1)), jnp.transpose(v, (0, 2, 3, 1))

    def attend_t(
        self,
        q_in: jax.Array,  # [B, 1, D]
        k_t: jax.Array,  # [B, H, Dh, M]
        v_t: jax.Array,  # [B, H, Dh, M]
        bias: Optional[jax.Array] = None,  # broadcastable to [B, H, M]
    ) -> jax.Array:
        """Single-query attention against transposed caches -> [B, 1, D]."""
        q = self._split(self.q_proj(q_in))[:, 0]  # [B, H, Dh]
        B = q_in.shape[0]
        if bias is None and self.use_pallas_decode:
            from ralf_tpu.ops.pallas.decode_attention import (
                fused_decode_attention,
                pallas_decode_available,
            )

            if pallas_decode_available():
                out = fused_decode_attention(q.astype(self.dtype), k_t, v_t)
                return self.out_proj(out.reshape(B, 1, self.d_model))
        scale = jnp.asarray(self.head_dim, self.dtype) ** -0.5
        logits = jnp.einsum(
            "bhd,bhdm->bhm", q * scale, k_t, preferred_element_type=jnp.float32
        )
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhm,bhdm->bhd", probs, v_t)
        return self.out_proj(out.reshape(B, 1, self.d_model))

    def attend_shared(
        self,
        q_in: jax.Array,  # [B, 1, D]
        mem: jax.Array,  # [B, M, E] shared encoder memory (E == d_model)
        bias: Optional[jax.Array] = None,  # broadcastable to [B, H, M]
    ) -> jax.Array:
        """Weight-folded single-query cross-attention over the SHARED memory.

        Exact same math as attend_t on K = mem Wk + bk / V = mem Wv + bv:
        the K bias shifts every position's score equally (softmax-invariant)
        and the V bias rides through the probability simplex (sum(p) = 1),
        so scores_h = (scale q_h Wk_h^T) mem^T and
        out_h = (probs_h mem) Wv_h + bv_h.  The decode step then streams one
        copy of the memory per layer instead of projected K AND V — half the
        HBM traffic of the cache layout on the dominant decode stream.
        """
        B = q_in.shape[0]
        E = mem.shape[-1]
        q = self._split(self.q_proj(q_in))[:, 0]  # [B, H, Dh]
        wk = self.k_proj.variables["params"]["kernel"]  # [E, D]
        wk = wk.reshape(E, self.nhead, self.head_dim)
        scale = self.head_dim**-0.5
        qt = jnp.einsum(
            "bhd,ehd->bhe", q.astype(jnp.float32) * scale, wk.astype(jnp.float32)
        ).astype(self.dtype)
        if bias is None and self.use_pallas_decode:
            from ralf_tpu.ops.pallas.decode_attention import (
                fused_decode_shared_attention,
                pallas_decode_available,
            )

            if pallas_decode_available():
                ot = fused_decode_shared_attention(qt, mem.astype(self.dtype))
            else:
                ot = None
        else:
            ot = None
        if ot is None:
            scores = jnp.einsum(
                "bhe,bme->bhm", qt, mem.astype(qt.dtype),
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                scores = scores + bias.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ot = jnp.einsum("bhm,bme->bhe", probs, mem.astype(self.dtype))
        wv = self.v_proj.variables["params"]["kernel"].reshape(
            E, self.nhead, self.head_dim
        )
        bv = self.v_proj.variables["params"]["bias"].reshape(
            self.nhead, self.head_dim
        )
        out = (
            jnp.einsum("bhe,ehd->bhd", ot.astype(self.dtype), wv.astype(self.dtype))
            + bv.astype(self.dtype)
        )
        return self.out_proj(out.reshape(B, 1, self.d_model))

    def attend_shared_q8(
        self,
        q_in: jax.Array,  # [B, 1, D]
        mem_i8: jax.Array,  # [B, M, E] int8 shared memory
        mem_scale: jax.Array,  # [B, M] f32 per-token dequant scale
        bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        """attend_shared over int8-quantized shared memory (one quantized
        copy serves every decoder layer — half the bytes of the bf16
        shared path on the dominant decode stream).  Per-token scales
        enter as elementwise multiplies on the score/prob tiles."""
        B = q_in.shape[0]
        E = mem_i8.shape[-1]
        q = self._split(self.q_proj(q_in))[:, 0]  # [B, H, Dh]
        wk = self.k_proj.variables["params"]["kernel"].reshape(
            E, self.nhead, self.head_dim
        )
        scale = self.head_dim**-0.5
        qt = jnp.einsum(
            "bhd,ehd->bhe", q.astype(jnp.float32) * scale, wk.astype(jnp.float32)
        ).astype(self.dtype)
        ot = None
        if bias is None and self.use_pallas_decode:
            from ralf_tpu.ops.pallas.decode_attention import (
                fused_decode_shared_attention_q8,
                fused_decode_shared_attention_q8mxu,
                pallas_decode_available,
                use_q8_mxu,
            )

            if pallas_decode_available():
                if use_q8_mxu():
                    # both dots consume the int8 memory directly on the MXU
                    # (int32 accumulation) — no [M, E] VPU dequant pass
                    ot = fused_decode_shared_attention_q8mxu(qt, mem_i8, mem_scale)
                else:
                    ot = fused_decode_shared_attention_q8(qt, mem_i8, mem_scale)
        if ot is None:  # reference path (CPU tests / bias)
            memf = mem_i8.astype(jnp.float32) * mem_scale[:, :, None]
            scores = jnp.einsum("bhe,bme->bhm", qt.astype(jnp.float32), memf)
            if bias is not None:
                scores = scores + bias.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            ot = jnp.einsum("bhm,bme->bhe", probs, memf).astype(self.dtype)
        ot = ot.astype(jnp.float32)
        wv = self.v_proj.variables["params"]["kernel"].reshape(
            E, self.nhead, self.head_dim
        )
        bv = self.v_proj.variables["params"]["bias"].reshape(
            self.nhead, self.head_dim
        )
        out = (
            jnp.einsum(
                "bhe,ehd->bhd", ot.astype(self.dtype), wv.astype(self.dtype)
            )
            + bv.astype(self.dtype)
        )
        return self.out_proj(out.reshape(B, 1, self.d_model))

    def attend_t_q8tok(
        self,
        q_in: jax.Array,  # [B, 1, D]
        k_i8: jax.Array,  # [B, H, Dh, T] int8 cache
        v_i8: jax.Array,
        ks: jax.Array,  # [B, H, T] f32 per-token dequant scale
        vs: jax.Array,
        bias: Optional[jax.Array] = None,  # broadcastable to [B, H, T]
    ) -> jax.Array:
        """Single-query self-attention over PER-TOKEN int8 caches.

        True cache is k[:, h, :, t] = ks[:, h, t] * k_i8[:, h, :, t]; both
        scales fold EXACTLY outside the int8 dots (scores are linear per
        key token, values linear per value token):
            logits = (q . k_i8) * ks ;  out = (p * vs) @ v_i8.
        XLA fuses the int8->compute convert into the dot operand read, so
        the caches stream from HBM at half the bf16 bytes — this is the
        decode scan's self-attention stream ([B, H, 32, T] x 2 x N layers
        per step)."""
        B = q_in.shape[0]
        q = self._split(self.q_proj(q_in))[:, 0]  # [B, H, Dh]
        scale = jnp.asarray(self.head_dim, jnp.float32) ** -0.5
        logits = jnp.einsum(
            "bhd,bhdm->bhm",
            (q.astype(jnp.float32) * scale).astype(self.dtype),
            k_i8.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) * ks
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = (probs * vs).astype(self.dtype)
        out = jnp.einsum(
            "bhm,bhdm->bhd", probs, v_i8.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return self.out_proj(out.reshape(B, 1, self.d_model))

    def attend_t_any(self, q_in: jax.Array, cross,
                     bias: Optional[jax.Array] = None) -> jax.Array:
        """attend_t over a shared-memory array (weight-folded path), an
        int8 shared pair (mem_i8 [B,M,E], per-token scale [B,M]), a plain
        (k, v) pair,
        or an int8-quantized (k, v, k_scale, v_scale) cache (bias only
        supported on the shared / unquantized paths)."""
        if isinstance(cross, jax.Array):
            return self.attend_shared(q_in, cross, bias)
        if len(cross) == 2 and cross[0].ndim == 3:  # (mem_i8, scale)
            return self.attend_shared_q8(q_in, cross[0], cross[1], bias)
        if len(cross) == 2:
            return self.attend_t(q_in, cross[0], cross[1], bias)
        assert bias is None, "int8 KV path has no bias support"
        from ralf_tpu.ops.pallas.decode_attention import (
            fused_decode_attention_q8,
            pallas_decode_available,
        )

        k_i8, v_i8, ks, vs = cross
        B = q_in.shape[0]
        q = self._split(self.q_proj(q_in))[:, 0]
        if pallas_decode_available():
            out = fused_decode_attention_q8(q.astype(self.dtype), k_i8, v_i8, ks, vs)
        else:  # reference path for CPU tests: dequantize then attend
            k_t = k_i8.astype(jnp.float32) * ks[:, :, None, None]
            v_t = v_i8.astype(jnp.float32) * vs[:, :, None, None]
            scale = jnp.asarray(self.head_dim, jnp.float32) ** -0.5
            logits = jnp.einsum("bhd,bhdm->bhm", q.astype(jnp.float32) * scale, k_t)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhm,bhdm->bhd", probs, v_t).astype(self.dtype)
        return self.out_proj(out.reshape(B, 1, self.d_model))

    def attend(
        self,
        q_in: jax.Array,
        k: jax.Array,
        v: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """q_in [B,S,D], k/v [B,M,H,Dh], bias broadcastable to [B,H,S,M]."""
        B, S = q_in.shape[:2]
        M = k.shape[1]
        # Fused VMEM attention on TPU for the inference encoder case:
        # same-length self-attention with no bias or a key-keep-only bias
        # ([B,1,1,M]).  Training and causal/structured-bias paths keep the
        # autodiff-able einsum formulation below.
        key_bias = None
        bias_ok = bias is None
        if (
            bias is not None
            and bias.ndim == 4
            and bias.shape[1] == 1
            and bias.shape[2] == 1
        ):
            key_bias = jnp.broadcast_to(bias[:, 0, 0, :], (B, M))
            bias_ok = True
        if deterministic and bias_ok and S == M and self.use_pallas_decode:
            from ralf_tpu.ops.pallas.decode_attention import pallas_decode_available
            from ralf_tpu.ops.pallas.encoder_attention import fused_encoder_attention

            if pallas_decode_available():
                scale = self.head_dim**-0.5
                out = fused_encoder_attention(
                    (self.q_proj(q_in) * scale).astype(self.dtype),
                    k.reshape(B, M, self.d_model).astype(self.dtype),
                    v.reshape(B, M, self.d_model).astype(self.dtype),
                    self.nhead,
                    key_bias,
                )  # [B, S, E]
                return self.out_proj(out)
        q = self._split(self.q_proj(q_in))
        scale = jnp.asarray(self.head_dim, self.dtype) ** -0.5
        logits = jnp.einsum("bshd,bmhd->bhsm", q * scale, k)
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = self.attn_drop(probs, deterministic=deterministic)
        out = jnp.einsum("bhsm,bmhd->bshd", probs, v)
        return self.out_proj(out.reshape(B, S, self.d_model))

    def __call__(
        self,
        q_in: jax.Array,
        kv_in: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if (
            q_in is kv_in
            and deterministic
            and self.use_pallas_decode
            and self.use_qkv_folded
            and not self.is_initializing()  # params exist only post-init
        ):
            out = self._self_attend_folded(q_in, bias)
            if out is not None:
                return out
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, bias, deterministic)

    def _self_attend_folded(
        self, x: jax.Array, bias: Optional[jax.Array]
    ) -> Optional[jax.Array]:
        """Self-attention with q/k/v projections folded into the Pallas
        kernel — x is read from HBM once; the three [B,S,E] projection
        tensors never round-trip HBM.  Returns None when the case is not
        eligible (non-key bias, CPU) so the caller falls through to XLA.

        Exact bias recovery (fused_encoder_self_attention docstring): bk
        cancels in softmax; bq becomes the per-key logit x (Wk (bq s)),
        one cheap XLA matvec; bv is added to the kernel output (row of
        attention weights sums to 1) where XLA fuses it into out_proj.
        """
        key_bias = None
        if bias is not None:
            if not (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1):
                return None  # structured bias -> XLA path
            key_bias = bias[:, 0, 0, :].astype(jnp.float32)
        from ralf_tpu.ops.pallas.decode_attention import pallas_decode_available
        from ralf_tpu.ops.pallas.encoder_attention import (
            fused_encoder_self_attention,
        )

        if not pallas_decode_available():
            return None
        B, S = x.shape[:2]
        scale = self.head_dim**-0.5
        pq = self.q_proj.variables["params"]
        pk = self.k_proj.variables["params"]
        pv = self.v_proj.variables["params"]
        wqkv = jnp.concatenate(
            [pq["kernel"] * scale, pk["kernel"], pv["kernel"]], axis=1
        )
        x = x.astype(self.dtype)
        # bq's per-key logit is PER-HEAD: t_j^h = (x_j Wk)^h . (bq s)^h,
        # i.e. t = x @ U with U[:, h] = Wk[:, h-slice] @ (bq s)[h-slice]
        E, H, Dh = self.d_model, self.nhead, self.head_dim
        u = jnp.einsum(
            "ehd,hd->eh",
            pk["kernel"].reshape(E, H, Dh).astype(jnp.float32),
            (pq["bias"] * scale).reshape(H, Dh).astype(jnp.float32),
        )
        t = jnp.einsum("bse,eh->bhs", x.astype(jnp.float32), u)
        key_bias = t if key_bias is None else key_bias[:, None, :] + t
        out = fused_encoder_self_attention(x, wqkv, self.nhead, key_bias)
        return self.out_proj(out + pv["bias"].astype(out.dtype))


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    dtype: Any = jnp.float32
    # Fused VMEM FFN kernel: measured NEUTRAL-to-slower end-to-end on this
    # toolchain (bb=4 cap; per-grid-step serialization eats the HBM traffic
    # saving — BENCH_NOTES negative results), so OFF by default.
    use_pallas: bool = False

    def setup(self) -> None:
        # names match the previous @nn.compact auto-naming — checkpoint- and
        # torch-port-compatible
        self.lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="Dense_0")
        self.lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="Dense_1")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # Fused VMEM kernel on TPU for the encoder-shaped inference case:
        # the hidden [B, S, F] tile never round-trips HBM.  relu-only (the
        # kernel's bias identity needs it), no dropout (deterministic), and
        # S large enough that the decode scan's S=1 calls stay on XLA.
        if (
            self.use_pallas
            and deterministic
            and self.activation == "relu"
            and x.ndim == 3
            and x.shape[1] >= 16
            and not self.is_initializing()  # params exist only post-init
        ):
            from ralf_tpu.ops.pallas.decode_attention import pallas_decode_available
            from ralf_tpu.ops.pallas.encoder_ffn import fused_ffn

            if pallas_decode_available():
                p1 = self.lin1.variables["params"]
                p2 = self.lin2.variables["params"]
                return fused_ffn(
                    x.astype(self.dtype),
                    p1["kernel"].astype(self.dtype),
                    p1["bias"],
                    p2["kernel"].astype(self.dtype),
                    p2["bias"],
                )
        h = self.lin1(x)
        h = nn.relu(h) if self.activation == "relu" else nn.gelu(h)
        h = self.drop(h, deterministic=deterministic)
        return self.lin2(h)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN (norm_first, the model zoo default) or post-LN (FIDNet) layer."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    norm_first: bool = True
    activation: str = "relu"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.self_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype
        )
        self.ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.norm_first:
            h = self.norm1(x)
            x = x + self.drop1(
                self.self_attn(h, h, bias, deterministic), deterministic=deterministic
            )
            x = x + self.drop2(
                self.ffn(self.norm2(x), deterministic), deterministic=deterministic
            )
        else:
            x = self.norm1(
                x
                + self.drop1(
                    self.self_attn(x, x, bias, deterministic),
                    deterministic=deterministic,
                )
            )
            x = self.norm2(
                x + self.drop2(self.ffn(x, deterministic), deterministic=deterministic)
            )
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers; keep-mask applied as key bias."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    dropout: float = 0.1
    norm_first: bool = True
    activation: str = "relu"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.layers = [
            TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.norm_first,
                self.activation,
                self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jax.Array,
        keep: Optional[jax.Array] = None,  # [B, S] True=valid
        deterministic: bool = True,
    ) -> jax.Array:
        bias = None
        if keep is not None:
            bias = keep_to_bias(keep)[:, None, None, :]  # [B,1,1,S]
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre/post-LN decoder layer with explicit single-step cache path."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    norm_first: bool = True
    activation: str = "relu"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.self_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype
        )
        self.ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)
        self.drop3 = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jax.Array,
        memory: jax.Array,
        self_bias: Optional[jax.Array] = None,
        mem_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        assert self.norm_first, "decoder stacks in this framework are pre-LN"
        h = self.norm1(x)
        x = x + self.drop1(
            self.self_attn(h, h, self_bias, deterministic), deterministic=deterministic
        )
        x = x + self.drop2(
            self.cross_attn(self.norm2(x), memory, mem_bias, deterministic),
            deterministic=deterministic,
        )
        x = x + self.drop3(
            self.ffn(self.norm3(x), deterministic), deterministic=deterministic
        )
        return x

    # ---- cached decode path ---------------------------------------------

    def cross_kv(self, memory: jax.Array, kv_quant: bool = False):
        """Project the encoder memory once; reuse at every decode step.
        Returned in the bandwidth-friendly [B, H, Dh, M] decode layout;
        with kv_quant, as int8 + per-head scales (halves the dominant
        per-step HBM traffic)."""
        k, v = self.cross_attn.project_kv_t(memory)
        if kv_quant:
            from ralf_tpu.ops.pallas.decode_attention import quantize_kv

            return quantize_kv(k, v)
        return k, v

    def step(
        self,
        x_t: jax.Array,  # [B, 1, D]
        t: jax.Array,  # scalar int32 position
        cache_k: jax.Array,  # [B, H, Dh, T]
        cache_v: jax.Array,
        self_bias_t: jax.Array,  # [B, 1, T] additive (pos<=t & not-pad)
        cross: tuple,  # (k, v) [B,H,Dh,M] or int8 (k, v, k_scale, v_scale)
        mem_bias: Optional[jax.Array],  # [B, 1, M] or None
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        h = self.norm1(x_t)
        k_t, v_t = self.self_attn.project_kv(h)  # [B,1,H,Dh]
        k_t = jnp.transpose(k_t, (0, 2, 3, 1))  # [B,H,Dh,1]
        v_t = jnp.transpose(v_t, (0, 2, 3, 1))
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, k_t.astype(cache_k.dtype), t, axis=3
        )
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, v_t.astype(cache_v.dtype), t, axis=3
        )
        x_t = x_t + self.self_attn.attend_t(h, cache_k, cache_v, self_bias_t)
        x_t = x_t + self.cross_attn.attend_t_any(self.norm2(x_t), cross, mem_bias)
        x_t = x_t + self.ffn(self.norm3(x_t))
        return x_t, cache_k, cache_v

    def step_q8(
        self,
        x_t: jax.Array,  # [B, 1, D]
        t: jax.Array,
        cache_k: jax.Array,  # [B, H, Dh, T] int8
        cache_v: jax.Array,
        cache_ks: jax.Array,  # [B, H, T] f32 per-token scales
        cache_vs: jax.Array,
        self_bias_t: jax.Array,
        cross: tuple,
        mem_bias: Optional[jax.Array],
    ):
        """`step` with int8 per-token self-attention caches (opt-in
        `self_quant`): the new token's K/V are absmax-quantized over Dh at
        write time; scales fold exactly in attend_t_q8tok."""
        h = self.norm1(x_t)
        k_t, v_t = self.self_attn.project_kv(h)  # [B,1,H,Dh]
        k_t = jnp.transpose(k_t, (0, 2, 3, 1))  # [B,H,Dh,1]
        v_t = jnp.transpose(v_t, (0, 2, 3, 1))

        def q8(x):  # [B,H,Dh,1] -> int8 same shape + [B,H,1] scale
            a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2, keepdims=True)
            s = jnp.maximum(a, 1e-8) / 127.0
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
            return xi.astype(jnp.int8), s[:, :, 0, :]

        ki, ks = q8(k_t)
        vi, vs = q8(v_t)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, ki, t, axis=3)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, vi, t, axis=3)
        cache_ks = jax.lax.dynamic_update_slice_in_dim(cache_ks, ks, t, axis=2)
        cache_vs = jax.lax.dynamic_update_slice_in_dim(cache_vs, vs, t, axis=2)
        x_t = x_t + self.self_attn.attend_t_q8tok(
            h, cache_k, cache_v, cache_ks, cache_vs, self_bias_t
        )
        x_t = x_t + self.cross_attn.attend_t_any(self.norm2(x_t), cross, mem_bias)
        x_t = x_t + self.ffn(self.norm3(x_t))
        return x_t, cache_k, cache_v, cache_ks, cache_vs


class TransformerDecoder(nn.Module):
    """Decoder stack exposing both a full (training) and a cached (decode)
    forward.  The cached path is intended to be driven from a `lax.scan`
    (see `ralf_tpu/ops/decode_loop.py`)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.layers = [
            TransformerDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jax.Array,  # [B, S, D] embedded target
        memory: jax.Array,  # [B, M, D]
        tgt_keep: Optional[jax.Array] = None,  # [B, S]
        mem_keep: Optional[jax.Array] = None,  # [B, M]
        causal: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        B, S, _ = x.shape
        self_bias = jnp.zeros((1, 1, S, S), jnp.float32)
        if causal:
            self_bias = self_bias + causal_bias(S)[None, None]
        if tgt_keep is not None:
            self_bias = self_bias + keep_to_bias(tgt_keep)[:, None, None, :]
        mem_bias = None
        if mem_keep is not None:
            mem_bias = keep_to_bias(mem_keep)[:, None, None, :]
        for layer in self.layers:
            x = layer(x, memory, self_bias, mem_bias, deterministic)
        return x

    # ---- cached decode path ---------------------------------------------

    def init_cache(self, batch: int, max_len: int,
                   self_quant: bool = False) -> dict:
        """Zeroed per-layer KV cache pytree ([B, H, Dh, T] decode layout).
        With self_quant, caches are int8 + per-token f32 scales (halves the
        per-step self-attention HBM stream)."""
        hd = self.d_model // self.nhead
        shape = (batch, self.nhead, hd, max_len)
        dt = jnp.int8 if self_quant else self.dtype
        cache = {
            "k": [jnp.zeros(shape, dt) for _ in range(self.num_layers)],
            "v": [jnp.zeros(shape, dt) for _ in range(self.num_layers)],
        }
        if self_quant:
            sshape = (batch, self.nhead, max_len)
            cache["ks"] = [
                jnp.zeros(sshape, jnp.float32) for _ in range(self.num_layers)
            ]
            cache["vs"] = [
                jnp.zeros(sshape, jnp.float32) for _ in range(self.num_layers)
            ]
        return cache

    def cross_kv(self, memory: jax.Array, kv_quant: bool = False,
                 shared: bool = True):
        """Decode-time cross-attention operand.  Default 'shared': the raw
        memory itself (weight-folded attention, see
        MultiHeadAttention.attend_shared — one HBM stream for all layers).
        shared + kv_quant: ONE int8 copy of the memory shared by all
        layers (half the bytes again).  shared=False precomputes per-layer
        K/V caches (optionally int8)."""
        if shared and kv_quant:
            from ralf_tpu.ops.pallas.decode_attention import (
                quantize_shared_memory,
            )

            return quantize_shared_memory(memory)
        if shared:
            return memory.astype(self.dtype)
        return [layer.cross_kv(memory, kv_quant) for layer in self.layers]

    def step(
        self,
        x_t: jax.Array,  # [B, 1, D]
        t: jax.Array,  # scalar int32
        cache: dict,
        cross_kvs,  # shared memory array, or per-layer list of KV tuples
        self_keep: jax.Array,  # [B, T] True = attend (already excludes > t)
        mem_keep: Optional[jax.Array],
    ) -> tuple[jax.Array, dict]:
        self_bias = keep_to_bias(self_keep)[:, None, :]  # [B, 1, T]
        mem_bias = (
            keep_to_bias(mem_keep)[:, None, :] if mem_keep is not None else None
        )
        shared = isinstance(cross_kvs, jax.Array) or (
            isinstance(cross_kvs, tuple)
            and len(cross_kvs) == 2
            and cross_kvs[0].ndim == 3  # (mem_i8 [B,M,E], scale [B,M])
        )
        if "ks" in cache:  # int8 per-token self caches (self_quant)
            new = {"k": [], "v": [], "ks": [], "vs": []}
            for i, layer in enumerate(self.layers):
                x_t, ck, cv, cks, cvs = layer.step_q8(
                    x_t, t,
                    cache["k"][i], cache["v"][i],
                    cache["ks"][i], cache["vs"][i],
                    self_bias,
                    cross_kvs if shared else cross_kvs[i],
                    mem_bias,
                )
                new["k"].append(ck)
                new["v"].append(cv)
                new["ks"].append(cks)
                new["vs"].append(cvs)
            return x_t, new
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x_t, ck, cv = layer.step(
                x_t,
                t,
                cache["k"][i],
                cache["v"][i],
                self_bias,
                cross_kvs if shared else cross_kvs[i],
                mem_bias,
            )
            new_k.append(ck)
            new_v.append(cv)
        return x_t, {"k": new_k, "v": new_v}


class TokenDecoder(nn.Module):
    """Embedding + 1-d PE + decoder stack + (LN, tied-free Linear) head.

    Parity with the reference `BaseDecoder`
    (`models/common/common.py:13-135`): vocab embedding, 'layout' sine PE
    with sqrt(d) input scaling, pre-LN nn.TransformerDecoder, and an
    LN+bias-free-Linear logit head.
    """

    vocab_size: int
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self) -> None:
        from ralf_tpu.models.positional import PositionalEncoding1D

        self.emb = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)
        self.pos_emb = PositionalEncoding1D(self.d_model, dropout=self.dropout)
        self.stack = TransformerDecoder(
            self.d_model,
            self.nhead,
            self.num_layers,
            self.dim_feedforward,
            self.dropout,
            self.dtype,
        )
        self.head_norm = nn.LayerNorm(dtype=self.dtype)
        self.head_out = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype)

    def __call__(
        self,
        seq: jax.Array,  # [B, S] int tokens
        memory: jax.Array,  # [B, M, D]
        tgt_keep: Optional[jax.Array] = None,
        mem_keep: Optional[jax.Array] = None,
        causal: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        h = self.emb(seq)
        h = self.pos_emb(h, deterministic=deterministic)
        h = self.stack(h, memory, tgt_keep, mem_keep, causal, deterministic)
        return self.head_out(self.head_norm(h))

    # ---- cached decode path (driven by ops/decode_loop.py) ---------------

    def embed_step(self, tok: jax.Array, t: jax.Array) -> jax.Array:
        """tok [B] int32, t scalar -> [B, 1, D] PE'd embedding (no dropout)."""
        from ralf_tpu.models.positional import sincos_1d

        h = self.emb(tok)[:, None, :]  # [B,1,D]
        pe = jnp.asarray(sincos_1d(4096, self.d_model), h.dtype)
        h = h * jnp.sqrt(jnp.asarray(self.d_model, h.dtype))
        h = h + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None]
        return h

    def head(self, x: jax.Array) -> jax.Array:
        return self.head_out(self.head_norm(x))

    def init_cache(self, batch: int, max_len: int,
                   self_quant: bool = False) -> dict:
        return self.stack.init_cache(batch, max_len, self_quant)

    def cross_kv(self, memory: jax.Array, kv_quant: bool = False,
                 shared: bool = True):
        return self.stack.cross_kv(memory, kv_quant, shared)

    def step(self, x_t, t, cache, cross_kvs, self_keep, mem_keep):
        return self.stack.step(x_t, t, cache, cross_kvs, self_keep, mem_keep)
