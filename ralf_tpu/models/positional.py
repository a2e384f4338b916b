"""Positional encodings (1-d sequence, factorized element/attribute, 2-d image).

Parity targets: `image2layout/train/models/common/positional_encoding.py`
(1-d sine `:59-107`, elem_attr `:110-159`, 2-d sine `:162-212`, learned 2-d
`:215-253`).  All are pure functions of static shapes, precomputable at
trace time — XLA folds them into constants.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def sincos_1d(max_len: int, d_model: int) -> np.ndarray:
    """Classic interleaved sin/cos table, [max_len, d_model] (fp32)."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class PositionalEncoding1D(nn.Module):
    """Sine PE added to a (scaled) embedding sequence; 'layout' PE in the
    reference (`positional_encoding.py:59-107`)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000
    scale_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, offset: int = 0):
        pe = jnp.asarray(sincos_1d(self.max_len, self.d_model), x.dtype)
        h = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) if self.scale_input else x
        S = x.shape[-2]
        h = h + pe[offset : offset + S]
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ElemAttrPositionalEncoding1D(nn.Module):
    """Factorized learned PE: attribute-index + element-index halves
    (`positional_encoding.py:110-159`); used by the diffusion decoders."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000
    n_attr_per_elem: int = 5
    scale_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        B, S, _ = x.shape
        assert S % self.n_attr_per_elem == 0
        h = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) if self.scale_input else x
        idx = jnp.arange(S)
        attr_emb = nn.Embed(self.n_attr_per_elem, self.d_model // 2)(
            idx % self.n_attr_per_elem
        )
        elem_emb = nn.Embed(self.max_len // self.n_attr_per_elem, self.d_model // 2)(
            idx // self.n_attr_per_elem
        )
        pe = jnp.concatenate([attr_emb, elem_emb], axis=-1)[None].astype(h.dtype)
        return nn.Dropout(self.dropout)(h + pe, deterministic=deterministic)


def sine_2d_table(h: int, w: int, d_model: int, temperature: float = 10000.0) -> np.ndarray:
    """Normalized 2-d sine table, [h*w, d_model]; DETR-style with
    y/x normalized to [0, 1]*2pi (`positional_encoding.py:182-212`)."""
    half = d_model // 2
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys = ys / max(h - 1, 1) * 2 * np.pi
    xs = xs / max(w - 1, 1) * 2 * np.pi
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    px = xs.reshape(-1)[:, None] / dim_t  # [hw, half]
    py = ys.reshape(-1)[:, None] / dim_t

    def interleave(p):
        out = np.empty_like(p)
        out[:, 0::2] = np.sin(p[:, 0::2])
        out[:, 1::2] = np.cos(p[:, 1::2])
        return out

    pos = np.concatenate([interleave(py), interleave(px)], axis=1)
    return pos.astype(np.float32)


class PositionEmbeddingSine2D(nn.Module):
    """[B, H, W, C] feature map -> [B, H*W, C] sequence + 2-d sine PE."""

    d_model: int

    @nn.compact
    def __call__(self, x: jax.Array):
        B, H, W, C = x.shape
        assert C == self.d_model
        pos = jnp.asarray(sine_2d_table(H, W, self.d_model), x.dtype)
        return x.reshape(B, H * W, C) + pos[None]


class PositionEmbeddingLearned2D(nn.Module):
    """Learned row/col embedding halves (`positional_encoding.py:215-253`)."""

    d_model: int
    max_hw: int = 50

    @nn.compact
    def __call__(self, x: jax.Array):
        B, H, W, C = x.shape
        col = nn.Embed(self.max_hw, self.d_model // 2)(jnp.arange(W))
        row = nn.Embed(self.max_hw, self.d_model // 2)(jnp.arange(H))
        pos = jnp.concatenate(
            [
                jnp.tile(col[None, :, :], (H, 1, 1)),
                jnp.tile(row[:, None, :], (1, W, 1)),
            ],
            axis=-1,
        ).astype(x.dtype)
        return (x + pos[None]).reshape(B, H * W, C)
