"""Reusable retrieval-augmentation bolt-on.

Parity target: `image2layout/train/models/common/retrieval_augment.py:68-101`
— the module that upgrades CGL-GAN / DS-GAN / LayoutDM to their `_ra`
variants: frozen FIDNet embeds each retrieved layout to one vector,
adapter FFN + 1-d PE, cross-attention with the image memory, then a
position-wise FFN over concat[memory, memory_ca, ref].

Same fusion as RALF's final architecture (models/ralf.py) — factored out
so any generator can bolt it on.  The k retrieved layouts are folded into
the batch axis: one FIDNet call instead of a python loop over k.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ralf_tpu.core.layout import Layout
from ralf_tpu.models.fidnet import FIDNetV3
from ralf_tpu.models.positional import PositionalEncoding1D
from ralf_tpu.models.ralf import ViTCrossAttention, ViTFeedForward


class RetrievalAugmentation(nn.Module):
    num_labels: int
    max_seq_length: int
    d_model: int = 256
    top_k: int = 16
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.layout_encoder = FIDNetV3(
            num_labels=self.num_labels,
            d_model=256,
            nhead=4,
            num_layers=4,
            max_bbox=self.max_seq_length,
            dtype=self.dtype,
        )
        self.layout_adapter = ViTFeedForward(
            4 * self.d_model, self.d_model, dropout=0.0, dtype=self.dtype
        )
        self.pos_emb_1d = PositionalEncoding1D(self.d_model, dropout=self.dropout)
        self.attn = ViTCrossAttention(heads=8, dim_head=64, dtype=self.dtype)
        self.fusion_head = ViTFeedForward(
            4 * self.d_model, self.d_model, dropout=0.0, dtype=self.dtype
        )

    def __call__(self, img_feature: jax.Array, retrieved: dict,
                 train: bool = False) -> jax.Array:
        """img_feature [B, M, D] + retrieved {k: [B, K, S]} -> [B, 2M+K, D]."""
        lab = retrieved["label"]
        B, K, S = lab.shape
        flat = Layout(
            label=lab.reshape(B * K, S).astype(jnp.int32),
            center_x=retrieved["center_x"].reshape(B * K, S),
            center_y=retrieved["center_y"].reshape(B * K, S),
            width=retrieved["width"].reshape(B * K, S),
            height=retrieved["height"].reshape(B * K, S),
            mask=retrieved["mask"].reshape(B * K, S),
        )
        feats = jax.lax.stop_gradient(self.layout_encoder.extract_features(flat))
        ref = self.layout_adapter(feats.reshape(B, K, -1), deterministic=not train)
        ref = self.pos_emb_1d(ref, deterministic=not train)
        memory_ca = self.attn(img_feature, ref, deterministic=not train)
        return self.fusion_head(
            jnp.concatenate([img_feature, memory_ca, ref], axis=1),
            deterministic=not train,
        )
