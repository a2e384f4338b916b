"""FIDNetV3 — the layout feature extractor behind layout-FID and RALF's
retrieval fusion.

Parity target: `image2layout/train/fid/model.py:15-128`.  A permutation-
invariant (no positional encoding) post-LN transformer over layout
elements with a learned CLS token; `extract_features` returns the CLS
embedding (the 256-d feature all FID numbers are computed on, and the
vector RALF uses to embed each retrieved layout —
`models/retrieval_augmented_autoreg.py:560-567`).  The full forward adds
the auxiliary real/fake, label and bbox reconstruction heads used by the
per-dataset FIDNet trainer (`train/fid/train.py`).

TPU redesign: batched CLS handling ([B, 1+S, D] instead of seq-first),
vmap-able over a retrieval axis, bf16-able.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ralf_tpu.core.layout import Layout
from ralf_tpu.models.nn import TransformerEncoder

# bbox attribute order fed to fc_bbox (`train/fid/data.py:4`)
BBOX_KEYS = ("center_x", "center_y", "width", "height")


class FIDNetV3(nn.Module):
    num_labels: int
    d_model: int = 256
    nhead: int = 4
    num_layers: int = 4
    max_bbox: int = 10
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.emb_label = nn.Embed(self.num_labels, self.d_model, dtype=self.dtype)
        self.fc_bbox = nn.Dense(self.d_model, dtype=self.dtype)
        self.enc_fc_in = nn.Dense(self.d_model, dtype=self.dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.d_model)
        )
        self.enc_transformer = TransformerEncoder(
            self.d_model,
            self.nhead,
            self.num_layers,
            dim_feedforward=self.d_model // 2,
            norm_first=False,  # torch default layers in the reference
            dtype=self.dtype,
        )
        # decoder / auxiliary heads (FID training only)
        self.fc_out_disc = nn.Dense(1, dtype=self.dtype)
        self.pos_token = self.param(
            "pos_token", nn.initializers.uniform(1.0), (self.max_bbox, 1, self.d_model)
        )
        self.dec_fc_in = nn.Dense(self.d_model, dtype=self.dtype)
        self.dec_transformer = TransformerEncoder(
            self.d_model,
            self.nhead,
            self.num_layers,
            dim_feedforward=self.d_model // 2,
            norm_first=False,
            dtype=self.dtype,
        )
        self.fc_out_cls = nn.Dense(self.num_labels, dtype=self.dtype)
        self.fc_out_bbox = nn.Dense(4, dtype=self.dtype)

    def extract_features(self, layout: Layout, train: bool = False) -> jax.Array:
        """Layout [B, S] -> CLS feature [B, d_model]."""
        bbox = jnp.stack([layout.geo(k) for k in BBOX_KEYS], axis=-1)
        h = jnp.concatenate(
            [self.fc_bbox(bbox.astype(self.dtype)), self.emb_label(layout.label)],
            axis=-1,
        )
        h = nn.relu(self.enc_fc_in(h))  # [B, S, D]
        B = h.shape[0]
        cls = jnp.tile(self.cls_token.reshape(1, 1, -1), (B, 1, 1)).astype(h.dtype)
        x = jnp.concatenate([cls, h], axis=1)  # [B, 1+S, D]
        keep = jnp.concatenate(
            [jnp.ones((B, 1), bool), layout.mask], axis=1
        )
        x = self.enc_transformer(x, keep=keep, deterministic=not train)
        return x[:, 0]

    def __call__(self, layout: Layout, train: bool = False):
        """Full forward: (disc_logit [B], cls_logits [B,S,L], bbox [B,S,4])."""
        B, S = layout.label.shape
        feat = self.extract_features(layout, train)
        logit_disc = self.fc_out_disc(feat)[:, 0]

        x = jnp.tile(feat[:, None, :], (1, S, 1))  # [B, S, D]
        t = jnp.tile(self.pos_token[:S, 0][None], (B, 1, 1)).astype(x.dtype)
        x = nn.relu(self.dec_fc_in(jnp.concatenate([x, t], axis=-1)))
        x = self.dec_transformer(x, keep=layout.mask, deterministic=not train)
        logit_cls = self.fc_out_cls(x)
        bbox_pred = nn.sigmoid(self.fc_out_bbox(x))
        return logit_disc, logit_cls, bbox_pred
