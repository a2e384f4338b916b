"""DS-GAN — CNN-LSTM GAN baseline from PosterLayout (+ RA variant).

Parity target: `image2layout/train/models/dsgan.py`:
  generator: ResNet50-FPN 'lstm' head maps the flattened stride-16 map to
             per-(layer,direction) initial LSTM states (`common/image.py:
             86-117`; the image feature enters as the initial CELL state,
             h0 zeros — `dsgan.py:60-62`), Conv1d over the packed layout,
             4-layer bidirectional LSTM, softmax class + sigmoid box heads.
  disc:      resnet18 + 2-layer CNN-LSTM + tanh scalar on the last step.
  ordering:  use_reorder=True — elements sorted by the IoU-grouping
             design sequence before packing.

LSTMs are inherently sequential; they run as `nn.RNN` scans over S=10
steps — short enough that TPU cost is negligible next to the ResNet.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.cgl_gan import CGLGANGenerator
from ralf_tpu.models.gan_common import DS_COEF, straight_through_argmax
from ralf_tpu.models.resnet import ResNetFPNEncoder


class BiLSTM(nn.Module):
    """Multi-layer bidirectional LSTM, torch layout: init carries indexed
    [layer*2+direction]."""

    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jax.Array, c0: jax.Array) -> jax.Array:
        """x [B, S, C]; c0 [B, 2*num_layers, hidden] initial cell states."""
        for layer in range(self.num_layers):
            outs = []
            for d in range(2):
                cell = nn.OptimizedLSTMCell(self.hidden, name=f"l{layer}_d{d}")
                carry = (c0[:, 2 * layer + d], jnp.zeros_like(c0[:, 0]))
                # flax LSTMCell carry = (c, h); h0 zeros, c0 from the image
                seq = x[:, ::-1] if d == 1 else x
                rnn = nn.RNN(cell, name=f"rnn{layer}_d{d}")
                out = rnn(seq, initial_carry=carry)
                outs.append(out[:, ::-1] if d == 1 else out)
            x = jnp.concatenate(outs, axis=-1)  # [B, S, 2*hidden]
        return x


class CNNLSTM(nn.Module):
    """Conv1d + ReLU + MaxPool + BiLSTM (`dsgan.py:19-67`)."""

    conv_channels: int = 32
    d_model: int = 256
    num_lstm_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, packed: jax.Array, c0: jax.Array) -> jax.Array:
        B, S = packed.shape[:2]
        x = packed.reshape(B, S, -1)
        x = nn.Conv(self.conv_channels, (3,), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,), strides=(1,), padding="SAME")
        return BiLSTM(self.d_model, self.num_lstm_layers)(x, c0)


class ImageToLSTMState(nn.Module):
    """ResNet-FPN map -> initial per-(layer,direction) states
    (`common/image.py:86-117`: Linear over the flattened 330 positions)."""

    backbone: str = "resnet50"
    d_model: int = 256
    num_lstm_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> jax.Array:
        fmap = ResNetFPNEncoder(
            self.backbone, self.d_model, fpn_style="ralf", dtype=self.dtype
        )(image, train)  # [B, h, w, D]
        B, H, W, D = fmap.shape
        flat = fmap.reshape(B, H * W, D).swapaxes(1, 2)  # [B, D, hw]
        h0 = nn.Dense(self.num_lstm_layers * 2, dtype=self.dtype)(flat)  # [B, D, 2L]
        return jnp.swapaxes(h0, 1, 2)  # [B, 2L, D]


class DSGeneratorCore(nn.Module):
    num_classes_total: int
    cfg: GeneratorConfig = GeneratorConfig()
    with_retrieval: bool = False
    num_labels: int = 3
    max_seq_length: int = 10
    top_k: int = 16
    conv_channels: int = 32
    num_lstm_layers: int = 4

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageToLSTMState(
            c.backbone, c.d_model, self.num_lstm_layers, dtype
        )
        self.cnnlstm = CNNLSTM(self.conv_channels, c.d_model,
                               self.num_lstm_layers, dtype)
        self.fc_cls = nn.Dense(self.num_classes_total, dtype=dtype)
        self.fc_box = nn.Dense(4, dtype=dtype)
        if self.with_retrieval:
            from ralf_tpu.models.retrieval_augment import RetrievalAugmentation

            self.retrieval_aug = RetrievalAugmentation(
                self.num_labels, self.max_seq_length, c.d_model, self.top_k,
                c.dropout, dtype,
            )

    def __call__(self, image: jax.Array, packed_layout: jax.Array,
                 retrieved: Optional[dict] = None, train: bool = False):
        c0 = self.encoder(image, train=train)  # [B, 2L, D]
        if self.with_retrieval:
            c0 = self.retrieval_aug(c0, retrieved, train=train)[:, : c0.shape[1]]
        out = self.cnnlstm(packed_layout, c0)  # [B, S, 2D]
        logits = jax.nn.softmax(self.fc_cls(out), axis=-1)
        boxes = nn.sigmoid(self.fc_box(out))
        return logits, boxes


class DSDiscriminatorCore(nn.Module):
    cfg: GeneratorConfig = GeneratorConfig()

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageToLSTMState("resnet18", c.d_model, 2, dtype)
        self.cnnlstm = CNNLSTM(32, c.d_model, 2, dtype)
        self.fc_tf = nn.Dense(1, dtype=dtype)

    def __call__(self, image: jax.Array, packed_layout: jax.Array,
                 train: bool = False) -> jax.Array:
        packed_layout = straight_through_argmax(packed_layout)
        c0 = self.encoder(image, train=train)
        out = self.cnnlstm(packed_layout, c0)[:, -1]
        return jnp.tanh(self.fc_tf(out))[:, 0]


class DSGANGenerator(CGLGANGenerator):
    """DS-GAN reuses the CGL GAN wrapper (same preprocess/criterion); only
    the cores, class coefs, reorder default and adv ramp differ."""

    def __init__(self, num_labels: int, cfg: GeneratorConfig = GeneratorConfig(),
                 auxiliary_task: Optional[str] = "uncond",
                 max_seq_length: int = 10, image_hw: tuple[int, int] = (350, 240),
                 with_retrieval: bool = False, top_k: int = 16,
                 use_reorder: bool = True) -> None:
        super().__init__(num_labels, cfg, auxiliary_task, max_seq_length,
                         image_hw, with_retrieval, top_k, use_reorder)
        self.coef = DS_COEF[self.K]
        self.apply_weight = False  # `dsgan.py:92-95`
        self.core = DSGeneratorCore(
            num_classes_total=self.K, cfg=cfg, with_retrieval=with_retrieval,
            num_labels=num_labels, max_seq_length=max_seq_length, top_k=top_k,
        )
        self.disc = DSDiscriminatorCore(cfg=cfg)

    def update_per_epoch(self, epoch: int, warmup: int, max_epoch: int) -> None:
        # `dsgan.py:137-144`
        if epoch > warmup:
            self.adv_weight = 1.0
        else:
            self.adv_weight = (epoch - 1) / max(warmup, 1)

    def loss(self, variables, inputs, targets, *, train: bool = True,
             rngs: Optional[dict] = None, disc_variables=None):
        total, aux = super().loss(
            variables, inputs, targets, train=train, rngs=rngs,
            disc_variables=disc_variables,
        )
        if self.apply_weight is False:
            # DS-GAN sums the unweighted criterion terms
            unweighted = aux["loss_ce"] + aux["loss_bbox"] + aux["loss_giou"]
            adv = aux.get("adv_fake", 0.0) * self.adv_weight
            total = unweighted + adv
            aux["nll_loss"] = total
        return total, aux
