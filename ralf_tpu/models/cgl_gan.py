"""CGL-GAN — non-autoregressive transformer GAN baseline (+ RA variant).

Parity target: `image2layout/train/models/cgl.py` and the shared GAN base
(`common_gan/base_model.py`):

  generator:  ImageEncoder (cgl FPN) memory + Conv1d layout encoder over a
              random/noisy packed init layout + 1d PE -> 6L pre-LN
              TransformerDecoder -> (LN/Linear/ReLU head, class + box fcs)
  loss:       Hungarian-matched CE/L1/gIoU (2/5/2) + hinge adversarial
              with a linear adv-weight ramp after a warmup epoch
  disc:       same encoder topology (resnet18, 4 layers) + straight-through
              ArgMax on the packed layout + tanh scalar head

One-shot parallel prediction — maps to a single jitted forward on TPU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.core.conditioning import normalize_task
from ralf_tpu.core.layout import Layout
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.gan_common import (
    hinge_embedding_loss,
    pack_layout,
    random_init_layout,
    reorder,
    set_criterion,
    straight_through_argmax,
    unpack_outputs,
)
from ralf_tpu.models.nn import TransformerDecoder
from ralf_tpu.models.positional import PositionalEncoding1D
from ralf_tpu.models.resnet import ImageEncoder
from ralf_tpu.models.retrieval_augment import RetrievalAugmentation


class Conv1dLayoutEncoder(nn.Module):
    """Conv1d(k=3, same) + ReLU + MaxPool1d(3, stride 1) over the packed
    layout flattened to channels (`cgl.py:53-62`)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, packed: jax.Array) -> jax.Array:
        B, S = packed.shape[:2]
        x = packed.reshape(B, S, -1)  # [B, S, 2K] (length-major, channels last)
        x = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,), strides=(1,), padding="SAME")
        return x  # [B, S, C]


class CGLGeneratorCore(nn.Module):
    num_classes_total: int  # num labels + no-object
    cfg: GeneratorConfig = GeneratorConfig()
    with_retrieval: bool = False
    num_labels: int = 3
    max_seq_length: int = 10
    top_k: int = 16

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageEncoder(
            backbone=c.backbone, d_model=c.d_model, nhead=c.nhead,
            num_layers=c.num_encoder_layers, dim_feedforward=2048,
            dropout=c.dropout, fpn_style="cgl", dtype=dtype,
        )
        self.layout_encoder = Conv1dLayoutEncoder(c.d_model, dtype)
        self.pos_emb_1d = PositionalEncoding1D(c.d_model, dropout=c.dropout)
        self.decoder = TransformerDecoder(
            c.d_model, 8, c.num_decoder_layers, 2048, c.dropout, dtype
        )
        # NOTE: the reference constructs a `head` Sequential(LN/Linear/ReLU)
        # but never applies it — `decode` feeds fc1/fc2 the raw decoder
        # output (`cgl.py:79-83` vs `:108-119`).  Matching the actual
        # compute, fc_cls/fc_box read the decoder output directly (torch
        # A/B: tests/test_gan_torch_parity.py).
        self.fc_cls = nn.Dense(self.num_classes_total, use_bias=False, dtype=dtype)
        self.fc_box = nn.Dense(4, use_bias=False, dtype=dtype)
        if self.with_retrieval:
            self.retrieval_aug = RetrievalAugmentation(
                self.num_labels, self.max_seq_length, c.d_model, self.top_k,
                c.dropout, dtype,
            )

    def __call__(self, image: jax.Array, packed_layout: jax.Array,
                 retrieved: Optional[dict] = None, train: bool = False):
        memory = self.encoder(image, train=train)
        if self.with_retrieval:
            memory = self.retrieval_aug(memory, retrieved, train=train)
        h = self.layout_encoder(packed_layout)
        h = self.pos_emb_1d(h, deterministic=not train)
        h = self.decoder(h, memory, causal=False, deterministic=not train)
        return self.fc_cls(h), nn.sigmoid(self.fc_box(h))


class CGLDiscriminatorCore(nn.Module):
    """`cgl.py:185-271`: resnet18 encoder (4 layers) + conv1d layout
    encoder + decoder + flattened tanh head; ST-argmax on the input."""

    cfg: GeneratorConfig = GeneratorConfig()
    max_seq_length: int = 10
    use_reorder: bool = False

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageEncoder(
            backbone="resnet18", d_model=c.d_model, nhead=c.nhead,
            num_layers=4, dim_feedforward=2048, dropout=c.dropout,
            fpn_style="cgl", dtype=dtype,
        )
        self.layout_encoder = Conv1dLayoutEncoder(c.d_model, dtype)
        self.pos_emb_1d = PositionalEncoding1D(c.d_model, dropout=c.dropout)
        self.decoder = TransformerDecoder(c.d_model, 8, 4, 2048, c.dropout, dtype)
        self.head_norm = nn.LayerNorm(dtype=dtype)
        self.head = nn.Dense(1, use_bias=False, dtype=dtype)

    def __call__(self, image: jax.Array, packed_layout: jax.Array,
                 train: bool = False) -> jax.Array:
        packed_layout = straight_through_argmax(packed_layout)
        memory = self.encoder(image, train=train)
        h = self.layout_encoder(packed_layout)
        h = self.pos_emb_1d(h, deterministic=not train)
        h = self.decoder(h, memory, causal=False, deterministic=not train)
        B = h.shape[0]
        h = self.head_norm(h.reshape(B, -1))
        return jnp.tanh(self.head(h))[:, 0]


class CGLGANGenerator:
    """Generator-protocol wrapper with the GAN-specific extras:
    `disc_loss`, `adv_weight` ramp, random-init conditioning."""

    LR_MULT_DIS = 10.0  # `cgl.py:186`

    def __init__(self, num_labels: int, cfg: GeneratorConfig = GeneratorConfig(),
                 auxiliary_task: Optional[str] = "uncond",
                 max_seq_length: int = 10, image_hw: tuple[int, int] = (350, 240),
                 with_retrieval: bool = False, top_k: int = 16,
                 use_reorder: bool = False, use_seq_dist: bool = False) -> None:
        self.num_labels = num_labels
        self.K = num_labels + 1  # + no-object
        self.cfg = cfg
        self.task = normalize_task(auxiliary_task)
        self.S = max_seq_length
        self.image_hw = image_hw
        self.with_retrieval = with_retrieval
        self.use_reorder = use_reorder
        self.adv_weight = 1.0
        # element-count EMA (core/seq_length.py) — always tracked; opt-in
        # use for uncond init (the reference initializer draws the
        # no-object class from the flat coef prior instead, `cgl.py:34`)
        from ralf_tpu.core.seq_length import SeqLengthDistribution

        self.use_seq_dist = use_seq_dist
        self.seq_dist = SeqLengthDistribution(max_seq_length)
        self.coef = tuple([1.0] * self.K)  # `cgl.py:34`
        self.core = CGLGeneratorCore(
            num_classes_total=self.K, cfg=cfg, with_retrieval=with_retrieval,
            num_labels=num_labels, max_seq_length=max_seq_length, top_k=top_k,
        )
        self.disc = CGLDiscriminatorCore(cfg=cfg, max_seq_length=max_seq_length)
        self.tokenizer = None  # GANs are continuous; no tokenizer

    # ---- init ---------------------------------------------------------------

    def _dummy_inputs(self, B: int):
        H, W = self.image_hw
        inp = [
            jnp.zeros((B, H, W, 4), jnp.float32),
            jnp.zeros((B, self.S, 2, self.K), jnp.float32),
        ]
        if self.with_retrieval:
            z = jnp.zeros((B, 16, self.S), jnp.float32)
            inp.append({
                "label": jnp.zeros((B, 16, self.S), jnp.int32),
                "center_x": z, "center_y": z, "width": z, "height": z,
                "mask": jnp.zeros((B, 16, self.S), bool),
            })
        return inp

    def init(self, key: jax.Array, batch_size: int = 1):
        return jax.jit(self.core.init)(key, *self._dummy_inputs(batch_size))

    def init_disc(self, key: jax.Array, batch_size: int = 1):
        H, W = self.image_hw
        return jax.jit(self.disc.init)(
            key,
            jnp.zeros((batch_size, H, W, 4), jnp.float32),
            jnp.zeros((batch_size, self.S, 2, self.K), jnp.float32),
        )

    # ---- epoch hook (`cgl.py:121-132`) ---------------------------------------

    def update_per_epoch(self, epoch: int, warmup: int, max_epoch: int) -> None:
        if epoch < warmup:
            self.adv_weight = 0.0
        elif epoch <= max_epoch:
            self.adv_weight = (epoch - warmup) / max(max_epoch - warmup, 1)
        else:
            self.adv_weight = 1.0

    # ---- host preprocessing ----------------------------------------------------

    def preprocess(self, batch: dict, rng: np.random.Generator):
        layout: Layout = batch["layout"]
        target_packed = np.asarray(pack_layout(layout, self.K))
        if self.use_reorder:
            target_packed = self._reorder_packed(target_packed)
        self.seq_dist.update(np.asarray(layout.mask))
        n_elements = (
            self.seq_dist.sample(rng, target_packed.shape[0])
            if self.use_seq_dist and self.task == "uncond" else None
        )
        init = random_init_layout(rng, target_packed.shape[0], self.S, self.K,
                                  self.coef, n_elements=n_elements)
        init = self._condition_init(init, target_packed, rng)
        inputs = {"image": np.asarray(batch["image"]), "layout": init}
        if self.with_retrieval:
            assert "retrieved" in batch
            r = batch["retrieved"]
            inputs["retrieved"] = {k: np.asarray(r[k]) for k in
                                   ("label", "center_x", "center_y", "width",
                                    "height", "mask")}
        targets = {
            "packed": target_packed,
            "labels": target_packed[:, :, 0].argmax(-1).astype(np.int64),
            "boxes": target_packed[:, :, 1].astype(np.float32),
        }
        return inputs, targets

    def _reorder_packed(self, packed: np.ndarray) -> np.ndarray:
        out = packed.copy()
        # PosterLayout canonical class mapping (`layout_initializer.py:9-31`)
        if self.K == 4:  # PKU: text,logo,underlay + bg
            mapping = np.asarray([1, 2, 3, 0])
        else:  # CGL: embellishment,logo,text,underlay + bg
            mapping = np.asarray([3, 2, 1, 3, 0])[: self.K]
        for b in range(out.shape[0]):
            cls = mapping[out[b, :, 0].argmax(-1)]
            order = reorder(cls, out[b, :, 1, :4], self.S)
            order = order + [i for i in range(self.S) if i not in order]
            out[b] = out[b, order[: self.S]]
        return out

    def _condition_init(self, init: np.ndarray, target: np.ndarray,
                        rng: np.random.Generator) -> np.ndarray:
        """Copy task-conditioned parts of the GT into the random init
        (`common_gan/base_model.py:108-147`), then shuffle elements."""
        # NOTE: the reference copies box indices [0:2] for cwh/partial with
        # a comment claiming they are width/height, but its box rows are
        # cxcywh — i.e. it actually copies the centers
        # (`common_gan/base_model.py:117-129`).  We copy [2:4] (the true
        # width/height), matching the task semantics rather than the bug.
        task = self.task
        label_gt, box_gt = target[:, :, 0], target[:, :, 1]
        if task == "c":
            init[:, :, 0] = label_gt
        elif task == "cwh":
            init[:, :, 0] = label_gt
            init[:, :, 1, 2:4] = box_gt[:, :, 2:4]  # width/height of cxcywh
        elif task == "partial":
            init[:, 0, 0] = label_gt[:, 0]
            init[:, 0, 1, 2:4] = box_gt[:, 0, 2:4]
        elif task == "refinement":
            noise = rng.normal(0, 0.01, box_gt.shape).astype(np.float32)
            pad = box_gt.sum(-1) == 0.0
            noisy = np.clip(box_gt + noise, 0.0, 1.0)
            noisy[pad] = 0.0
            init = np.stack([label_gt, noisy], axis=2)
        if task != "uncond":
            for b in range(init.shape[0]):
                init[b] = init[b, rng.permutation(self.S)]
        return init.astype(np.float32)

    # ---- losses -------------------------------------------------------------

    def _forward(self, variables, inputs, train, rngs=None, mutable=()):
        args = [inputs["image"], inputs["layout"]]
        if self.with_retrieval:
            args.append(inputs["retrieved"])
        if mutable:
            return self.core.apply(variables, *args, train=train, rngs=rngs,
                                   mutable=list(mutable))
        out = self.core.apply(variables, *args, train=train, rngs=rngs)
        return out, {}

    def loss(self, variables, inputs, targets, *, train: bool = True,
             rngs: Optional[dict] = None, disc_variables=None):
        (logits, boxes), new_state = self._forward(
            variables, inputs, train, rngs, ("batch_stats",) if train else ()
        )
        empty_w = jnp.asarray(self.coef, jnp.float32)
        losses = set_criterion(
            logits, boxes, jnp.asarray(targets["labels"]),
            jnp.asarray(targets["boxes"]), empty_w, self.K,
        )
        weights = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}
        total = sum(losses[k] * weights[k] for k in weights)

        aux = dict(losses)
        if disc_variables is not None:
            packed_pred = jnp.concatenate(
                [logits[:, :, None, :],
                 jnp.pad(boxes, ((0, 0), (0, 0), (0, self.K - 4)))[:, :, None, :]],
                axis=2,
            )
            fake_logit = self.disc.apply(
                disc_variables, inputs["image"], packed_pred, train=False
            )
            adv = hinge_embedding_loss(fake_logit, jnp.ones_like(fake_logit))
            total = total + adv * self.adv_weight
            aux["adv_fake"] = adv
            aux["packed_pred"] = packed_pred
        aux["state"] = new_state
        aux["nll_loss"] = total
        return total, aux

    def disc_loss(self, disc_variables, variables, inputs, targets, *,
                  rngs: Optional[dict] = None):
        """Discriminator step: hinge on (fake=-1, real=+1)."""
        (logits, boxes), _ = self._forward(variables, inputs, False)
        packed_pred = jnp.concatenate(
            [logits[:, :, None, :],
             jnp.pad(boxes, ((0, 0), (0, 0), (0, self.K - 4)))[:, :, None, :]],
            axis=2,
        )
        packed_pred = jax.lax.stop_gradient(packed_pred)
        fake_logit, new_state = self.disc.apply(
            disc_variables, inputs["image"], packed_pred, train=True,
            rngs=rngs, mutable=["batch_stats"],
        )
        real_logit, new_state2 = self.disc.apply(
            disc_variables, inputs["image"], jnp.asarray(targets["packed"]),
            train=True, rngs=rngs, mutable=["batch_stats"],
        )
        loss_fake = hinge_embedding_loss(fake_logit, -jnp.ones_like(fake_logit))
        loss_real = hinge_embedding_loss(real_logit, jnp.ones_like(real_logit))
        total = (loss_fake + loss_real) * self.adv_weight
        return total, {"adv_fake": loss_fake, "adv_real": loss_real,
                       "state": new_state2}

    # ---- sampling -------------------------------------------------------------

    def sample(self, variables, cond_batch: dict, rng: np.random.Generator,
               key: Optional[jax.Array] = None) -> Layout:
        inputs, _ = self.preprocess(cond_batch, rng)
        (logits, boxes), _ = self._forward(
            variables, jax.tree.map(jnp.asarray, inputs), False
        )
        return unpack_outputs(logits, boxes, self.K)
