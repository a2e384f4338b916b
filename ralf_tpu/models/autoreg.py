"""Autoregressive layout generator (the 'Autoreg Baseline' family).

Parity target: `image2layout/train/models/autoreg.py` — specifically the
`ConcateAuxilaryTaskAutoreg` architecture exported as the `autoreg` config
(`train/models/generator.py:1-9`):

    memory = concat[ ImageEncoder(image+saliency) + flag_img,
                     UserConstraintEncoder(constraint seq) + flag_user ]
    logits = TokenDecoder(layout tokens | memory, causal)

TPU redesign highlights:
  * sampling runs through `ops/decode_loop.ar_decode` — one jitted
    KV-cached scan with on-device constraint forcing (vs 50 sequential
    full-prefix forwards + host restriction loops in the reference);
  * the constraint sequence is serialized host-side to a static length,
    so train and sample are each a single compiled program per task;
  * loss is CE with label smoothing 0.1 ignoring pad, identical to
    `autoreg.py:81-83,108-115`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.core.conditioning import (
    Condition,
    ConstraintVocabulary,
    build_constraint_sequence,
    build_forced_tokens,
    get_condition,
    normalize_task,
)
from ralf_tpu.core.layout import Layout
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.nn import TokenDecoder, TransformerEncoder
from ralf_tpu.models.positional import PositionalEncoding1D
from ralf_tpu.models.resnet import ImageEncoder
from ralf_tpu.ops.decode_loop import ar_decode


class ConstraintEncoder(nn.Module):
    """Embedding + 1-d PE + pre-LN encoder over the serialized constraint
    (`models/common/common.py:200-253` UserConstraintTransformerEncoder)."""

    vocab_size: int
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq: jax.Array, keep: jax.Array, train: bool = False):
        h = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(seq)
        h = PositionalEncoding1D(self.d_model, dropout=self.dropout)(
            h, deterministic=not train
        )
        return TransformerEncoder(
            self.d_model,
            self.nhead,
            self.num_layers,
            self.dim_feedforward,
            self.dropout,
            dtype=self.dtype,
        )(h, keep=keep, deterministic=not train)


class AutoregCore(nn.Module):
    """Image encoder + constraint encoder + flag scalars + token decoder."""

    vocab_size: int  # layout-token vocabulary (decoder side)
    const_vocab_size: int  # extended constraint vocabulary (encoder side)
    cfg: GeneratorConfig = GeneratorConfig()

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageEncoder(
            backbone=c.backbone,
            d_model=c.d_model,
            nhead=c.nhead,
            num_layers=c.num_encoder_layers,
            dim_feedforward=c.dim_feedforward,
            dropout=c.dropout,
            dtype=dtype,
        )
        self.const_encoder = ConstraintEncoder(
            self.const_vocab_size,
            c.d_model,
            c.nhead,
            c.num_encoder_layers,
            c.dim_feedforward,
            c.dropout,
            dtype=dtype,
        )
        # learned scalar flags marking image vs constraint memory rows
        # (`models/autoreg.py:482-490`: nn.Embedding(2, 1))
        self.flag_emb = self.param(
            "flag_emb", nn.initializers.normal(0.02), (2, 1)
        )
        self.decoder = TokenDecoder(
            vocab_size=self.vocab_size,
            d_model=c.d_model,
            nhead=c.nhead,
            num_layers=c.num_decoder_layers,
            dim_feedforward=c.dim_feedforward,
            dropout=c.dropout,
            dtype=dtype,
        )

    def encode_memory(
        self,
        image: jax.Array,  # [B, H, W, 4]
        const_seq: jax.Array,  # [B, Lc]
        const_keep: jax.Array,  # [B, Lc]
        train: bool = False,
    ) -> jax.Array:
        img_mem = self.encoder(image, train=train)  # [B, M, D]
        const_mem = self.const_encoder(const_seq, const_keep, train=train)
        # cast the f32 flag params down — a raw add upcasts the memory to
        # f32, doubling the decode scan's per-step HBM stream
        flag = self.flag_emb.astype(img_mem.dtype)
        img_mem = img_mem + flag[0]
        const_mem = const_mem + flag[1]
        # NOTE (parity): the reference decoder cross-attends the concatenated
        # memory WITHOUT a padding mask (`common/common.py:116-129`), so
        # padded constraint rows stay visible here too.
        return jnp.concatenate([img_mem, const_mem], axis=1)

    def __call__(
        self,
        seq: jax.Array,  # [B, S] decoder input tokens
        image: jax.Array,
        const_seq: jax.Array,
        const_keep: jax.Array,
        tgt_keep: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        memory = self.encode_memory(image, const_seq, const_keep, train)
        return self.decoder(
            seq, memory, tgt_keep=tgt_keep, causal=True, deterministic=not train
        )


def smoothed_ce_loss(
    logits: jax.Array,  # [B, S, V]
    targets: jax.Array,  # [B, S]
    ignore_id: int,
    smoothing: float = 0.1,
) -> jax.Array:
    """torch CrossEntropyLoss(label_smoothing, ignore_index) semantics:
    mean over non-ignored positions of smoothed NLL."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    on = 1.0 - smoothing
    off = smoothing / V
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    loss = -(on * tgt_logp + off * jnp.sum(logp, axis=-1))
    keep = (targets != ignore_id).astype(jnp.float32)
    return jnp.sum(loss * keep) / jnp.maximum(jnp.sum(keep), 1.0)


class AutoregGenerator:
    """Generator-protocol wrapper: host-side conditioning + jittable core."""

    # the auxiliary task this job trains with (`autoreg.py:432-464`);
    # 'multitask' samples a task per batch with the LayoutFormer++ weights
    # (`autoreg.py:506-520`)
    MULTITASK_CHOICES = ("uncond", "c", "cwh", "partial", "refinement", "relation")
    MULTITASK_WEIGHTS = (1 / 12, 1 / 3, 1 / 3, 1 / 12, 1 / 3, 1 / 12)

    def __init__(
        self,
        tokenizer: LayoutSequenceTokenizer,
        cfg: GeneratorConfig = GeneratorConfig(),
        auxiliary_task: Optional[str] = "uncond",
        image_hw: tuple[int, int] = (350, 240),
    ) -> None:
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.multitask = auxiliary_task == "multitask"
        if self.multitask:
            auxiliary_task = "uncond"
        self.task = normalize_task(auxiliary_task)
        self.vocab = ConstraintVocabulary(tokenizer)
        self.image_hw = image_hw
        # optional precomputed {id: clause list} table (cache.load_relationships)
        self.relationships_table: Optional[dict] = None
        self.core = self._build_core()
        self.token_mask = tokenizer.token_mask  # np [L, V]
        # standalone view of the decoder submodule: same hyperparams, applied
        # with the 'decoder' param subtree — this is what the decode scan drives
        self.decoder_module = TokenDecoder(
            vocab_size=tokenizer.N_total,
            d_model=cfg.d_model,
            nhead=cfg.nhead,
            num_layers=cfg.num_decoder_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            dtype=cfg.dtype or jnp.float32,
        )

    def _build_core(self) -> nn.Module:
        return AutoregCore(
            vocab_size=self.tokenizer.N_total,
            const_vocab_size=self.vocab.N_total,
            cfg=self.cfg,
        )

    # ---- init ------------------------------------------------------------

    def init(self, key: jax.Array, batch_size: int = 1):
        H, W = self.image_hw
        Lc = self.vocab.const_len(self.task)
        T = self.tokenizer.max_token_length
        # jit the init: eager flax init dispatches hundreds of tiny ops,
        # painfully slow over a remote-TPU tunnel
        return jax.jit(self.core.init)(
            key,
            jnp.zeros((batch_size, T), jnp.int32),
            jnp.zeros((batch_size, H, W, 4), jnp.float32),
            jnp.zeros((batch_size, Lc), jnp.int32),
            jnp.ones((batch_size, Lc), bool),
        )

    # ---- host-side preprocessing ------------------------------------------

    def build_condition(
        self, batch: dict, rng: np.random.Generator, task: Optional[str] = None
    ) -> tuple[Condition, Layout]:
        """batch: {'layout': Layout, 'image': [B,H,W,4], optional 'id'}."""
        if task is None and self.multitask:
            w = np.asarray(self.MULTITASK_WEIGHTS)
            task = rng.choice(self.MULTITASK_CHOICES, p=w / w.sum())
        task = self.task if task is None else normalize_task(task)
        cond, target = get_condition(
            batch["layout"], batch["image"], task, self.tokenizer, rng,
            ids=batch.get("id"), retrieved=batch.get("retrieved"),
            relationships=self.relationships_table,
        )
        cond.const_seq, cond.const_mask = build_constraint_sequence(
            cond, self.vocab, rng
        )
        return cond, target

    def preprocess(self, batch: dict, rng: np.random.Generator) -> tuple[dict, dict]:
        """Training-side: condition + teacher-forced decoder tensors."""
        cond, target = self.build_condition(batch, rng)
        enc = self.tokenizer.encode(target)
        seq, mask = np.asarray(enc["seq"]), np.asarray(enc["mask"])
        inputs = {
            "seq": seq[:, :-1],
            "tgt_keep": mask[:, :-1],
            "image": np.asarray(batch["image"]),
            "const_seq": cond.const_seq,
            "const_keep": cond.const_mask,
        }
        targets = {"seq": seq[:, 1:]}
        return inputs, targets

    # ---- jittable loss -----------------------------------------------------

    def loss(self, variables, inputs: dict, targets: dict, *, train: bool = True,
             rngs: Optional[dict] = None):
        logits, new_state = self.core.apply(
            variables,
            inputs["seq"],
            inputs["image"],
            inputs["const_seq"],
            inputs["const_keep"],
            inputs["tgt_keep"],
            train,
            rngs=rngs,
            mutable=["batch_stats"] if train else [],
        )
        nll = smoothed_ce_loss(
            logits, targets["seq"], self.tokenizer.pad_id, self.cfg.label_smoothing
        )
        return nll, {"nll_loss": nll, "state": new_state}

    # ---- sampling ----------------------------------------------------------

    def encode_memory(self, variables, cond: Condition):
        return self.core.apply(
            variables,
            jnp.asarray(cond.image),
            jnp.asarray(cond.const_seq),
            jnp.asarray(cond.const_mask),
            False,
            method=AutoregCore.encode_memory,
        )

    def decode(self, variables, memory, forced, sampling: SamplingConfig,
               key: jax.Array, kv_quant: bool = False,
               self_quant: bool = False) -> jax.Array:
        """Jittable: run the KV-cached constrained decode scan."""
        tok = self.tokenizer
        dec_vars = {"params": variables["params"]["decoder"]}
        return ar_decode(
            self.decoder_module, dec_vars, memory, None,
            jnp.asarray(self.token_mask), jnp.asarray(forced),
            tok.max_token_length, tok.bos_id, tok.pad_id, sampling, key,
            kv_quant=kv_quant, self_quant=self_quant,
        )

    def sample(self, variables, cond: Condition, sampling: SamplingConfig,
               key: jax.Array, return_tokens: bool = False,
               use_backtrack: bool = True, max_retries: int = 8,
               kv_quant: bool = False, self_quant: bool = False):
        memory = self.encode_memory(variables, cond)
        forced = build_forced_tokens(cond, self.tokenizer)
        if normalize_task(cond.task) == "relation" and use_backtrack:
            # batched on-device backtracking (`autoreg.py:128-134` routes
            # relation+backtrack to the constrained sampler)
            from ralf_tpu.ops.relation_decode import (
                build_relation_tensors,
                relation_aware_decode,
            )

            tensors = build_relation_tensors(cond, self.tokenizer.max_seq_length)
            dec_vars = {"params": variables["params"]["decoder"]}
            seq = relation_aware_decode(
                self.decoder_module, dec_vars, memory, self.tokenizer,
                jnp.asarray(forced), tensors, sampling, key,
                max_retries=max_retries, kv_quant=kv_quant,
                self_quant=self_quant,
            )
        else:
            seq = self.decode(variables, memory, forced, sampling, key,
                              kv_quant=kv_quant, self_quant=self_quant)
        layout = self.tokenizer.decode(seq)
        return (layout, seq) if return_tokens else layout
