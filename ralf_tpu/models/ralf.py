"""RALF — Retrieval-Augmented Layout Transformer (the flagship model).

Parity target: `ConcateAuxilaryTaskConcateCrossAttnRetrievalAugmentedAutoreg`
("Final architecture", `image2layout/train/models/
retrieval_augmented_autoreg.py:997-1033`), the `ralf` config:

    memory    = ImageEncoder(image+saliency)                  [B, M, D]
    ref       = PE1d(adapter(stop_grad(FIDNet(layout_k))))    [B, K, D]
    memory_ca = ViTCrossAttn(memory, ref)                     [B, M, D]
    fused     = ViTFFN(concat_seq[memory, memory_ca, ref])    [B, 2M+K, D]
    memory'   = concat_seq[fused + flag_img, ConstEnc(c) + flag_user]
    logits    = TokenDecoder(tokens | memory', causal)

TPU redesign: the reference encodes the k=16 retrieved layouts in a
Python `for kdx in range(top_k)` loop of separate FIDNet forwards
(`:539-568`) — here they're folded into the batch axis (one [B*K]
FIDNet call on the MXU).  The frozen tower is enforced functionally with
`stop_gradient` (+ the optimizer never sees its params — they live in a
separate 'frozen' collection).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.core.layout import Layout
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer
from ralf_tpu.models.autoreg import AutoregGenerator, ConstraintEncoder
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.fidnet import FIDNetV3
from ralf_tpu.models.nn import TokenDecoder
from ralf_tpu.models.positional import PositionalEncoding1D
from ralf_tpu.models.resnet import ImageEncoder


class ViTFeedForward(nn.Module):
    """LN -> Linear -> GELU -> Dropout -> Linear -> Dropout
    (`models/common/attention.py:16-30`)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.output_dim, dtype=self.dtype)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ViTCrossAttention(nn.Module):
    """Pre-LN cross-attention, bias-free projections
    (`models/common/attention.py:33-70`); q = image memory, kv = retrieved
    layout features."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(h)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(
            context
        )
        k, v = jnp.split(kv, 2, axis=-1)
        B, N, _ = x.shape
        M = context.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class RALFCore(nn.Module):
    """Flax core of the final RALF architecture (see module docstring).

    fusion selects among the reference's intermediate-fusion ablations
    (`retrieval_augmented_autoreg.py:587-1294` implements them as nine
    classes; here one flag):
      * 'concat_crossattn' — the final architecture:
        head(concat_seq[memory, CA(memory, ref), ref])
      * 'crossattn'        — cross-attention only: head(CA(memory, ref))
        added rows (`BaseAuxilaryTaskCrossAttn...`)
      * 'concat'           — concat only, no cross-attention
        (`...ConcatRetrievalAugmentedAutoreg:858-903`)
      * 'adapter'          — ref rows appended raw after the adapter
        (`RetrievalAugmentedAutoregAdapter:587-632`)
      * 'flag_concat_crossattn' — final architecture plus a learned
        per-modality scalar added to image vs layout rows before the
        cross-attention (`...FlagConcatCrossAttn...:1039-1137`;
        the reference's nn.Embedding(2, 1) broadcast)
      * 'pre_encoder'      — fuse BEFORE the shared transformer: the raw
        PE'd feature map cross-attends to ref, and the transformer runs
        over concat[feat, CA, ref] (`...ConcatTransEnc...:1140-1232`)
      * 'post_encoder'     — encode the image normally, then run a second
        modality transformer over concat[memory, ref]
        (`...AfterConcatTransEnc...:1235-1294`)
    """

    vocab_size: int
    const_vocab_size: int
    num_labels: int
    max_seq_length: int
    top_k: int = 16
    fusion: str = "concat_crossattn"
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
        # frozen layout tower (FID feature extractor, `:143-155`)
        self.layout_encoder = FIDNetV3(
            num_labels=self.num_labels,
            d_model=256,
            nhead=4,
            num_layers=4,
            max_bbox=self.max_seq_length,
            dtype=dtype,
        )
        self.layout_adapter = ViTFeedForward(
            4 * c.d_model, c.d_model, dropout=0.0, dtype=dtype
        )
        self.pos_emb_1d = PositionalEncoding1D(c.d_model, dropout=c.dropout)
        self.attn = ViTCrossAttention(heads=8, dim_head=64, dtype=dtype)
        self.fusion_head = ViTFeedForward(
            4 * c.d_model, c.d_model, dropout=0.0, dtype=dtype
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
        self.flag_emb = self.param("flag_emb", nn.initializers.normal(0.02), (2, 1))
        if self.fusion == "flag_concat_crossattn":
            # per-modality scalar, broadcast over D — the reference's
            # img_or_layout_emb = nn.Embedding(2, 1) (`:1058-1063`)
            self.modality_emb = self.param(
                "modality_emb", nn.initializers.normal(0.02), (2, 1)
            )
        if self.fusion == "post_encoder":
            from ralf_tpu.models.nn import TransformerEncoder

            self.modality_encoder = TransformerEncoder(
                c.d_model, c.nhead, c.num_encoder_layers, c.dim_feedforward,
                0.1, dtype=dtype,
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

    def encode_retrieved(self, retrieved: dict, train: bool = False) -> jax.Array:
        """{'label': [B,K,S], ...} -> ref feature sequence [B, K, D].

        Folds K into the batch axis: ONE FIDNet forward instead of the
        reference's per-k loop (`retrieval_augmented_autoreg.py:539-568`).

        If the dict carries precomputed tower features ('feats' [B,K,256],
        gathered from `RALFGenerator.precompute_retrieved_feats`'s gallery
        table), the frozen FIDNet forward is skipped entirely — the tower
        is frozen AND the gallery is fixed, so its features are a pure
        function of the checkpoint, not of the query batch.
        """
        if "feats" in retrieved and retrieved["feats"] is not None:
            feats = retrieved["feats"].astype(self.cfg.dtype or jnp.float32)
            B, K = feats.shape[:2]
        else:
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
            feats = self.layout_encoder.extract_features(flat)  # [B*K, 256]
        feats = jax.lax.stop_gradient(feats)  # frozen tower
        ref = self.layout_adapter(feats.reshape(B, K, -1), deterministic=not train)
        return self.pos_emb_1d(ref, deterministic=not train)

    def encode_memory(
        self,
        image: jax.Array,
        retrieved: dict,
        const_seq: jax.Array,
        const_keep: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        ref = self.encode_retrieved(retrieved, train)  # [B, K, D]
        det = not train
        if self.fusion == "pre_encoder":
            # fuse before the shared transformer (`:1167-1196`): the raw
            # PE'd feature map cross-attends to ref, and the transformer
            # encodes the concatenated [feat, CA, ref] sequence
            feat = self.encoder.features(image, train=train)
            memory_ca = self.attn(feat, ref, deterministic=det)
            fused = self.encoder.encode_seq(
                jnp.concatenate([feat, memory_ca, ref], axis=1), train=train
            )  # [B, 2M+K, D]
        elif self.fusion == "post_encoder":
            # second modality transformer after the image encoder (`:1281-1294`)
            memory = self.encoder(image, train=train)
            fused = self.modality_encoder(
                jnp.concatenate([memory, ref], axis=1), deterministic=det
            )  # [B, M+K, D]
        elif self.fusion == "flag_concat_crossattn":
            memory = self.encoder(image, train=train)
            emb = self.modality_emb.astype(memory.dtype)
            memory = memory + emb[0]
            ref = ref + emb[1]
            memory_ca = self.attn(memory, ref, deterministic=det)
            fused = self.fusion_head(
                jnp.concatenate([memory, memory_ca, ref], axis=1),
                deterministic=det,
            )  # [B, 2M+K, D]
        elif self.fusion == "concat_crossattn":  # final architecture
            memory = self.encoder(image, train=train)
            memory_ca = self.attn(memory, ref, deterministic=det)
            fused = self.fusion_head(
                jnp.concatenate([memory, memory_ca, ref], axis=1),
                deterministic=det,
            )  # [B, 2M+K, D]
        elif self.fusion == "crossattn":
            memory = self.encoder(image, train=train)
            memory_ca = self.attn(memory, ref, deterministic=det)
            fused = self.fusion_head(
                jnp.concatenate([memory, memory_ca], axis=1), deterministic=det
            )
        elif self.fusion == "concat":
            memory = self.encoder(image, train=train)
            fused = self.fusion_head(
                jnp.concatenate([memory, ref], axis=1), deterministic=det
            )
        elif self.fusion == "adapter":
            memory = self.encoder(image, train=train)
            fused = jnp.concatenate([memory, ref], axis=1)
        else:
            raise ValueError(self.fusion)
        const = self.const_encoder(const_seq, const_keep, train=train)
        # keep the memory in compute dtype: adding the f32 flag params raw
        # upcasts the whole [B, 2M+K+Lc, D] memory to f32, doubling both the
        # encode materialization and the decode scan's per-step HBM stream
        flag = self.flag_emb.astype(fused.dtype)
        fused = fused + flag[0]
        const = const + flag[1]
        return jnp.concatenate([fused, const], axis=1)

    def __call__(
        self,
        seq: jax.Array,
        image: jax.Array,
        retrieved: dict,
        const_seq: jax.Array,
        const_keep: jax.Array,
        tgt_keep: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        memory = self.encode_memory(image, retrieved, const_seq, const_keep, train)
        return self.decoder(
            seq, memory, tgt_keep=tgt_keep, causal=True, deterministic=not train
        )


def _pad0(a: np.ndarray, pad: int) -> np.ndarray:
    if pad <= 0:
        return a
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


class RALFGenerator(AutoregGenerator):
    """Generator-protocol wrapper for RALF.

    Reuses the Autoreg host-side conditioning; adds the retrieval arrays
    to every batch (gathered by retrieval/wrapper.py) and routes them
    through RALFCore.  The frozen FIDNet params are loaded from a trained
    FIDNet checkpoint via `load_layout_encoder`.
    """

    def __init__(
        self,
        tokenizer: LayoutSequenceTokenizer,
        cfg: GeneratorConfig = GeneratorConfig(),
        auxiliary_task: Optional[str] = "uncond",
        image_hw: tuple[int, int] = (350, 240),
        top_k: int = 16,
        fusion: str = "concat_crossattn",
    ) -> None:
        self.top_k = top_k
        self.fusion = fusion
        super().__init__(tokenizer, cfg, auxiliary_task, image_hw)

    def _build_core(self) -> nn.Module:
        return RALFCore(
            vocab_size=self.tokenizer.N_total,
            const_vocab_size=self.vocab.N_total,
            num_labels=self.tokenizer.N_label,
            max_seq_length=self.tokenizer.max_seq_length,
            top_k=self.top_k,
            fusion=self.fusion,
            cfg=self.cfg,
        )

    def _dummy_retrieved(self, batch_size: int) -> dict:
        S = self.tokenizer.max_seq_length
        K = self.top_k
        z = jnp.zeros((batch_size, K, S), jnp.float32)
        return {
            "label": jnp.zeros((batch_size, K, S), jnp.int32),
            "center_x": z,
            "center_y": z,
            "width": z,
            "height": z,
            "mask": jnp.zeros((batch_size, K, S), bool),
        }

    def init(self, key: jax.Array, batch_size: int = 1):
        H, W = self.image_hw
        Lc = self.vocab.const_len(self.task)
        T = self.tokenizer.max_token_length
        return jax.jit(self.core.init)(
            key,
            jnp.zeros((batch_size, T), jnp.int32),
            jnp.zeros((batch_size, H, W, 4), jnp.float32),
            self._dummy_retrieved(batch_size),
            jnp.zeros((batch_size, Lc), jnp.int32),
            jnp.ones((batch_size, Lc), bool),
        )

    def load_layout_encoder(self, variables, fidnet_params) -> Any:
        """Install trained (frozen) FIDNet weights into the param tree."""
        params = dict(variables["params"])
        params["layout_encoder"] = fidnet_params
        return {**variables, "params": params}

    @staticmethod
    def _retrieved_arrays(retrieved: dict) -> dict:
        keys = ("label", "center_x", "center_y", "width", "height", "mask")
        out = {k: jnp.asarray(np.asarray(retrieved[k])) for k in keys}
        if retrieved.get("feats") is not None:
            out["feats"] = jnp.asarray(np.asarray(retrieved["feats"]))
        return out

    def precompute_retrieved_feats(
        self, variables, gallery_layouts: dict, chunk: int = 4096
    ) -> np.ndarray:
        """FIDNet CLS features [G, 256] for every gallery layout, once.

        The layout tower is frozen (stop_gradient; the optimizer never sees
        it) and the retrieval gallery is fixed, so these features depend
        only on the checkpoint.  The reference re-encodes the k neighbors
        inside every forward (`retrieval_augmented_autoreg.py:539-568`);
        gathering rows of this table (batch['retrieved']['feats']) removes
        B*K FIDNet forwards from each sample/loss call.
        """
        def _extract(mdl, layout):
            return mdl.layout_encoder.extract_features(layout)

        fn = jax.jit(lambda v, lay: self.core.apply(v, lay, method=_extract))
        G = np.asarray(gallery_layouts["label"]).shape[0]
        chunk = min(chunk, G)
        out = []
        for s in range(0, G, chunk):
            sl = slice(s, min(s + chunk, G))
            n = sl.stop - sl.start
            pad = chunk - n  # fixed shape -> one compile
            lay = Layout(
                label=_pad0(np.asarray(gallery_layouts["label"][sl], np.int32), pad),
                center_x=_pad0(np.asarray(gallery_layouts["center_x"][sl], np.float32), pad),
                center_y=_pad0(np.asarray(gallery_layouts["center_y"][sl], np.float32), pad),
                width=_pad0(np.asarray(gallery_layouts["width"][sl], np.float32), pad),
                height=_pad0(np.asarray(gallery_layouts["height"][sl], np.float32), pad),
                mask=_pad0(np.asarray(gallery_layouts["mask"][sl], bool), pad),
            )
            out.append(np.asarray(fn(variables, lay))[:n].astype(np.float32))
        return np.concatenate(out, axis=0)

    def preprocess(self, batch: dict, rng: np.random.Generator):
        assert "retrieved" in batch, "RALF needs retrieval-augmented batches"
        inputs, targets = super().preprocess(batch, rng)
        inputs["retrieved"] = self._retrieved_arrays(batch["retrieved"])
        return inputs, targets

    def loss(self, variables, inputs: dict, targets: dict, *, train: bool = True,
             rngs: Optional[dict] = None):
        from ralf_tpu.models.autoreg import smoothed_ce_loss

        logits, new_state = self.core.apply(
            variables,
            inputs["seq"],
            inputs["image"],
            inputs["retrieved"],
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

    def encode_memory(self, variables, cond):
        return self.core.apply(
            variables,
            jnp.asarray(cond.image),
            self._retrieved_arrays(cond.retrieved),
            jnp.asarray(cond.const_seq),
            jnp.asarray(cond.const_mask),
            False,
            method=RALFCore.encode_memory,
        )
