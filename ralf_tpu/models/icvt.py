"""ICVT — geometry-aligned conditional VAE transformer baseline.

Parity target: `image2layout/train/models/icvt.py` (ICVT, ACMMM'22):
  * per-attribute linear tokenizer with a BG class for padding (`:23-55`)
  * layout-dict embedding (d/5 per attribute, concatenated) and per-
    attribute classification heads (`:58-88`)
  * geometry-aligned (GA) cross-attention: layout-geometry embeddings are
    concatenated (config: ga_type=concat, d_model=200) onto the query/key
    of the decoder's cross-attention; values keep zeros on the appended
    half (`:443-560`)
  * cVAE: 6-layer GA encoder over GT layout embeddings + attention pooling
    with a learnable token -> (mu, logvar) -> z; 6-layer GA decoder with
    teacher forcing; CE recon per attribute + KL with a 2-cycle cyclical
    beta schedule (`:257-427`)
  * sampling: z ~ N(0, I), embeddings fed back autoregressively (`:345-410`)

TPU redesign: the sampling loop runs over a statically padded [B, 1+S, D]
target with a causal mask (S=10), one jitted program; the GA key grid
(22x15 pseudo-layout of the feature map) is a trace-time constant.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.core.bucketizer import linear_bucketizer
from ralf_tpu.core.layout import GEO_KEYS, Layout
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.nn import FeedForward, MultiHeadAttention, causal_bias, keep_to_bias
from ralf_tpu.models.positional import PositionalEncoding1D
from ralf_tpu.models.resnet import ImageEncoder


class ICVTTokenizer:
    """Per-attribute bucketizer; label BG class marks padding (`:23-55`)."""

    def __init__(self, num_labels: int, n_boundaries: int = 128) -> None:
        self.num_labels = num_labels
        self.bg_idx = num_labels
        self.n_boundaries = n_boundaries
        self._b = {k: linear_bucketizer(n_boundaries) for k in GEO_KEYS}

    def encode(self, layout: Layout) -> dict:
        out = {"mask": layout.mask}
        for k in GEO_KEYS:
            out[k] = jnp.where(layout.mask, self._b[k].encode(layout.geo(k)), 0)
        out["label"] = jnp.where(layout.mask, layout.label, self.bg_idx)
        return out

    def decode(self, ids: dict) -> Layout:
        mask = ids["label"] != self.bg_idx
        geo = {k: jnp.where(mask, self._b[k].decode(ids[k]), 0.0) for k in GEO_KEYS}
        return Layout(
            label=jnp.where(mask, ids["label"], 0).astype(jnp.int32),
            center_x=geo["center_x"], center_y=geo["center_y"],
            width=geo["width"], height=geo["height"], mask=mask,
        )


class LayoutDictEncoder(nn.Module):
    d_attr: int  # d_model // 5
    num_classes_w_bg: int
    n_boundaries: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: dict) -> jax.Array:
        hs = [nn.Embed(self.num_classes_w_bg, self.d_attr, dtype=self.dtype,
                       name="embed_label")(ids["label"])]
        for k in GEO_KEYS:
            hs.append(nn.Embed(self.n_boundaries, self.d_attr, dtype=self.dtype,
                               name=f"embed_{k}")(ids[k]))
        return jnp.concatenate(hs, axis=-1)


class GeoDictEncoder(nn.Module):
    """Geometry-only embedding (d/4 per attribute) for the GA key grid."""

    d_attr: int
    n_boundaries: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: dict) -> jax.Array:
        hs = []
        for k in GEO_KEYS:
            hs.append(nn.Embed(self.n_boundaries, self.d_attr, dtype=self.dtype,
                               name=f"embed_{k}")(ids[k]))
        return jnp.concatenate(hs, axis=-1)


class LayoutDictDecoder(nn.Module):
    num_classes_w_bg: int
    n_boundaries: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> dict:
        out = {"label": nn.Dense(self.num_classes_w_bg, dtype=self.dtype,
                                 name="fc_label")(h)}
        for k in GEO_KEYS:
            out[k] = nn.Dense(self.n_boundaries, dtype=self.dtype, name=f"fc_{k}")(h)
        return out


class GADecoderLayer(nn.Module):
    """Pre-LN decoder layer; cross-attn query/key carry concatenated GA
    embeddings, values zero-extended (`icvt.py:524-560`, ga_type=concat)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    ga_type: Optional[str] = "concat"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, self.dtype)
        d_cross = 2 * self.d_model if self.ga_type == "concat" else self.d_model
        self.cross_attn = MultiHeadAttention(d_cross, self.nhead, self.dropout, self.dtype)
        self.cross_out = nn.Dense(self.d_model, dtype=self.dtype)
        self.ffn = FeedForward(self.d_model, self.dim_feedforward, self.dropout, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)

    def __call__(self, x, memory, ga_q, ga_k, self_bias=None, mem_bias=None,
                 deterministic: bool = True):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, self_bias, deterministic)
        h = self.norm2(x)
        if self.ga_type == "add":
            # `icvt.py:533-536`: key = mem + ga_k but VALUE = mem alone
            ca = self.cross_attn
            k = ca._split(ca.k_proj(memory + ga_k))
            v = ca._split(ca.v_proj(memory))
            x = x + ca.attend(h + ga_q, k, v, mem_bias, deterministic)
        elif self.ga_type == "concat":
            # `icvt.py:537-556`: Q = [x, ga_q], K = [mem, ga_k], and the
            # VALUE input is [mem, 0] (the GA half rides only the scores);
            # the torch MHA then truncates out_proj's 2d output to the
            # first d channels, so `cross_out` IS that truncated out_proj
            # (applied to the raw concatenated head outputs, no 2d->2d
            # projection in between — exact weight-port contract).
            ca = self.cross_attn
            q_in = jnp.concatenate([h, ga_q], axis=-1)
            k_in = jnp.concatenate([memory, ga_k], axis=-1)
            v_in = jnp.concatenate([memory, jnp.zeros_like(memory)], axis=-1)
            q = ca._split(ca.q_proj(q_in))
            k = ca._split(ca.k_proj(k_in))
            v = ca._split(ca.v_proj(v_in))
            scale = jnp.asarray(ca.head_dim, q.dtype) ** -0.5
            logits = jnp.einsum("bshd,bmhd->bhsm", q * scale, k)
            if mem_bias is not None:
                logits = logits + mem_bias.astype(logits.dtype)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
            out = jnp.einsum("bhsm,bmhd->bshd", probs, v)
            B, S = q_in.shape[:2]
            x = x + self.cross_out(out.reshape(B, S, -1))
        else:
            x = x + self.cross_attn(h, memory, mem_bias, deterministic)
        x = x + self.ffn(self.norm3(x), deterministic)
        return x


class GADecoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    dropout: float = 0.1
    ga_type: Optional[str] = "concat"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, ga_q, ga_k, tgt_keep=None, causal=False,
                 deterministic: bool = True):
        S = x.shape[1]
        self_bias = None
        if causal:
            self_bias = causal_bias(S)[None, None]
        if tgt_keep is not None:
            pad_bias = keep_to_bias(tgt_keep)[:, None, None, :]
            self_bias = pad_bias if self_bias is None else self_bias + pad_bias
        for i in range(self.num_layers):
            x = GADecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.ga_type, self.dtype, name=f"layer_{i}",
            )(x, memory, ga_q, ga_k, self_bias, None, deterministic)
        return x


class ICVTCore(nn.Module):
    num_labels: int
    max_seq_length: int = 10
    n_boundaries: int = 128
    ga_type: Optional[str] = "concat"
    image_hw: tuple = (350, 240)
    cfg: GeneratorConfig = GeneratorConfig(d_model=200)

    def setup(self) -> None:
        c = self.cfg
        d = c.d_model
        dtype = c.dtype or jnp.float32
        assert d % 4 == 0 and d % 5 == 0, d  # reference asserts the same
        K = self.num_labels + 1
        self.encoder = ImageEncoder(
            backbone=c.backbone, d_model=d, nhead=c.nhead,
            num_layers=c.num_encoder_layers, dim_feedforward=2048,
            dropout=c.dropout, fpn_style="cgl", dtype=dtype,
        )
        self.layout_encoder = LayoutDictEncoder(d // 5, K, self.n_boundaries, dtype)
        self.ga_layout_encoder = GeoDictEncoder(d // 4, self.n_boundaries, dtype)
        self.layout_decoder = LayoutDictDecoder(K, self.n_boundaries, dtype)
        self.pos_emb_1d = PositionalEncoding1D(d, dropout=c.dropout)
        self.vae_encoder = GADecoder(d, 8, c.num_encoder_layers, 2048, c.dropout,
                                     self.ga_type, dtype)
        self.vae_decoder = GADecoder(d, 8, c.num_decoder_layers, 2048, c.dropout,
                                     self.ga_type, dtype)
        self.aap = MultiHeadAttention(d, 8, c.dropout, dtype)
        self.learnable_token = self.param(
            "learnable_token", nn.initializers.normal(0.02), (1, 1, d)
        )
        self.fc_mu = nn.Dense(d, dtype=dtype)
        self.fc_var = nn.Dense(d, dtype=dtype)

    def ga_key_grid(self, B: int) -> jax.Array:
        """Grid pseudo-layout of the stride-16 feature map (`icvt.py:90-101,
        247-256`; 22x15 at the reference canvas), a trace-time constant."""
        gy = -(-self.image_hw[0] // 16)
        gx = -(-self.image_hw[1] // 16)
        ys, xs = np.meshgrid(np.arange(gy) / gy, np.arange(gx) / gx, indexing="ij")
        b = linear_bucketizer(self.n_boundaries)

        def enc(v):  # pure-numpy bucketize (trace-time constant)
            v = np.clip(np.asarray(v, np.float64).reshape(-1), 0.0, 1.0)
            return jnp.asarray(np.searchsorted(b.boundaries, v, side="left"))

        ids = {
            "center_y": enc(ys),
            "center_x": enc(xs),
            "width": enc(np.full(gy * gx, 1 / gx)),
            "height": enc(np.full(gy * gx, 1 / gy)),
        }
        h = self.ga_layout_encoder(ids)  # [330, d]
        return jnp.tile(h[None], (B, 1, 1))

    def encode_posterior(self, ids: dict, img_memory: jax.Array,
                         ga_k: jax.Array, key: jax.Array, train: bool):
        layout_feature = self.layout_encoder(ids)
        h = self.vae_encoder(
            layout_feature, img_memory, layout_feature, ga_k,
            tgt_keep=ids["mask"], deterministic=not train,
        )
        B = h.shape[0]
        tok = jnp.tile(self.learnable_token, (B, 1, 1)).astype(h.dtype)
        pooled = self.aap(tok, h, keep_to_bias(ids["mask"])[:, None, None, :],
                          deterministic=not train)
        mu = self.fc_mu(pooled)
        logvar = self.fc_var(pooled)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        z = eps * jnp.exp(0.5 * logvar) + mu
        return z, mu, logvar, layout_feature

    def __call__(self, ids: dict, image: jax.Array, key: jax.Array,
                 train: bool = False):
        img_memory = self.encoder(image, train=train)
        B = image.shape[0]
        ga_k = self.ga_key_grid(B)
        z, mu, logvar, layout_feature = self.encode_posterior(
            ids, img_memory, ga_k, key, train
        )
        shifted = jnp.concatenate([z, layout_feature[:, :-1]], axis=1)
        shifted = self.pos_emb_1d(shifted, deterministic=not train)
        h = self.vae_decoder(
            shifted, img_memory, shifted, ga_k, causal=True,
            deterministic=not train,
        )
        out = self.layout_decoder(h)
        return out, mu, logvar

    def decode_step_stack(self, tgt: jax.Array, img_memory: jax.Array,
                          ga_k: jax.Array) -> dict:
        h = self.pos_emb_1d(tgt, deterministic=True)
        # reference quirk, matched deliberately: at TRAIN time ga_input_query
        # includes the positional encoding (the variable is overwritten,
        # `icvt.py:291-303`), but at SAMPLE time it is the raw pre-PE target
        # (`icvt.py:380-386` passes `tgt`, not `self.pos_emb_1d(tgt)`).
        h = self.vae_decoder(h, img_memory, tgt, ga_k, causal=True)
        return self.layout_decoder(h)

    def embed_layout(self, ids: dict) -> jax.Array:
        return self.layout_encoder(ids)

    def encode_image(self, image: jax.Array) -> jax.Array:
        return self.encoder(image, train=False)


class ICVTGenerator:
    """Generator-protocol wrapper for ICVT."""

    def __init__(self, num_labels: int,
                 cfg: GeneratorConfig = GeneratorConfig(d_model=200),
                 ga_type: Optional[str] = "concat", kl_mult: float = 1.0,
                 max_seq_length: int = 10,
                 image_hw: tuple[int, int] = (350, 240)) -> None:
        self.num_labels = num_labels
        self.cfg = cfg
        self.S = max_seq_length
        self.image_hw = image_hw
        self.kl_mult = kl_mult
        self.kl_beta = 1e-3
        self.task = "uncond"
        self.icvt_tokenizer = ICVTTokenizer(num_labels)
        self.tokenizer = None
        self.core = ICVTCore(
            num_labels=num_labels, max_seq_length=max_seq_length,
            ga_type=ga_type, image_hw=image_hw, cfg=cfg,
        )

    def init(self, key: jax.Array, batch_size: int = 1):
        H, W = self.image_hw
        ids = {
            "label": jnp.zeros((batch_size, self.S), jnp.int32),
            "center_x": jnp.zeros((batch_size, self.S), jnp.int32),
            "center_y": jnp.zeros((batch_size, self.S), jnp.int32),
            "width": jnp.zeros((batch_size, self.S), jnp.int32),
            "height": jnp.zeros((batch_size, self.S), jnp.int32),
            "mask": jnp.ones((batch_size, self.S), bool),
        }
        return jax.jit(self.core.init)(
            key, ids, jnp.zeros((batch_size, H, W, 4), jnp.float32),
            jax.random.PRNGKey(0),
        )

    def update_per_epoch(self, epoch: int, warmup: int, max_epoch: int) -> None:
        """Cyclical KL beta, 2 cycles (`icvt.py:412-427`)."""
        period = max(max_epoch // 2, 1)
        t = (epoch % period) / period
        if t < 0.5:
            beta = 0.001
        elif t < 0.75:
            beta = 0.001 + (0.3 - 0.001) * (t - 0.5) / 0.25
        else:
            beta = 0.3
        self.kl_beta = beta

    def preprocess(self, batch: dict, rng: np.random.Generator):
        ids = jax.tree.map(np.asarray, self.icvt_tokenizer.encode(batch["layout"]))
        inputs = {"image": np.asarray(batch["image"]), **ids,
                  "vae_seed": np.asarray(rng.integers(2**31), np.uint32)}
        targets = {k: ids[k] for k in ("label", *GEO_KEYS)}
        return inputs, targets

    def loss(self, variables, inputs, targets, *, train: bool = True,
             rngs: Optional[dict] = None):
        ids = {k: inputs[k] for k in ("label", *GEO_KEYS, "mask")}
        key = jax.random.fold_in(jax.random.PRNGKey(17), inputs["vae_seed"])
        (out, mu, logvar), new_state = self.core.apply(
            variables, ids, inputs["image"], key, train,
            rngs=rngs, mutable=["batch_stats"] if train else [],
        )

        def ce(logits, tgt):
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        losses = {"loss_recon_label": ce(out["label"], targets["label"])}
        for k in GEO_KEYS:
            losses[f"loss_recon_{k}"] = ce(out[k], targets[k])
        losses["loss_kl"] = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
        total = sum(losses[f"loss_recon_{k}"] for k in ("label", *GEO_KEYS))
        total = total + self.kl_mult * self.kl_beta * losses["loss_kl"]
        return total, {**losses, "nll_loss": total, "state": new_state}

    def sample(self, variables, cond_batch: dict, rng: np.random.Generator,
               key: Optional[jax.Array] = None,
               z: Optional[jax.Array] = None,
               ref_duplicated_prefix: bool = False) -> Layout:
        """`z` pins the VAE latent (torch A/B: tests/test_icvt_torch_parity.py);
        normally it is drawn ~N(0, I) per `icvt.py:374-376`.

        DELIBERATE deviation from the reference's sample loop: `icvt.py:405`
        re-encodes the ENTIRE generated prefix and appends it to the target
        every step (`tgt = cat([tgt, layout_encoder(outputs)])`), so the
        decode target grows quadratically as [z, E0, E0..E1, E0..E2, ...]
        with duplicated prefixes at shifted positional-encoding slots, and
        step i reads position i of that sequence — inconsistent with the
        train-time target [z, e0, ..., e{S-2}] (`icvt.py:291-303`).  The
        default here is the train-consistent AR loop (append only the LAST
        token's embedding); `ref_duplicated_prefix=True` reproduces the
        reference loop token-for-token (locked by
        tests/test_icvt_torch_parity.py::test_sample_parity) for users who
        need bit-parity with reference checkpoints' published sampling."""
        key = key if key is not None else jax.random.PRNGKey(int(rng.integers(2**31)))
        image = jnp.asarray(cond_batch["image"])
        B = image.shape[0]
        d = self.cfg.d_model
        img_memory = self.core.apply(variables, image, method=ICVTCore.encode_image)
        ga_k = self.core.apply(variables, B, method=ICVTCore.ga_key_grid)

        if z is None:
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (B, 1, d))
        ids = {k: jnp.zeros((B, self.S), jnp.int32) for k in ("label", *GEO_KEYS)}

        if ref_duplicated_prefix:
            return self._sample_ref_loop(variables, z, img_memory, ga_k, ids)

        # fixed-shape AR loop: the target stays padded to [B, 1+S, D] with a
        # causal mask, so every step reuses ONE compiled program (a growing
        # prefix would trigger S separate compiles)
        step_fn = jax.jit(
            lambda v, tgt, mem, gk: self.core.apply(
                v, tgt, mem, gk, method=ICVTCore.decode_step_stack
            )
        )
        embed_fn = jax.jit(
            lambda v, ids1: self.core.apply(v, ids1, method=ICVTCore.embed_layout)
        )
        tgt = jnp.zeros((B, 1 + self.S, d)).at[:, :1].set(z)
        for i in range(self.S):
            out = step_fn(variables, tgt[:, :-1], img_memory, ga_k)
            step = {k: jnp.argmax(out[k][:, i], -1) for k in ("label", *GEO_KEYS)}
            for k in ids:
                ids[k] = ids[k].at[:, i].set(step[k])
            emb = embed_fn(variables, {k: ids[k][:, i : i + 1] for k in ids})
            tgt = tgt.at[:, i + 1].set(emb[:, 0])
        return self.icvt_tokenizer.decode(ids)

    def _sample_ref_loop(self, variables, z, img_memory, ga_k, ids) -> Layout:
        """Reference-exact sample loop (`icvt.py:392-405`): every step
        appends the re-encoded FULL prefix, so the target at step i is
        [z] ++ E_0 ++ ... ++ E_{i-1} (E_j = embeddings of tokens 0..j,
        length 1 + i(i+1)/2) and the readout is position i.  Shapes grow
        per step, so this path recompiles S times — parity/porting use
        only; the default fixed-shape loop is the production path."""
        segments = [z]
        for i in range(self.S):
            tgt = jnp.concatenate(segments, axis=1)
            out = self.core.apply(
                variables, tgt, img_memory, ga_k,
                method=ICVTCore.decode_step_stack,
            )
            step = {k: jnp.argmax(out[k][:, i], -1) for k in ("label", *GEO_KEYS)}
            for k in ids:
                ids[k] = ids[k].at[:, i].set(step[k])
            prefix = self.core.apply(
                variables, {k: ids[k][:, : i + 1] for k in ids},
                method=ICVTCore.embed_layout,
            )
            segments.append(prefix)
        return self.icvt_tokenizer.decode(ids)
