"""Discrete diffusion layout generators: LayoutDM + VQDiffusion.

Parity targets (`image2layout/train/models/`):
  * `diffusion/discrete/util.py:48-79`  — alpha schedules (fp64)
  * `diffusion/discrete/default.py`     — VQDiffusion mask-and-replace
    transition over the full vocabulary (q_type='default')
  * `diffusion/discrete/constrained.py` — LayoutDM per-attribute transition
    matrices (q_type='constrained')
  * `diffusion/discrete/base.py`        — KL + auxiliary losses, timestep
    importance stats, `sample_single_step` with strong-constraint
    replacement / refinement weak logits / known-count PAD disabling
  * `diffusion/common.py`               — AdaLayerNorm-conditioned decoder
  * `models/layoutdm.py`                — image-conditioned wrapper + the
    skip-step sampling schedule

TPU redesign: the reference's constrained variant round-trips every tensor
through a full<->per-attribute compact-vocab converter with per-key python
loops (`pf_converter.py`).  Here the SAME math runs entirely in the full
vocabulary: each position p carries its attribute's schedule row and a
static sub-vocabulary indicator [L, V], so q_pred / q_posterior are three
fused log-space ops over [B, L, V] tensors — one jitted program, and the
whole T-step sampler is one `lax.scan`.

Known reference quirk mirrored deliberately: diffusion refinement
strong-replaces every token the condition marks as known (which is all of
them — `helpers/task.py:163`), so the weak refinement prior only acts
through `weak_mask = ~cond.mask`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ralf_tpu.core.conditioning import Condition, get_condition, normalize_task
from ralf_tpu.core.layout import GEO_KEYS
from ralf_tpu.core.sampling import SamplingConfig, sample
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.resnet import ImageEncoder

LOG_EPS = float(np.log(1e-30))


# --------------------------------------------------------------------------
# schedules
# --------------------------------------------------------------------------


def alpha_schedule(
    num_timesteps: int,
    N: int,
    att_1: float = 0.999,
    att_T: float = 0.0001,
    ctt_1: float = 0.0001,
    ctt_T: float = 0.9,
):
    """Mask-and-replace schedule; identical arithmetic to the reference
    (`discrete/util.py:48-79`), fp64.  Returns (at, bt, ct)[T] and
    (att, btt, ctt)[T+1] where index T is the identity row (enables the
    t-1 == -1 wraparound trick in q_posterior)."""
    T = num_timesteps
    att = np.arange(T, dtype=np.float64) / (T - 1) * (att_T - att_1) + att_1
    att = np.concatenate([[1.0], att])
    at = att[1:] / att[:-1]
    ctt = np.arange(T, dtype=np.float64) / (T - 1) * (ctt_T - ctt_1) + ctt_1
    ctt = np.concatenate([[0.0], ctt])
    one_minus_ct = (1 - ctt)[1:] / (1 - ctt)[:-1]
    ct = 1 - one_minus_ct
    bt = (1 - at - ct) / N
    att = np.concatenate([att[1:], [1.0]])
    ctt = np.concatenate([ctt[1:], [0.0]])
    btt = (1 - att - ctt) / N
    return at, bt, ct, att, btt, ctt


def _safe_log(x: np.ndarray) -> np.ndarray:
    return np.log(np.clip(x, 1e-30, None))


@dataclasses.dataclass(frozen=True)
class TransitionTables:
    """Per-position log transition tables, full-vocab formulation.

    Arrays indexed [T(+1), L]; `log_ind` is the [L, V] sub-vocabulary
    indicator (0 inside, LOG_EPS outside; mask column always outside).
    """

    log_at: jnp.ndarray  # [T, L]
    log_bt: jnp.ndarray
    log_ct: jnp.ndarray
    log_1_min_ct: jnp.ndarray
    log_cum_at: jnp.ndarray  # [T+1, L]
    log_cum_bt: jnp.ndarray
    log_cum_ct: jnp.ndarray
    log_1_min_cum_ct: jnp.ndarray
    log_ind: jnp.ndarray  # [L, V]


def build_tables(
    tokenizer: LayoutSequenceTokenizer,
    num_timesteps: int,
    q_type: str = "constrained",
    **schedule_kwargs,
) -> TransitionTables:
    L = tokenizer.max_token_length
    V = tokenizer.N_total
    mask_id = tokenizer.name_to_id("mask")
    pad_id = tokenizer.pad_id
    C = tokenizer.N_var_per_element
    var_order = list(tokenizer.var_order)

    if q_type == "default":
        groups = [("all", None)]
        pos_group = np.zeros((L,), np.int64)
    elif q_type == "constrained":
        groups = [(k, i) for i, k in enumerate(var_order)]
        pos_group = np.asarray([np.arange(L) % C]).reshape(L)
    else:
        raise ValueError(q_type)

    per_group = []
    inds = np.full((len(groups), V), LOG_EPS, np.float64)
    for gi, (key, _) in enumerate(groups):
        if q_type == "default":
            # uniform replacement over every non-mask token
            N = V - 1
            inds[gi, :] = 0.0
            inds[gi, mask_id] = LOG_EPS
        else:
            # the attribute's own tokens + pad (mat_size-1 = N_key + 1,
            # `constrained.py:33-37`)
            if key == "label":
                tok_ids = np.arange(tokenizer.N_label)
            else:
                off = tokenizer.geo_offset(key)
                tok_ids = np.arange(off, off + tokenizer.N_bbox_per_var)
            N = len(tok_ids) + 1
            inds[gi, tok_ids] = 0.0
            inds[gi, pad_id] = 0.0
        per_group.append(alpha_schedule(num_timesteps, N=N, **schedule_kwargs))

    def stack(idx: int, cumulative: bool) -> np.ndarray:
        rows = np.stack([g[idx] for g in per_group], axis=1)  # [T(+1), G]
        return rows[:, pos_group]  # [T(+1), L]

    at, bt, ct = stack(0, False), stack(1, False), stack(2, False)
    att, btt, ctt = stack(3, True), stack(4, True), stack(5, True)
    f = lambda x: jnp.asarray(_safe_log(x), jnp.float32)
    return TransitionTables(
        log_at=f(at),
        log_bt=f(bt),
        log_ct=f(ct),
        log_1_min_ct=f(1 - ct),
        log_cum_at=f(att),
        log_cum_bt=f(btt),
        log_cum_ct=f(ctt),
        log_1_min_cum_ct=f(1 - ctt),
        log_ind=jnp.asarray(inds[pos_group], jnp.float32),  # [L, V]
    )


# --------------------------------------------------------------------------
# diffusion math (log space, [B, L, V], vocab last)
# --------------------------------------------------------------------------


def log_add_exp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def index_to_log_onehot(x: jax.Array, V: int) -> jax.Array:
    return jnp.where(jax.nn.one_hot(x, V, dtype=jnp.float32) > 0, 0.0, LOG_EPS)


def log_onehot_to_index(log_x: jax.Array) -> jax.Array:
    return jnp.argmax(log_x, axis=-1)


class MaskAndReplaceDiffusion:
    """q/p math over [B, L, V] log tensors (class dim LAST for TPU lanes)."""

    def __init__(self, tokenizer: LayoutSequenceTokenizer, num_timesteps: int,
                 q_type: str = "constrained", **schedule_kwargs) -> None:
        assert "mask" in tokenizer.special_tokens
        assert tokenizer.name_to_id("mask") == tokenizer.N_total - 1
        self.tokenizer = tokenizer
        self.T = num_timesteps
        self.q_type = q_type
        self.tables = build_tables(tokenizer, num_timesteps, q_type, **schedule_kwargs)
        self.V = tokenizer.N_total
        self.L = tokenizer.max_token_length
        self.mask_id = tokenizer.N_total - 1

    # t: [B] int32 in [0, T-1]; tables gathered to [B, L, 1]
    def _g(self, table: jax.Array, t: jax.Array) -> jax.Array:
        return table[t][:, :, None]  # [B, L, 1]

    def q_pred_one_timestep(self, log_x_t: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_{t-1}); log_x_t [B, L, V]."""
        tb = self.tables
        non_mask = log_add_exp(
            log_x_t[..., :-1] + self._g(tb.log_at, t),
            self._g(tb.log_bt, t) + tb.log_ind[None, :, :-1],
        )
        mask_row = log_add_exp(
            log_x_t[..., -1:] + self._g(tb.log_1_min_ct, t), self._g(tb.log_ct, t)
        )
        return jnp.concatenate([non_mask, mask_row], axis=-1)

    def q_pred(self, log_x_start: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) with the t==-1 identity wraparound."""
        tb = self.tables
        t = (t + (self.T + 1)) % (self.T + 1)
        non_mask = log_add_exp(
            log_x_start[..., :-1] + self._g(tb.log_cum_at, t),
            self._g(tb.log_cum_bt, t) + tb.log_ind[None, :, :-1],
        )
        mask_row = log_add_exp(
            log_x_start[..., -1:] + self._g(tb.log_1_min_cum_ct, t),
            self._g(tb.log_cum_ct, t),
        )
        return jnp.concatenate([non_mask, mask_row], axis=-1)

    def q_posterior(self, log_x_start: jax.Array, log_x_t: jax.Array,
                    t: jax.Array) -> jax.Array:
        """p_theta(x_{t-1}|x_t) = sum_x0' q(x_{t-1}|x_t, x0') p(x0')
        (`discrete/default.py:98-138`)."""
        tb = self.tables
        x_t = log_onehot_to_index(log_x_t)
        is_mask = (x_t == self.mask_id)[:, :, None]  # [B, L, 1]

        log_qt = self.q_pred(log_x_t, t)[..., :-1]
        log_qt = jnp.where(is_mask, self._g(tb.log_cum_ct, t), log_qt)

        log_qt1 = self.q_pred_one_timestep(log_x_t, t)
        log_qt1 = jnp.concatenate(
            [log_qt1[..., :-1], jnp.full_like(log_qt1[..., -1:], LOG_EPS)], axis=-1
        )
        ct_row = jnp.concatenate(
            [
                jnp.broadcast_to(self._g(tb.log_ct, t), log_qt1[..., :-1].shape),
                jnp.zeros_like(log_qt1[..., -1:]),
            ],
            axis=-1,
        )
        log_qt1 = jnp.where(is_mask, ct_row, log_qt1)

        # kill out-of-subvocabulary columns of q: the reference's converter
        # literally DROPS them per attribute (`constrained.py:150-151`
        # f_to_p_log gathers only the partial-vocab columns), so they must
        # not contribute junk mass to the normalization or the bt-mixing
        # term.  A hard `where` (not adding log_ind) is required: x_start
        # and log_qt BOTH sit near LOG_EPS on dead columns, so their
        # difference is O(1) and an additive shift would leave real mass.
        # (No-op for q_type='default', whose indicator is all-true.)
        in_vocab = tb.log_ind[None, :, :-1] > 0.5 * LOG_EPS
        q = jnp.where(in_vocab, log_x_start[..., :-1] - log_qt, LOG_EPS)
        q = jnp.concatenate([q, jnp.full_like(q[..., :1], LOG_EPS)], axis=-1)
        q_norm = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
        q = q - q_norm
        out = self.q_pred(q, t - 1) + log_qt1 + q_norm
        return jnp.clip(out, -70.0, 0.0)

    def log_sample_categorical(self, key: jax.Array, logits: jax.Array) -> jax.Array:
        u = jax.random.uniform(key, logits.shape)
        gumbel = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
        idx = jnp.argmax(gumbel + logits, axis=-1)
        return index_to_log_onehot(idx, self.V)

    def q_sample(self, key: jax.Array, log_x_start: jax.Array,
                 t: jax.Array) -> jax.Array:
        return self.log_sample_categorical(key, self.q_pred(log_x_start, t))

    def predict_start(self, logits: jax.Array) -> jax.Array:
        """model logits [B, L, V] -> log p(x0|xt) with MASK excluded and
        (constrained) the sub-vocabulary indicator applied."""
        lp = jax.nn.log_softmax(logits[..., :-1].astype(jnp.float32), axis=-1)
        if self.q_type == "constrained":
            lp = lp + self.tables.log_ind[None, :, :-1]
        lp = jnp.concatenate([lp, jnp.full_like(lp[..., :1], -70.0)], axis=-1)
        return jnp.clip(lp, -70.0, 0.0)

    # ---- training loss ----------------------------------------------------

    def loss(self, key: jax.Array, model_logits_fn, x_start: jax.Array,
             t: jax.Array, pt: jax.Array,
             auxiliary_loss_weight: float = 0.1):
        """x_start [B, L] tokens; model_logits_fn(x_t, t) -> [B, L, V].

        Returns (loss, aux) with the reference decomposition
        (`discrete/base.py:309-361`): KL(q_posterior_true || model) re-
        weighted by 1/pt, decoder NLL at t==0, auxiliary x0 KL.
        """
        V = self.V
        log_x_start = index_to_log_onehot(x_start, V)
        log_x_t = self.q_sample(key, log_x_start, t)
        x_t = log_onehot_to_index(log_x_t)

        log_x0_recon = self.predict_start(model_logits_fn(x_t, t))
        log_model_prob = self.q_posterior(log_x0_recon, log_x_t, t)
        log_true_prob = self.q_posterior(log_x_start, log_x_t, t)

        kl = jnp.sum(jnp.exp(log_true_prob) * (log_true_prob - log_model_prob), -1)
        kl = jnp.mean(kl, axis=-1)  # mask_weight = [1, 1] in the reference

        decoder_nll = -jnp.sum(jnp.exp(log_x_start) * log_model_prob, -1)
        decoder_nll = jnp.mean(decoder_nll, axis=-1)

        at0 = (t == 0).astype(jnp.float32)
        kl_loss = at0 * decoder_nll + (1 - at0) * kl
        loss = jnp.mean(kl_loss / pt)
        losses = {"kl_loss": loss, "kl_per_sample": kl_loss}

        if auxiliary_loss_weight > 0:
            kl_aux = jnp.sum(
                jnp.exp(log_x_start[..., :-1])
                * (log_x_start[..., :-1] - log_x0_recon[..., :-1]),
                -1,
            )
            kl_aux = jnp.mean(kl_aux, axis=-1)
            kl_aux_loss = at0 * decoder_nll + (1 - at0) * kl_aux
            w = (1 - t / self.T) + 1.0  # adaptive
            losses["aux_loss"] = jnp.mean(
                w * auxiliary_loss_weight * kl_aux_loss / pt
            )
            loss = loss + losses["aux_loss"]
        return loss, losses

    # ---- one reverse step ---------------------------------------------------

    def sample_single_step(
        self,
        key: jax.Array,
        log_z: jax.Array,  # [B, L, V]
        model_logits_fn,
        t: jax.Array,  # [B] current timestep
        skip: jax.Array,  # scalar int32 skip_step
        sampling: SamplingConfig,
        strong_seq: Optional[jax.Array] = None,  # [B, L] tokens
        strong_mask: Optional[jax.Array] = None,  # [B, L] bool
        weak_mask: Optional[jax.Array] = None,  # [B, L, V]
        weak_logits: Optional[jax.Array] = None,  # [B, L, V]
        pad_disable_mask: Optional[jax.Array] = None,  # [B, L] bool
        relation_edges: Optional[tuple] = None,  # (edge_idx, edge_attr)
        relation_lambda: float = 1.0,
        relation_num_update: int = 3,
    ) -> jax.Array:
        x_t = log_onehot_to_index(log_z)
        log_x_recon = self.predict_start(model_logits_fn(x_t, t))
        noise_t = jnp.where(t > skip, t - skip, t)
        model_log_prob = self.q_posterior(log_x_recon, log_z, noise_t)

        if strong_seq is not None:
            strong = index_to_log_onehot(strong_seq, self.V)
            model_log_prob = jnp.where(
                strong_mask[:, :, None], strong, model_log_prob
            )
        if weak_logits is not None:
            model_log_prob = jnp.where(
                weak_mask, model_log_prob + weak_logits, model_log_prob
            )
        if relation_edges is not None:
            from ralf_tpu.ops.relation_costs import update_logits_for_relation

            model_log_prob = update_logits_for_relation(
                model_log_prob, t, relation_edges[0], relation_edges[1],
                self.tokenizer, relation_lambda, relation_num_update,
            )
        if pad_disable_mask is not None:
            pad_id = self.tokenizer.pad_id
            hit = pad_disable_mask[:, :, None] & (
                jnp.arange(self.V)[None, None, :] == pad_id
            )
            model_log_prob = jnp.where(hit, LOG_EPS, model_log_prob)

        out_idx = sample(key, model_log_prob, sampling)
        return index_to_log_onehot(out_idx, self.V)


# --------------------------------------------------------------------------
# timestep-conditioned decoder (flax)
# --------------------------------------------------------------------------


class AdaLayerNorm(nn.Module):
    """LN without affine, modulated by a sinusoidal timestep embedding
    (`diffusion/common.py:28-78`, emb_type='adalayernorm_abs')."""

    d_model: int
    max_timestep: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array) -> jax.Array:
        half = self.d_model // 2
        tt = timestep.astype(jnp.float32) / self.max_timestep * 4000.0
        freqs = jnp.exp(jnp.arange(half) * (-np.log(10000.0) / (half - 1)))
        emb = tt[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        emb = nn.Dense(2 * self.d_model, dtype=self.dtype)(
            nn.silu(emb.astype(self.dtype))
        )[:, None, :]
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        return h * (1 + scale) + shift


class DiffusionDecoderLayer(nn.Module):
    """Pre-LN decoder layer with AdaLayerNorm on the attention norms."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    max_timestep: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, timestep, deterministic: bool = True):
        from ralf_tpu.models.nn import FeedForward, MultiHeadAttention

        h = AdaLayerNorm(self.d_model, self.max_timestep, self.dtype)(x, timestep)
        x = x + MultiHeadAttention(self.d_model, self.nhead, self.dropout, self.dtype)(
            h, h, deterministic=deterministic
        )
        h = AdaLayerNorm(self.d_model, self.max_timestep, self.dtype)(x, timestep)
        x = x + MultiHeadAttention(self.d_model, self.nhead, self.dropout, self.dtype)(
            h, memory, deterministic=deterministic
        )
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, dtype=self.dtype
        )(h, deterministic)
        return x


class DiffusionDecoderCore(nn.Module):
    """Embedding + elem_attr PE + N AdaLN layers + LN/Linear head
    (`diffusion/common.py:230-300`)."""

    vocab_size: int
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    max_timestep: int = 100
    n_attr_per_elem: int = 5
    pos_emb: str = "elem_attr"  # layoutdm; vqdiffusion uses 'layout'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array, timestep: jax.Array,
                 train: bool = False) -> jax.Array:
        from ralf_tpu.models.positional import (
            ElemAttrPositionalEncoding1D,
            PositionalEncoding1D,
        )

        h = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(tgt)
        if self.pos_emb == "elem_attr":
            h = ElemAttrPositionalEncoding1D(
                self.d_model, dropout=self.dropout,
                n_attr_per_elem=self.n_attr_per_elem,
            )(h, deterministic=not train)
        else:
            h = PositionalEncoding1D(self.d_model, dropout=self.dropout)(
                h, deterministic=not train
            )
        for i in range(self.num_layers):
            h = DiffusionDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.max_timestep, self.dtype, name=f"layer_{i}",
            )(h, memory, timestep, deterministic=not train)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        return nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype)(h)


# --------------------------------------------------------------------------
# generator wrapper
# --------------------------------------------------------------------------


class LayoutDMCore(nn.Module):
    vocab_size: int
    num_timesteps: int
    pos_emb: str
    cfg: GeneratorConfig = GeneratorConfig()
    with_retrieval: bool = False  # RetrievalAugmentedLayoutDM (`layoutdm.py:91-99`)
    num_labels: int = 3
    max_seq_length: int = 10
    top_k: int = 16

    def setup(self) -> None:
        c = self.cfg
        dtype = c.dtype or jnp.float32
        self.encoder = ImageEncoder(
            backbone=c.backbone,
            d_model=c.d_model,
            nhead=c.nhead,
            num_layers=c.num_encoder_layers,
            dim_feedforward=2048 if c.d_model == 256 else 4 * c.d_model,
            dropout=c.dropout,
            fpn_style="cgl",
            dtype=dtype,
        )
        if self.with_retrieval:
            from ralf_tpu.models.retrieval_augment import RetrievalAugmentation

            self.retrieval_aug = RetrievalAugmentation(
                self.num_labels, self.max_seq_length, c.d_model, self.top_k,
                c.dropout, dtype,
            )
        self.decoder = DiffusionDecoderCore(
            vocab_size=self.vocab_size,
            d_model=c.d_model,
            nhead=c.nhead,
            num_layers=c.num_decoder_layers,
            dim_feedforward=2048 if c.d_model == 256 else 4 * c.d_model,
            dropout=c.dropout,
            max_timestep=self.num_timesteps,
            pos_emb=self.pos_emb,
            dtype=dtype,
        )

    def encode_memory(self, image: jax.Array, retrieved=None,
                      train: bool = False) -> jax.Array:
        memory = self.encoder(image, train=train)
        if self.with_retrieval:
            memory = self.retrieval_aug(memory, retrieved, train=train)
        return memory

    def __call__(self, seq, image, timestep, retrieved=None, train: bool = False):
        memory = self.encode_memory(image, retrieved, train)
        return self.decoder(seq, memory, timestep, train)


class LayoutDMGenerator:
    """LayoutDM (q_type='constrained', elem_attr PE) and VQDiffusion
    (q_type='default', 'layout' PE) behind one wrapper — mirroring how the
    reference reuses one class for both (`config/experiment/vqdiffusion.yaml`).
    """

    def __init__(
        self,
        tokenizer: LayoutSequenceTokenizer,
        cfg: GeneratorConfig = GeneratorConfig(),
        num_timesteps: int = 50,
        q_type: str = "constrained",
        pos_emb: str = "elem_attr",
        auxiliary_loss_weight: float = 0.1,
        image_hw: tuple[int, int] = (350, 240),
        with_retrieval: bool = False,
        top_k: int = 16,
        use_seq_dist: bool = False,
    ) -> None:
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.task = "uncond"
        self.image_hw = image_hw
        self.num_timesteps = num_timesteps
        self.aux_w = auxiliary_loss_weight
        self.with_retrieval = with_retrieval
        self.top_k = top_k
        self.diffusion = MaskAndReplaceDiffusion(tokenizer, num_timesteps, q_type)
        self.core = LayoutDMCore(
            vocab_size=tokenizer.N_total,
            num_timesteps=num_timesteps,
            pos_emb=pos_emb,
            cfg=cfg,
            with_retrieval=with_retrieval,
            num_labels=tokenizer.N_label,
            max_seq_length=tokenizer.max_seq_length,
            top_k=top_k,
        )
        # standalone decoder view (applied with the 'decoder' param subtree)
        c = cfg
        self.decoder_module = DiffusionDecoderCore(
            vocab_size=tokenizer.N_total,
            d_model=c.d_model,
            nhead=c.nhead,
            num_layers=c.num_decoder_layers,
            dim_feedforward=2048 if c.d_model == 256 else 4 * c.d_model,
            dropout=c.dropout,
            max_timestep=num_timesteps,
            pos_emb=pos_emb,
            dtype=c.dtype or jnp.float32,
        )
        # importance-sampling stats (`discrete/base.py:189-212,363-372`)
        self.Lt_history = np.zeros((num_timesteps,))
        self.Lt_count = np.zeros((num_timesteps,))
        # element-count EMA (core/seq_length.py, shared infra): always
        # tracked; opt-in at sampling, where it pins trailing pads through
        # the strong-constraint path (the reference lets the transition
        # matrix emit pads freely)
        from ralf_tpu.core.seq_length import SeqLengthDistribution

        self.use_seq_dist = use_seq_dist
        self.seq_dist = SeqLengthDistribution(tokenizer.max_seq_length)

    def _dummy_retrieved(self, batch_size: int):
        if not self.with_retrieval:
            return None
        S, K = self.tokenizer.max_seq_length, self.top_k
        z = jnp.zeros((batch_size, K, S), jnp.float32)
        return {"label": jnp.zeros((batch_size, K, S), jnp.int32),
                "center_x": z, "center_y": z, "width": z, "height": z,
                "mask": jnp.zeros((batch_size, K, S), bool)}

    def init(self, key: jax.Array, batch_size: int = 1):
        H, W = self.image_hw
        L = self.tokenizer.max_token_length
        return jax.jit(self.core.init)(
            key,
            jnp.zeros((batch_size, L), jnp.int32),
            jnp.zeros((batch_size, H, W, 4), jnp.float32),
            jnp.zeros((batch_size,), jnp.int32),
            self._dummy_retrieved(batch_size),
        )

    # ---- host-side conditioning -------------------------------------------

    def build_condition(self, batch, rng, task: Optional[str] = None):
        task = self.task if task is None else normalize_task(task)
        return get_condition(
            batch["layout"], batch["image"], task, self.tokenizer, rng,
            ids=batch.get("id"),
            # RA variant: neighbors from the RetrievalAugmentedLoader ride
            # on the condition (the training path reads them in preprocess;
            # sample() asserts their presence when with_retrieval)
            retrieved=batch.get("retrieved"),
            relationships=getattr(self, "relationships_table", None),
        )

    def sample_time(self, B: int, rng: np.random.Generator):
        """Importance-sampled timesteps once enough stats exist."""
        T = self.num_timesteps
        if not (self.Lt_count > 10).all():
            t = rng.integers(0, T, size=B)
            return t, np.full((B,), 1.0 / T)
        w = np.sqrt(self.Lt_history + 1e-10) + 1e-4
        w[0] = w[1]
        p = w / w.sum()
        t = rng.choice(T, size=B, p=p)
        return t, p[t]

    def update_importance(self, t: np.ndarray, kl: np.ndarray) -> None:
        for ti, ki in zip(t, kl):
            self.Lt_history[ti] = 0.9 * self.Lt_history[ti] + 0.1 * ki**2
            self.Lt_count[ti] += 1

    def preprocess(self, batch, rng: np.random.Generator):
        self.seq_dist.update(np.asarray(batch["layout"].mask))
        enc = self.tokenizer.encode(batch["layout"])
        seq = np.asarray(enc["seq"])
        B = seq.shape[0]
        t, pt = self.sample_time(B, rng)
        inputs = {
            "image": np.asarray(batch["image"]),
            "t": t.astype(np.int32),
            "pt": pt.astype(np.float32),
            "noise_seed": np.asarray(rng.integers(2**31), np.uint32),
        }
        if self.with_retrieval:
            r = batch["retrieved"]
            inputs["retrieved"] = {k: np.asarray(r[k]) for k in
                                   ("label", "center_x", "center_y", "width",
                                    "height", "mask")}
        targets = {"seq": seq}
        return inputs, targets

    def loss(self, variables, inputs, targets, *, train: bool = True,
             rngs: Optional[dict] = None):
        memory, new_state = self.core.apply(
            variables, inputs["image"], inputs.get("retrieved"), train,
            method=LayoutDMCore.encode_memory,
            rngs=rngs, mutable=["batch_stats"] if train else [],
        )

        dec_vars = {"params": variables["params"]["decoder"]}

        def logits_fn(x_t, t):
            return self.decoder_module.apply(
                dec_vars, x_t, memory, t, train, rngs=rngs
            )

        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, inputs["noise_seed"].astype(jnp.uint32))
        loss, losses = self.diffusion.loss(
            key, logits_fn, targets["seq"], inputs["t"], inputs["pt"], self.aux_w
        )
        aux = {k: v for k, v in losses.items() if k != "kl_per_sample"}
        aux["state"] = new_state
        aux["kl_per_sample"] = losses["kl_per_sample"]
        return loss, aux

    # ---- sampling -------------------------------------------------------------

    def sample(self, variables, cond: Condition, sampling: SamplingConfig,
               key: jax.Array, return_tokens: bool = False,
               num_timesteps_eval: Optional[int] = None,
               refine_lambda: float = 3.0, refine_mode: str = "uniform",
               refine_offset_ratio: float = 0.2,
               relation_lambda: float = 1.0, relation_num_update: int = 3):
        """Host prepare + one device scan.  Split into `prepare_sample`
        (host-side conditioning tensors) and `sample_prepared` (pure
        jittable program) so the mesh path (parallel/zoo) can shard the
        device program's batch without duplicating any semantics."""
        prepared, ts, skips = self.prepare_sample(
            cond, key,
            num_timesteps_eval=num_timesteps_eval,
            refine_lambda=refine_lambda, refine_mode=refine_mode,
            refine_offset_ratio=refine_offset_ratio,
        )
        seq = self.sample_prepared(
            variables, prepared, ts, skips, sampling, key,
            relation_lambda=relation_lambda,
            relation_num_update=relation_num_update,
        )
        layout = self.tokenizer.decode(seq)
        return (layout, seq) if return_tokens else layout

    def prepare_sample(self, cond: Condition, key: jax.Array,
                       num_timesteps_eval: Optional[int] = None,
                       refine_lambda: float = 3.0, refine_mode: str = "uniform",
                       refine_offset_ratio: float = 0.2):
        """Host side of sampling: the skip-step schedule plus every
        conditioning tensor the device scan consumes, as a dict of
        batch-leading arrays (absent conditioning = absent key).  The
        use_seq_dist element-count draw is host RNG derived from `key`,
        so (key, shapes) fully determine the device program's output."""
        tok = self.tokenizer
        V, L = tok.N_total, tok.max_token_length
        B = np.asarray(cond.image).shape[0]
        task = normalize_task(cond.task)
        T_eval = num_timesteps_eval or self.num_timesteps

        # skip-step schedule (`models/layoutdm.py:120-127`)
        steps = [int(i * self.num_timesteps / T_eval) for i in range(T_eval - 1, -1, -1)]
        prev = [self.num_timesteps] + steps[:-1]
        skips = np.asarray([p - s - 1 for p, s in zip(prev, steps)], np.int32)
        ts = np.asarray(steps, np.int32)

        if cond.seq is not None:
            z0 = index_to_log_onehot(jnp.asarray(cond.seq, jnp.int32), V)
            strong_seq = jnp.asarray(cond.seq, jnp.int32)
            strong_mask = jnp.asarray(cond.seq_mask, bool)
        elif self.use_seq_dist and task == "uncond":
            # element counts ~ the training EMA; positions beyond 5*n are
            # pinned to pad via the strong-constraint replacement path
            rng_host = np.random.default_rng(
                int(np.asarray(jax.random.key_data(key)).ravel()[-1])
            )
            n = self.seq_dist.sample(rng_host, B)  # [B] in [1, S]
            beyond = np.arange(L)[None, :] >= (
                n[:, None] * tok.N_var_per_element
            )
            seq_np = np.where(beyond, tok.pad_id, 0).astype(np.int32)
            strong_seq = jnp.asarray(seq_np)
            strong_mask = jnp.asarray(beyond)
            z0 = jnp.full((B, L, V), LOG_EPS).at[:, :, -1].set(0.0)
        else:
            z0 = jnp.full((B, L, V), LOG_EPS).at[:, :, -1].set(0.0)
            strong_seq = None
            strong_mask = None

        weak_mask = weak_logits = None
        if task == "refinement":
            weak_logits, weak_mask = self._refinement_weak_logits(
                cond, refine_lambda, refine_mode, refine_offset_ratio
            )

        relation_edges = None
        if task == "relation" and cond.edges is not None:
            relation_edges = (
                jnp.asarray(cond.edges["edge_indexes"]),
                jnp.asarray(cond.edges["edge_attributes"]),
            )

        pad_disable = None
        if task in ("c", "cwh", "refinement", "relation") and cond.seq is not None:
            C = tok.N_var_per_element
            attr = np.arange(L) % C
            pad_disable = jnp.asarray(
                (attr[None, :] != 0) & (cond.seq != tok.pad_id)
            )

        retrieved = None
        if self.with_retrieval:
            assert cond.retrieved is not None, "RA-LayoutDM needs retrieval"
            retrieved = {k: jnp.asarray(np.asarray(cond.retrieved[k])) for k in
                         ("label", "center_x", "center_y", "width", "height",
                          "mask")}

        prepared = {"image": jnp.asarray(cond.image), "z0": z0}
        if strong_seq is not None:
            prepared["strong_seq"] = strong_seq
            prepared["strong_mask"] = strong_mask
        if weak_logits is not None:
            prepared["weak_logits"] = weak_logits
            prepared["weak_mask"] = weak_mask
        if pad_disable is not None:
            prepared["pad_disable"] = pad_disable
        if relation_edges is not None:
            prepared["edge_indexes"] = relation_edges[0]
            prepared["edge_attributes"] = relation_edges[1]
        if retrieved is not None:
            prepared["retrieved"] = retrieved
        return prepared, ts, skips

    def sample_prepared(self, variables, prepared: dict, ts, skips,
                        sampling: SamplingConfig, key: jax.Array,
                        relation_lambda: float = 1.0,
                        relation_num_update: int = 3) -> jax.Array:
        """Pure device program: encode + the skip-step denoising scan.
        Every input is batch-leading except (variables, ts, skips, key) —
        exactly the replication/sharding split the mesh path needs."""
        B = prepared["image"].shape[0]
        z0 = prepared["z0"]
        strong_seq = prepared.get("strong_seq")
        strong_mask = prepared.get("strong_mask")
        weak_logits = prepared.get("weak_logits")
        weak_mask = prepared.get("weak_mask")
        pad_disable = prepared.get("pad_disable")
        relation_edges = None
        if "edge_indexes" in prepared:
            relation_edges = (prepared["edge_indexes"],
                              prepared["edge_attributes"])
        retrieved = prepared.get("retrieved")

        memory = self.core.apply(
            variables, prepared["image"], retrieved, False,
            method=LayoutDMCore.encode_memory,
        )
        dec_vars = {"params": variables["params"]["decoder"]}

        def logits_fn(x_t, t):
            return self.decoder_module.apply(dec_vars, x_t, memory, t)

        def step(carry, inp):
            log_z, key = carry
            t_i, skip_i = inp
            key, sub = jax.random.split(key)
            log_z = self.diffusion.sample_single_step(
                sub, log_z, logits_fn, jnp.full((B,), t_i, jnp.int32), skip_i,
                sampling, strong_seq, strong_mask, weak_mask, weak_logits,
                pad_disable, relation_edges, relation_lambda,
                relation_num_update,
            )
            return (log_z, key), None

        (log_z, _), _ = jax.lax.scan(
            step, (z0, key), (jnp.asarray(ts), jnp.asarray(skips))
        )
        return log_onehot_to_index(log_z)

    def _refinement_weak_logits(self, cond: Condition, lam: float, mode: str,
                                offset_ratio: float):
        """Smoothed-onehot geometry prior (`logit_adjustment.py:24-91`)."""
        tok = self.tokenizer
        V = tok.N_total
        table = np.zeros((V, V), np.float32)
        np.fill_diagonal(table, 1.0)
        N = tok.N_bbox_per_var
        for key in GEO_KEYS:
            off = tok.geo_offset(key)
            centers = tok.bucketizers[key].centers
            ii, jj = np.meshgrid(centers, centers, indexing="ij")
            if mode == "uniform":
                block = (np.abs(ii - jj) < offset_ratio).astype(np.float32)
            elif mode == "negative":
                block = (np.abs(ii - jj) >= offset_ratio).astype(np.float32)
            elif mode == "gaussian":
                block = -1.0 * (ii - jj) ** 2
            else:
                raise NotImplementedError(mode)
            table[off : off + N, off : off + N] = block
        w = lam * (-1.0 if mode == "negative" else 1.0)
        weak_logits = jnp.asarray(table)[jnp.asarray(cond.seq, jnp.int32)] * w
        weak_mask = jnp.broadcast_to(
            ~jnp.asarray(cond.seq_mask, bool)[:, :, None], weak_logits.shape
        )
        return weak_logits, weak_mask
