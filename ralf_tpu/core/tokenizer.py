"""Layout <-> token-sequence codec.

Flattens a layout into the sequence ``(label_1, v1_1, .., v4_1, label_2, ...)``
following a configurable ``var_order``, with geometry bucketized to
``num_bin`` bins and (by default) a per-attribute ("unshared") location
vocabulary.  Vocabulary layout::

    [0, N_label)                          element classes
    [N_label, N_label + 4*num_bin)        geometry bins, offset by the
                                          GEO_KEYS index of the attribute
    [N_label + N_bbox, N_total)           special tokens (pad, bos, eos[, mask])

Functional parity with the reference tokenizer
(`image2layout/train/helpers/layout_tokenizer.py:91-446`), redesigned for
XLA: every shape is static (sequences are always padded to
``max_seq_length`` elements), encode/decode are pure jnp functions that
jit/vmap cleanly, and the per-position validity table ``token_mask`` is a
precomputed numpy constant baked into compiled programs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.bucketizer import (
    Bucketizer,
    kmeans_bucketizer,
    linear_bucketizer,
)
from ralf_tpu.core.layout import GEO_KEYS, Layout

SPECIAL_TOKENS = ("pad", "bos", "eos", "mask")

DEFAULT_VAR_ORDER = ("label", "width", "height", "center_x", "center_y")


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    """Static tokenizer configuration.

    Defaults follow `image2layout/train/config/tokenizer.py:1-19`:
    num_bin=128, var_order=(label,width,height,center_x,center_y),
    special_tokens=(pad,bos,eos), linear quantization, unshared loc vocab.
    """

    num_labels: int = 3
    max_seq_length: int = 10
    num_bin: int = 128
    var_order: Sequence[str] = DEFAULT_VAR_ORDER
    special_tokens: Sequence[str] = ("pad", "bos", "eos")
    is_loc_vocab_shared: bool = False
    geo_quantization: str = "linear"  # "linear" | "kmeans"
    # sorted kmeans centers per geo key, required iff geo_quantization=="kmeans"
    kmeans_centers: Optional[dict] = None

    def __post_init__(self) -> None:
        assert "pad" in self.special_tokens
        assert all(t in SPECIAL_TOKENS for t in self.special_tokens)
        if "mask" in self.special_tokens:
            assert self.special_tokens[-1] == "mask"
        assert set(self.var_order) == {"label", *GEO_KEYS}
        assert self.geo_quantization in ("linear", "kmeans")
        if self.geo_quantization == "kmeans":
            assert self.kmeans_centers is not None


class LayoutSequenceTokenizer:
    """Static-shape layout tokenizer (see module docstring)."""

    def __init__(self, config: TokenizerConfig) -> None:
        self.config = config
        self._bucketizers: dict[str, Bucketizer] = {}
        for key in GEO_KEYS:
            if config.geo_quantization == "linear":
                self._bucketizers[key] = linear_bucketizer(config.num_bin)
            else:
                self._bucketizers[key] = kmeans_bucketizer(
                    np.asarray(config.kmeans_centers[key])
                )

    # ---- vocabulary arithmetic -------------------------------------------

    @property
    def N_label(self) -> int:
        return self.config.num_labels

    @property
    def N_bbox_per_var(self) -> int:
        return self.config.num_bin

    @property
    def N_bbox(self) -> int:
        if self.config.is_loc_vocab_shared:
            return self.N_bbox_per_var
        return self.N_bbox_per_var * 4

    @property
    def N_sp_token(self) -> int:
        return len(self.config.special_tokens)

    @property
    def N_total(self) -> int:
        return self.N_label + self.N_bbox + self.N_sp_token

    @property
    def N_var_per_element(self) -> int:
        return len(self.config.var_order)

    @property
    def max_seq_length(self) -> int:
        return self.config.max_seq_length

    @property
    def max_token_length(self) -> int:
        """Number of generated tokens (excluding BOS): 5 * S."""
        return self.max_seq_length * self.N_var_per_element

    @property
    def var_order(self) -> Sequence[str]:
        return self.config.var_order

    @property
    def special_tokens(self) -> Sequence[str]:
        return self.config.special_tokens

    @property
    def bucketizers(self) -> dict[str, Bucketizer]:
        return self._bucketizers

    def name_to_id(self, name: str) -> int:
        return self.N_label + self.N_bbox + list(self.config.special_tokens).index(name)

    def id_to_name(self, id_: int) -> str:
        return list(self.config.special_tokens)[id_ - self.N_label - self.N_bbox]

    @property
    def pad_id(self) -> int:
        return self.name_to_id("pad")

    @property
    def bos_id(self) -> int:
        return self.name_to_id("bos")

    @property
    def eos_id(self) -> int:
        return self.name_to_id("eos")

    @property
    def has_bos_eos(self) -> bool:
        st = self.config.special_tokens
        return "bos" in st and "eos" in st

    def geo_offset(self, key: str) -> int:
        """Vocabulary offset of a geometry attribute's first bin."""
        if self.config.is_loc_vocab_shared:
            return self.N_label
        return self.N_label + GEO_KEYS.index(key) * self.N_bbox_per_var

    # ---- encode / decode -------------------------------------------------

    def encode(self, layout: Layout) -> dict[str, jax.Array]:
        """Layout [B, S] -> {'seq': int32 [B, T], 'mask': bool [B, T]}.

        T = 5*S + 1 when BOS/EOS are in the vocabulary (AR models), else
        5*S.  EOS is written into the first padded token slot (if any);
        remaining slots hold ``pad``.  Mirrors
        `layout_tokenizer.py:302-360` with static shapes.
        """
        cfg = self.config
        S = cfg.max_seq_length
        C = self.N_var_per_element
        assert layout.label.shape[1] == S, (layout.label.shape, S)

        elem_mask = layout.mask
        cols = {}
        cols["label"] = jnp.where(elem_mask, layout.label, self.pad_id)
        for key in GEO_KEYS:
            tok = self._bucketizers[key].encode(layout.geo(key)) + self.geo_offset(key)
            cols[key] = jnp.where(elem_mask, tok, self.pad_id)

        seq = jnp.stack([cols[k] for k in cfg.var_order], axis=-1)  # [B,S,C]
        seq = seq.reshape(seq.shape[0], S * C)
        mask = jnp.repeat(elem_mask, C, axis=-1)  # [B, S*C]

        if self.has_bos_eos:
            B = seq.shape[0]
            n_tokens = jnp.sum(elem_mask.astype(jnp.int32), axis=-1) * C  # [B]
            pos = jnp.arange(S * C)[None, :]
            eos_here = pos == n_tokens[:, None]  # empty when layout is full
            seq = jnp.where(eos_here, self.eos_id, seq)
            mask = jnp.where(eos_here, True, mask)
            bos = jnp.full((B, 1), self.bos_id, seq.dtype)
            seq = jnp.concatenate([bos, seq], axis=-1)
            mask = jnp.concatenate([jnp.ones((B, 1), bool), mask], axis=-1)

        return {"seq": seq.astype(jnp.int32), "mask": mask}

    def decode(self, seq: jax.Array) -> Layout:
        """int [B, 5*S] token sequence (no BOS) -> Layout [B, S].

        Elements at/after the first EOS, or containing any out-of-range
        token, are invalidated (reference `layout_tokenizer.py:362-402`).
        """
        cfg = self.config
        S, C = cfg.max_seq_length, self.N_var_per_element
        seq = seq.reshape(seq.shape[0], S, C)

        vals = {}
        for i, key in enumerate(cfg.var_order):
            v = seq[..., i]
            if key != "label":
                v = v - self.geo_offset(key)
            vals[key] = v

        # out-of-vocabulary detection, element level
        valid = (vals["label"] >= 0) & (vals["label"] < self.N_label)
        for key in GEO_KEYS:
            bound = self.N_bbox if cfg.is_loc_vocab_shared else self.N_bbox_per_var
            valid &= (vals[key] >= 0) & (vals[key] < bound)

        # everything from the first EOS on is invalid
        if self.has_bos_eos:
            label_tok = seq[..., cfg.var_order.index("label")]
            after_eos = jnp.cumsum((label_tok == self.eos_id).astype(jnp.int32), axis=1) > 0
            valid &= ~after_eos

        geo = {}
        for key in GEO_KEYS:
            idx = jnp.where(valid, vals[key], 0)
            geo[key] = jnp.where(valid, self._bucketizers[key].decode(idx), 0.0)

        return Layout(
            label=jnp.where(valid, vals["label"], 0).astype(jnp.int32),
            center_x=geo["center_x"],
            center_y=geo["center_y"],
            width=geo["width"],
            height=geo["height"],
            mask=valid,
        )

    # ---- static validity table ------------------------------------------

    @property
    def token_mask(self) -> np.ndarray:
        """bool [5*S, N_total]: which vocab entries are legal per position.

        BOS and MASK are never legal predictions; geometry positions only
        admit their own attribute's bins (+ legal specials); label
        positions admit classes (+ legal specials).  Mirrors
        `layout_tokenizer.py:404-446`.
        """
        cfg = self.config
        sp_ok = np.array(
            [t not in ("bos", "mask") for t in cfg.special_tokens], bool
        )

        per_var = {}
        label_row = np.concatenate(
            [np.ones(self.N_label, bool), np.zeros(self.N_bbox, bool), sp_ok]
        )
        per_var["label"] = label_row
        for key in GEO_KEYS:
            geo = np.zeros(self.N_bbox, bool)
            if cfg.is_loc_vocab_shared:
                geo[:] = True
            else:
                off = GEO_KEYS.index(key) * self.N_bbox_per_var
                geo[off : off + self.N_bbox_per_var] = True
            per_var[key] = np.concatenate(
                [np.zeros(self.N_label, bool), geo, sp_ok]
            )

        rows = np.stack([per_var[k] for k in cfg.var_order], axis=0)  # [C, V]
        return np.tile(rows, (cfg.max_seq_length, 1))  # [S*C, V]
