"""Tokenizer invariants across randomized configs.

Mirrors `tests/train/helpers/test_layout_tokenizer.py` in spirit: random
configs from the CHOICES grid, random layout batches, encode/decode
roundtrip equality on valid elements.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.bucketizer import fit_kmeans_1d
from ralf_tpu.core.layout import GEO_KEYS, random_layout
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig

VAR_ORDERS = [
    ("label", "width", "height", "center_x", "center_y"),
    ("label", "center_x", "center_y", "width", "height"),
]
SPECIALS = [("pad", "bos", "eos"), ("pad",), ("pad", "mask")]
QUANT = ["linear", "kmeans"]


def make_tokenizer(var_order, specials, quant, num_bin=32, num_labels=4, S=10):
    kmeans_centers = None
    if quant == "kmeans":
        rng = np.random.default_rng(7)
        kmeans_centers = {
            k: fit_kmeans_1d(rng.uniform(0, 1, 2000), num_bin) for k in GEO_KEYS
        }
    return LayoutSequenceTokenizer(
        TokenizerConfig(
            num_labels=num_labels,
            max_seq_length=S,
            num_bin=num_bin,
            var_order=var_order,
            special_tokens=specials,
            geo_quantization=quant,
            kmeans_centers=kmeans_centers,
        )
    )


@pytest.mark.parametrize(
    "var_order,specials,quant", itertools.product(VAR_ORDERS, SPECIALS, QUANT)
)
def test_encode_decode_roundtrip(var_order, specials, quant):
    tok = make_tokenizer(var_order, specials, quant)
    rng = np.random.default_rng(0)
    layout = random_layout(rng, batch_size=16, max_elements=10, num_labels=4)

    enc = tok.encode(layout)
    T = tok.max_token_length + (1 if tok.has_bos_eos else 0)
    assert enc["seq"].shape == (16, T)
    assert enc["mask"].shape == (16, T)

    body = enc["seq"][:, 1:] if tok.has_bos_eos else enc["seq"]
    dec = tok.decode(body)

    # masks recover exactly
    assert jnp.array_equal(dec.mask, layout.mask)
    # labels recover exactly on valid elements
    assert jnp.array_equal(
        jnp.where(layout.mask, dec.label, 0), jnp.where(layout.mask, layout.label, 0)
    )
    # geometry recovers to quantization accuracy; re-encoding is idempotent
    enc2 = tok.encode(dec)
    assert jnp.array_equal(enc2["seq"], enc["seq"])
    assert jnp.array_equal(enc2["mask"], enc["mask"])


def test_eos_placement_and_bos():
    tok = make_tokenizer(VAR_ORDERS[0], ("pad", "bos", "eos"), "linear")
    rng = np.random.default_rng(1)
    layout = random_layout(rng, batch_size=8, max_elements=10, num_labels=4)
    enc = tok.encode(layout)
    seq = np.asarray(enc["seq"])
    n = np.asarray(layout.num_elements())
    assert (seq[:, 0] == tok.bos_id).all()
    for b in range(8):
        if n[b] < 10:
            assert seq[b, 1 + 5 * n[b]] == tok.eos_id
            # everything after EOS is pad
            assert (seq[b, 2 + 5 * n[b] :] == tok.pad_id).all()
        # no EOS inside the valid body
        assert (seq[b, 1 : 1 + 5 * n[b]] != tok.eos_id).all()


def test_vocab_arithmetic():
    tok = make_tokenizer(VAR_ORDERS[0], ("pad", "bos", "eos"), "linear", num_bin=128)
    assert tok.N_total == 4 + 4 * 128 + 3
    assert tok.pad_id == 4 + 512
    assert tok.bos_id == tok.pad_id + 1
    assert tok.eos_id == tok.pad_id + 2
    # geometry offsets follow GEO_KEYS order, not var_order
    assert tok.geo_offset("center_x") == 4
    assert tok.geo_offset("center_y") == 4 + 128
    assert tok.geo_offset("width") == 4 + 256
    assert tok.geo_offset("height") == 4 + 384


def test_token_mask_structure():
    tok = make_tokenizer(VAR_ORDERS[0], ("pad", "bos", "eos"), "linear", num_bin=16)
    tm = tok.token_mask
    assert tm.shape == (50, tok.N_total)
    # label positions: classes allowed, geometry not, pad/eos yes, bos no
    assert tm[0, : tok.N_label].all()
    assert not tm[0, tok.N_label : tok.N_label + tok.N_bbox].any()
    assert tm[0, tok.pad_id] and tm[0, tok.eos_id] and not tm[0, tok.bos_id]
    # width position (var_order index 1): only width bins allowed
    woff = tok.geo_offset("width")
    assert tm[1, woff : woff + 16].all()
    assert not tm[1, : tok.N_label].any()
    assert not tm[1, tok.geo_offset("center_x") : tok.geo_offset("center_x") + 16].any()
    # periodicity over elements
    assert (tm[:5] == tm[5:10]).all()


def test_decode_invalidates_oov_and_post_eos():
    tok = make_tokenizer(VAR_ORDERS[0], ("pad", "bos", "eos"), "linear", num_bin=16)
    rng = np.random.default_rng(2)
    layout = random_layout(rng, batch_size=4, max_elements=10, num_labels=4)
    enc = tok.encode(layout)
    body = np.asarray(enc["seq"][:, 1:]).copy()
    # corrupt: put a label token where width should be in element 0
    body[0, 1] = 0
    dec = tok.decode(jnp.asarray(body))
    assert not bool(dec.mask[0, 0])
    # early EOS at element-1 label slot kills all later elements
    body2 = np.asarray(enc["seq"][:, 1:]).copy()
    body2[1, 5] = tok.eos_id
    dec2 = tok.decode(jnp.asarray(body2))
    assert bool(dec2.mask[1, 0]) == bool(layout.mask[1, 0])
    assert not dec2.mask[1, 1:].any()
