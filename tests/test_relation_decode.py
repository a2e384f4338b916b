"""Relation-constrained backtracking decode: constraint tensors, jnp
detectors, and end-to-end violation reduction vs unconstrained decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.relationships import RelLoc, RelSize
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.eval.violations import calculate_relation_violation, calculate_violation
from ralf_tpu.models.autoreg import AutoregGenerator
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.ops.relation_decode import (
    build_relation_tensors,
    count_violations,
)

S, HW = 10, (64, 48)


def test_count_violations_detectors():
    # two elements: 0 is left of 1 and smaller
    geo = {
        "cx": jnp.asarray([[0.2, 0.7] + [0.0] * 8]),
        "cy": jnp.asarray([[0.5, 0.5] + [0.0] * 8]),
        "w": jnp.asarray([[0.2, 0.4] + [0.0] * 8]),
        "h": jnp.asarray([[0.2, 0.4] + [0.0] * 8]),
    }

    class FakeCond:
        sampled_relations = [[(0, "A", RelLoc.RIGHT, 0, "B"),  # B right of A: True
                              (0, "A", RelSize.LARGER, 0, "B"),  # B larger: True
                              (0, "A", RelLoc.TOP, "canvas", "pad")]]  # cy<1/3? False
        image = np.zeros((1, 4, 4, 4))

    t = build_relation_tensors(FakeCond(), S)
    # all three clauses anchor at element 1 except the canvas one (elem 0)
    assert int(t["valid"][0, 1].sum()) == 2
    assert int(t["valid"][0, 0].sum()) == 1
    v1 = count_violations(geo, jnp.asarray([1]), t)
    assert int(v1[0]) == 0  # both pairwise clauses satisfied
    v0 = count_violations(geo, jnp.asarray([0]), t)
    assert int(v0[0]) == 1  # canvas TOP violated (cy=0.5 -> CENTER)


@pytest.fixture(scope="module")
def setup():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = AutoregGenerator(
        tok,
        GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=64,
                        backbone="resnet18"),
        auxiliary_task="relation", image_hw=HW,
    )
    variables = gen.init(jax.random.PRNGKey(0))
    return tok, gen, variables


def test_relation_decode_reduces_violations(setup):
    tok, gen, variables = setup
    rng = np.random.default_rng(0)
    batch = {"layout": random_layout(rng, 4, S, 3),
             "image": np.zeros((4, *HW, 4), np.float32)}
    cond, _ = gen.build_condition(batch, rng, task="relation")
    assert cond.sampled_relations is not None
    scfg = SamplingConfig(name="random")

    lay_bt, seq_bt = gen.sample(variables, cond, scfg, jax.random.PRNGKey(1),
                                return_tokens=True, use_backtrack=True,
                                max_retries=12)
    lay_plain, seq_plain = gen.sample(variables, cond, scfg,
                                      jax.random.PRNGKey(1),
                                      return_tokens=True, use_backtrack=False)

    v_bt = calculate_relation_violation(cond, lay_bt)
    v_plain = calculate_relation_violation(cond, lay_plain)
    # the retry pressure must clearly beat unconstrained decoding (an
    # untrained proposal distribution is the worst case; a trained model
    # satisfies most clauses in 1-2 attempts)
    assert v_bt["viorated"] < v_plain["viorated"], (v_bt, v_plain)
    # retries also suppress OOV-geometry holes: more valid elements
    assert np.asarray(lay_bt.mask).sum() >= np.asarray(lay_plain.mask).sum()
    known = cond.seq_mask[:, 1:] & (cond.seq[:, 1:] != tok.pad_id) & (cond.seq[:, 1:] != -1)
    label_slots = (np.arange(tok.max_token_length) % 5 == 0)[None, :]
    k = known & label_slots
    assert (np.asarray(seq_bt)[k] == cond.seq[:, 1:][k]).all()


def test_relation_decode_self_quant_structure(setup):
    # int8 per-token self caches must flow through the backtracker's cache
    # snapshot/select machinery (jax.tree.map over int8 + f32-scale leaves)
    tok, gen, variables = setup
    rng = np.random.default_rng(0)
    batch = {"layout": random_layout(rng, 2, S, 3),
             "image": np.zeros((2, *HW, 4), np.float32)}
    cond, _ = gen.build_condition(batch, rng, task="relation")
    scfg = SamplingConfig(name="random")
    lay, seq = gen.sample(variables, cond, scfg, jax.random.PRNGKey(1),
                          return_tokens=True, use_backtrack=True,
                          max_retries=2, self_quant=True)
    assert np.asarray(seq).shape == (2, tok.max_token_length)
    # forced label slots still reproduced exactly under quantized caches
    known = cond.seq_mask[:, 1:] & (cond.seq[:, 1:] != tok.pad_id) & (cond.seq[:, 1:] != -1)
    label_slots = (np.arange(tok.max_token_length) % 5 == 0)[None, :]
    k = known & label_slots
    assert (np.asarray(seq)[k] == cond.seq[:, 1:][k]).all()
