"""CLG-LO relation costs: zero on satisfied graphs, positive + reducible
by gradient descent on violated ones; diffusion relation sampling runs."""

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.relationships import RelLoc, RelSize
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.diffusion import LayoutDMGenerator, index_to_log_onehot
from ralf_tpu.ops.relation_costs import (
    relation_cost,
    stochastic_convert,
    update_logits_for_relation,
)

S = 10


def edges_for(pairs):
    """pairs: list of (i, j, rel) with canvas=0 indexing."""
    E = len(pairs)
    idx = np.full((1, E, 2), -1, np.int64)
    attr = np.zeros((1, E), np.int64)
    for e, (i, j, rel) in enumerate(pairs):
        idx[0, e] = (i, j)
        attr[0, e] = (1 << int(RelSize.UNKNOWN)) | (1 << int(rel))
    return jnp.asarray(idx), jnp.asarray(attr)


def test_cost_zero_when_satisfied_positive_when_violated():
    # element 1 left-of element 2 (boxes: e1 at x=.2, e2 at x=.7, same band)
    bbox = np.zeros((1, 3, 4), np.float32)
    bbox[0, 0] = (0.5, 0.5, 1.0, 1.0)  # canvas
    bbox[0, 1] = (0.7, 0.5, 0.2, 0.2)
    bbox[0, 2] = (0.2, 0.5, 0.2, 0.2)
    idx, attr = edges_for([(1, 2, RelLoc.LEFT)])  # elem2 left of elem1
    assert float(relation_cost(jnp.asarray(bbox), idx, attr)) == 0.0

    bbox2 = bbox.copy()
    bbox2[0, 2, 0] = 0.9  # now elem2 is right of elem1 -> violated
    # (cost is averaged over the 14 CLG-LO terms, matching the reference)
    assert float(relation_cost(jnp.asarray(bbox2), idx, attr)) > 0.1 / 14

    # canvas TOP on element 1
    idx, attr = edges_for([(0, 1, RelLoc.TOP)])
    assert float(relation_cost(jnp.asarray(bbox), idx, attr)) > 0.0  # cy=0.5
    bbox3 = bbox.copy()
    bbox3[0, 1, 1] = 0.2
    assert float(relation_cost(jnp.asarray(bbox3), idx, attr)) == 0.0


def test_logit_update_reduces_cost():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16,
                        special_tokens=("pad", "mask"))
    )
    rng = np.random.default_rng(0)
    layout = random_layout(rng, 1, S, 3)
    seq = jnp.asarray(np.asarray(tok.encode(layout)["seq"]))
    log_prob = index_to_log_onehot(seq, tok.N_total) * 0.01  # soft-ish

    idx, attr = edges_for([(1, 2, RelSize.LARGER), (0, 1, RelLoc.BOTTOM)])

    def cost(lp):
        from ralf_tpu.core.layout import GEO_KEYS

        coords = stochastic_convert(lp, tok)
        bbox = jnp.stack([coords[k] for k in GEO_KEYS], -1)
        canvas = jnp.tile(jnp.asarray([0.5, 0.5, 1.0, 1.0])[None, None], (1, 1, 1))
        return relation_cost(jnp.concatenate([canvas, bbox], 1), idx, attr)

    before = float(cost(log_prob))
    updated = update_logits_for_relation(
        log_prob, jnp.asarray([20]), idx, attr, tok,
        relation_lambda=5.0, num_update=5,
    )
    after = float(cost(updated))
    assert after <= before
    # gated off for t < 10
    frozen = update_logits_for_relation(
        log_prob, jnp.asarray([3]), idx, attr, tok,
        relation_lambda=5.0, num_update=5,
    )
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(log_prob))


def test_diffusion_relation_sampling_runs():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16,
                        special_tokens=("pad", "mask"))
    )
    gen = LayoutDMGenerator(
        tok, GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                             num_decoder_layers=1, dim_feedforward=64,
                             backbone="resnet18"),
        num_timesteps=16, image_hw=(64, 48),
    )
    variables = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = {"layout": random_layout(rng, 2, S, 3),
             "image": np.zeros((2, 64, 48, 4), np.float32)}
    cond, _ = gen.build_condition(batch, rng, task="relation")
    assert cond.edges is not None
    lay, seq = gen.sample(variables, cond, SamplingConfig(name="random"),
                          jax.random.PRNGKey(2), return_tokens=True,
                          num_timesteps_eval=4)
    seq = np.asarray(seq)
    # label slots (known in relation task) stay forced via strong replacement
    known = cond.seq_mask & (cond.seq != tok.name_to_id("mask"))
    np.testing.assert_array_equal(seq[known], cond.seq[known])
