"""MaskGIT: random-mask training loss + T-step parallel decode invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.mask import batch_topk_mask, mask_schedule, sample_mask
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.maskgit import MaskGITGenerator

S, HW = 10, (64, 48)


@pytest.fixture(scope="module")
def setup():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(
            num_labels=3, max_seq_length=S, num_bin=16,
            special_tokens=("pad", "mask"),
        )
    )
    gen = MaskGITGenerator(
        tok,
        GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=64,
                        backbone="resnet18"),
        num_timesteps=4,
        image_hw=HW,
    )
    variables = gen.init(jax.random.PRNGKey(0))
    return tok, gen, variables


def make_batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "layout": random_layout(rng, B, S, 3),
        "image": np.zeros((B, *HW, 4), np.float32),
    }, rng


def test_mask_helpers():
    key = jax.random.PRNGKey(0)
    m = jnp.ones((3, 8), bool)
    picked = sample_mask(key, m, jnp.asarray([0.5, 0.25, 1.0]))
    assert picked.shape == (3, 8)
    assert int(picked[2].sum()) == 8
    # all-False mask quirk: topk mask returns all True (-inf >= -inf)
    quirk, _ = batch_topk_mask(jnp.zeros((1, 4)), jnp.asarray([2]),
                               mask=jnp.zeros((1, 4), bool))
    assert bool(quirk.all())
    r = mask_schedule(jnp.asarray([0.0, 0.5, 1.0]), "cosine")
    assert float(r[0]) == 1.0 and float(r[2]) == pytest.approx(1e-6)


def test_train_loss(setup):
    tok, gen, variables = setup
    batch, rng = make_batch()
    inputs, targets = gen.preprocess(batch, rng)
    assert (np.asarray(inputs["seq"]) == gen.mask_id).any()
    loss, aux = gen.loss(
        variables,
        {k: jnp.asarray(v) for k, v in inputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
        train=True, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(loss))
    # seq-length EMA moved away from uniform
    assert not np.allclose(gen.seq_dist.n_elements_prob, 1.0 / S)


def test_sample_uncond_no_mask_tokens_left(setup):
    tok, gen, variables = setup
    batch, rng = make_batch(seed=1)
    cond, _ = gen.build_condition(batch, rng, task="uncond")
    layout, seq = gen.sample(
        variables, cond, SamplingConfig(name="random"), jax.random.PRNGKey(2),
        return_tokens=True,
    )
    seq = np.asarray(seq)
    assert seq.shape == (4, tok.max_token_length)
    assert not (seq == gen.mask_id).any()


def test_sample_c_respects_condition(setup):
    tok, gen, variables = setup
    batch, rng = make_batch(seed=2)
    cond, _ = gen.build_condition(batch, rng, task="c")
    layout, seq = gen.sample(
        variables, cond, SamplingConfig(name="random"), jax.random.PRNGKey(3),
        return_tokens=True,
    )
    seq = np.asarray(seq)
    known = cond.seq_mask
    np.testing.assert_array_equal(seq[known], cond.seq[known])
    # element-count-known: no PAD predicted at element positions
    element_pos = cond.seq != tok.pad_id
    assert not (seq[element_pos] == tok.pad_id).any()
    assert not (seq == gen.mask_id).any()
