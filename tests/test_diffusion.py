"""Discrete diffusion: schedule identities, q-process math, end-to-end
loss + sampling for both q_types."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.diffusion import (
    LayoutDMGenerator,
    MaskAndReplaceDiffusion,
    alpha_schedule,
    index_to_log_onehot,
    log_onehot_to_index,
)

S, HW, T = 10, (64, 48), 8


def make_tok():
    return LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16,
                        special_tokens=("pad", "mask"))
    )


def test_alpha_schedule_identities():
    at, bt, ct, att, btt, ctt = alpha_schedule(10, N=100)
    # rows are proper distributions: at + N*bt + ct = 1
    np.testing.assert_allclose(at + 100 * bt + ct, 1.0, atol=1e-9)
    np.testing.assert_allclose(att + 100 * btt + ctt, 1.0, atol=1e-9)
    # final cumulative row is the identity (wraparound trick)
    assert att[-1] == 1.0 and ctt[-1] == 0.0
    # cumulative consistency: att[t] = prod(at[:t+1])
    np.testing.assert_allclose(np.cumprod(at), att[:-1], rtol=1e-8)


@pytest.mark.parametrize("q_type", ["default", "constrained"])
def test_q_pred_rows_normalize(q_type):
    tok = make_tok()
    diff = MaskAndReplaceDiffusion(tok, T, q_type)
    rng = np.random.default_rng(0)
    layout = random_layout(rng, 2, S, 3)
    x0 = jnp.asarray(np.asarray(tok.encode(layout)["seq"]))
    log_x0 = index_to_log_onehot(x0, tok.N_total)
    for t in [0, T // 2, T - 1]:
        tt = jnp.full((2,), t, jnp.int32)
        lp = diff.q_pred(log_x0, tt)
        total = jnp.exp(jax.scipy.special.logsumexp(lp, axis=-1))
        np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-4)
    # q_pred at t == -1 is the identity
    lp = diff.q_pred(log_x0, jnp.full((2,), -1, jnp.int32))
    assert (log_onehot_to_index(lp) == x0).all()


def test_constrained_keeps_subvocab():
    tok = make_tok()
    diff = MaskAndReplaceDiffusion(tok, T, "constrained")
    rng = np.random.default_rng(1)
    layout = random_layout(rng, 4, S, 3)
    x0 = jnp.asarray(np.asarray(tok.encode(layout)["seq"]))
    log_x0 = index_to_log_onehot(x0, tok.N_total)
    key = jax.random.PRNGKey(0)
    xt = log_onehot_to_index(diff.q_sample(key, log_x0, jnp.full((4,), T - 1, jnp.int32)))
    xt = np.asarray(xt)
    # a corrupted label slot only ever holds label / pad / mask tokens
    lab = xt[:, 0::5].reshape(-1)
    ok = (lab < tok.N_label) | (lab == tok.pad_id) | (lab == tok.N_total - 1)
    assert ok.all()
    # a corrupted width slot only holds width bins / pad / mask
    w = xt[:, 1::5].reshape(-1)
    woff = tok.geo_offset("width")
    ok = ((w >= woff) & (w < woff + 16)) | (w == tok.pad_id) | (w == tok.N_total - 1)
    assert ok.all()


def test_posterior_at_t0_recovers_x0():
    tok = make_tok()
    diff = MaskAndReplaceDiffusion(tok, T, "constrained")
    rng = np.random.default_rng(2)
    layout = random_layout(rng, 2, S, 3)
    x0 = jnp.asarray(np.asarray(tok.encode(layout)["seq"]))
    log_x0 = index_to_log_onehot(x0, tok.N_total)
    key = jax.random.PRNGKey(1)
    t = jnp.zeros((2,), jnp.int32)
    log_xt = diff.q_sample(key, log_x0, t)
    post = diff.q_posterior(log_x0, log_xt, t)
    # with the true x0 plugged in at t=0, argmax must reproduce x0
    assert (log_onehot_to_index(post) == x0).mean() > 0.95


@pytest.mark.parametrize("q_type,pos_emb", [("constrained", "elem_attr"), ("default", "layout")])
def test_generator_end_to_end(q_type, pos_emb):
    tok = make_tok()
    gen = LayoutDMGenerator(
        tok,
        GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=64,
                        backbone="resnet18"),
        num_timesteps=T, q_type=q_type, pos_emb=pos_emb, image_hw=HW,
    )
    variables = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"layout": random_layout(rng, 2, S, 3),
             "image": np.zeros((2, *HW, 4), np.float32)}
    inputs, targets = gen.preprocess(batch, rng)
    loss, aux = gen.loss(
        variables,
        jax.tree.map(jnp.asarray, inputs),
        jax.tree.map(jnp.asarray, targets),
        train=True, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(loss))
    gen.update_importance(inputs["t"], np.asarray(aux["kl_per_sample"]))
    assert gen.Lt_count.sum() > 0

    # uncond + c sampling
    for task in ("uncond", "c", "refinement"):
        cond, _ = gen.build_condition(batch, rng, task=task)
        layout, seq = gen.sample(
            variables, cond, SamplingConfig(name="random"),
            jax.random.PRNGKey(2), return_tokens=True, num_timesteps_eval=4,
        )
        seq = np.asarray(seq)
        assert seq.shape == (2, tok.max_token_length)
        assert not (seq == tok.N_total - 1).any()  # no MASK left
        if task == "c":
            known = cond.seq_mask
            np.testing.assert_array_equal(seq[known], cond.seq[known])
