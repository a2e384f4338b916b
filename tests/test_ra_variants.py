"""Retrieval-augmented variants: RA-LayoutDM, RA-CGL-GAN end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.cgl_gan import CGLGANGenerator
from ralf_tpu.models.diffusion import LayoutDMGenerator
from ralf_tpu.retrieval.retriever import Retriever
from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

S, HW, K = 10, (64, 48), 4
TINY = GeneratorConfig(d_model=40, nhead=4, num_encoder_layers=1,
                       num_decoder_layers=1, dim_feedforward=64,
                       backbone="resnet18")


def ra_batch(B=2):
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=8,
                                seed=0, image_hw=HW)
    retriever = Retriever.build(ds)
    loader = RetrievalAugmentedLoader(BatchLoader(ds, B, shuffle=False, seed=0),
                                      retriever, top_k=K)
    return next(iter(loader))


def test_ra_layoutdm_train_and_sample():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16,
                        special_tokens=("pad", "mask"))
    )
    gen = LayoutDMGenerator(tok, TINY, num_timesteps=8, image_hw=HW,
                            with_retrieval=True, top_k=K)
    variables = gen.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = ra_batch()
    inputs, targets = gen.preprocess(batch, rng)
    loss, aux = gen.loss(variables, jax.tree.map(jnp.asarray, inputs),
                         jax.tree.map(jnp.asarray, targets), train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    # build_condition must attach the loader's neighbors itself — the CLI
    # inference path has no side channel (caught live: RA-LayoutDM sample
    # asserted on cond.retrieved=None on the real TPU)
    cond, _ = gen.build_condition(batch, rng, task="uncond")
    assert cond.retrieved is not None
    lay = gen.sample(variables, cond, SamplingConfig(name="random"),
                     jax.random.PRNGKey(2), num_timesteps_eval=3)
    assert np.asarray(lay.label).shape == (2, S)


def test_ra_cglgan_step():
    gen = CGLGANGenerator(num_labels=3, cfg=TINY, image_hw=HW,
                          with_retrieval=True, top_k=K)
    key = jax.random.PRNGKey(0)
    variables = gen.init(key)
    disc_vars = gen.init_disc(key)
    rng = np.random.default_rng(0)
    batch = ra_batch()
    inputs, targets = gen.preprocess(batch, rng)
    loss, _ = gen.loss(variables, jax.tree.map(jnp.asarray, inputs),
                       jax.tree.map(jnp.asarray, targets), train=True,
                       rngs={"dropout": key}, disc_variables=disc_vars)
    assert np.isfinite(float(loss))
    out = gen.sample(variables, batch, rng)
    assert np.asarray(out.label).shape == (2, S)
