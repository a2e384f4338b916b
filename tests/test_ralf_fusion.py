"""RALF fusion-ablation modes build, train-step and produce the right
memory widths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.ralf import RALFCore, RALFGenerator
from ralf_tpu.retrieval.retriever import Retriever
from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

S, HW, K = 10, (64, 48), 4
TINY = GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                       num_decoder_layers=1, dim_feedforward=64,
                       backbone="resnet18")
M = 12  # 4x3 feature map at 64x48


@pytest.mark.parametrize("fusion,extra", [
    ("concat_crossattn", 2 * M + K),
    ("crossattn", 2 * M),
    ("concat", M + K),
    ("adapter", M + K),
    # completes the reference's 9-class ablation matrix
    # (`retrieval_augmented_autoreg.py:1039-1294`)
    ("flag_concat_crossattn", 2 * M + K),
    ("pre_encoder", 2 * M + K),
    ("post_encoder", M + K),
])
def test_fusion_modes(fusion, extra):
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = RALFGenerator(tok, TINY, "uncond", image_hw=HW, top_k=K, fusion=fusion)
    variables = gen.init(jax.random.PRNGKey(0))

    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=8, seed=0,
                                image_hw=HW)
    loader = RetrievalAugmentedLoader(BatchLoader(ds, 2, shuffle=False, seed=0),
                                      Retriever.build(ds), top_k=K)
    batch = next(iter(loader))
    rng = np.random.default_rng(0)
    cond, _ = gen.build_condition(batch, rng)
    memory = gen.encode_memory(variables, cond)
    Lc = gen.vocab.const_len("uncond")
    assert memory.shape == (2, extra + Lc, 32)

    inputs, targets = gen.preprocess(batch, rng)
    loss, _ = gen.loss(variables, jax.tree.map(jnp.asarray, inputs),
                       jax.tree.map(jnp.asarray, targets), train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))


def test_precomputed_feats_match_fidnet_path():
    """Gallery feature table (precompute_retrieved_feats) must reproduce the
    in-model frozen FIDNet forward bit-for-bit: the tower is frozen and the
    gallery fixed, so batch['retrieved']['feats'] is a pure cache."""
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = RALFGenerator(tok, TINY, "uncond", image_hw=HW, top_k=K)
    variables = gen.init(jax.random.PRNGKey(0))

    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=8, seed=0,
                                image_hw=HW)
    retriever = Retriever.build(ds)
    feats = gen.precompute_retrieved_feats(variables, retriever.layouts, chunk=3)
    assert feats.shape == (8, 256)

    loader = RetrievalAugmentedLoader(BatchLoader(ds, 2, shuffle=False, seed=0),
                                      retriever, top_k=K)
    batch = next(iter(loader))
    rng = np.random.default_rng(0)
    cond, _ = gen.build_condition(batch, rng)
    mem_layout = gen.encode_memory(variables, cond)

    batch["retrieved"]["feats"] = feats[batch["retrieved_indices"]]
    cond2, _ = gen.build_condition(batch, np.random.default_rng(0))
    assert cond2.retrieved.get("feats") is not None
    mem_feats = gen.encode_memory(variables, cond2)
    # not bitwise: the table is built at chunk-size batch, the in-model path
    # at B*K — XLA tiles the matmuls differently per shape (f32 noise only)
    np.testing.assert_allclose(np.asarray(mem_feats), np.asarray(mem_layout),
                               rtol=0, atol=1e-5)


def test_dynamic_topk_at_inference():
    """The paper's dynamic top-k sweep: a checkpoint trained with K=4
    neighbors must sample with a different K at inference (sinusoidal 1D
    PE over K; fusion width follows the retrieved arrays' shape).
    Reference: `inference.py:331-339` dynamictopk arms."""
    from ralf_tpu.core.sampling import SamplingConfig

    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = RALFGenerator(tok, TINY, "uncond", image_hw=HW, top_k=K)
    variables = gen.init(jax.random.PRNGKey(0))
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=8, seed=0,
                                image_hw=HW)
    retriever = Retriever.build(ds)
    for k_inf in (2, 6):  # below and above the train-time K
        loader = RetrievalAugmentedLoader(
            BatchLoader(ds, 2, shuffle=False, seed=0), retriever, top_k=k_inf
        )
        batch = next(iter(loader))
        assert batch["retrieved"]["label"].shape[1] == k_inf
        cond, _ = gen.build_condition(batch, np.random.default_rng(0))
        layout = gen.sample(variables, cond, SamplingConfig(name="deterministic"),
                            jax.random.PRNGKey(0))
        assert np.asarray(layout.label).shape == (2, S)
