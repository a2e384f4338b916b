"""Mesh-sharded inference for the WHOLE zoo (VERDICT r3 item #1).

Extends test_mesh_decode.py's two pinned properties — shard-invariance
(same key + same padded batch => bit-identical outputs on a 1- and an
8-device mesh) and program cleanliness (no collectives, no host syncs in
the compiled HLO) — from the AR family to every other family the
reference serves through its ms-per-sample inference contract
(`image2layout/train/inference.py:371,441-443,495`): the relation retry
decoder, MaskGIT, LayoutDM/VQDiffusion, CGL-GAN/DS-GAN, ICVT, and the
retriever top-1 baseline.  Where batch == shard-multiple, the mesh result
must also equal the plain single-chip `gen.sample` bit-for-bit — same
program, different partitioning.
"""

import jax
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.parallel.decode import make_decode_mesh
from ralf_tpu.parallel.zoo import build_mesh_sampler

HW = (64, 48)
S = 10
TINY = GeneratorConfig(
    d_model=32, nhead=4, num_encoder_layers=1, num_decoder_layers=1,
    dim_feedforward=64, backbone="resnet18",
)


def _tok(special=None):
    kw = {} if special is None else {"special_tokens": special}
    return LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16, **kw)
    )


def _batch(B=8, seed=0):
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=B,
                                seed=seed, image_hw=HW)
    return next(iter(BatchLoader(ds, B, shuffle=False, seed=0)))


def _meshes():
    return make_decode_mesh(jax.devices()), make_decode_mesh(jax.devices()[:1])


# ---- AR relation (backtracking retry decode) ------------------------------


def test_relation_mesh_matches_single_chip():
    from ralf_tpu.models.autoreg import AutoregGenerator

    tok = _tok()
    gen = AutoregGenerator(tok, TINY, "relation", image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    cond, _ = gen.build_condition(_batch(8), np.random.default_rng(0),
                                  task="relation")
    sampling = SamplingConfig(name="top_p", top_p=0.9)
    key = jax.random.PRNGKey(11)
    mesh8, mesh1 = _meshes()

    ms8 = build_mesh_sampler(gen, mesh8, sampling, task="relation",
                             max_retries=2)
    ms1 = build_mesh_sampler(gen, mesh1, sampling, task="relation",
                             max_retries=2)
    assert type(ms8).__name__ == "RelationMeshSampler"
    toks8 = ms8.sample_tokens(variables, cond, key)
    toks1 = ms1.sample_tokens(variables, cond, key)
    np.testing.assert_array_equal(toks8, toks1)

    # same padded shape (8 rows == 8 shards) => must equal the plain
    # single-chip relation sample too
    _, toks_ref = gen.sample(variables, cond, sampling, key,
                             return_tokens=True, use_backtrack=True,
                             max_retries=2)
    np.testing.assert_array_equal(toks8, np.asarray(toks_ref))
    ms8.compile_and_verify(variables, cond, key)


# ---- MaskGIT ---------------------------------------------------------------


@pytest.mark.parametrize("task", ["uncond", "c"])
def test_maskgit_mesh_matches_single_chip(task):
    from ralf_tpu.models.maskgit import MaskGITGenerator

    tok = _tok(special=("pad", "mask"))
    gen = MaskGITGenerator(tok, TINY, num_timesteps=4, image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    batch = {"layout": random_layout(np.random.default_rng(0), 8, S, 3),
             "image": _batch(8)["image"]}
    cond, _ = gen.build_condition(batch, np.random.default_rng(0), task=task)
    sampling = SamplingConfig(name="top_p", top_p=0.9)
    key = jax.random.PRNGKey(5)
    mesh8, mesh1 = _meshes()

    ms8 = build_mesh_sampler(gen, mesh8, sampling, task=task)
    toks8 = np.asarray(ms8.sample(variables, cond, key, return_tokens=True)[1])
    toks1 = np.asarray(
        build_mesh_sampler(gen, mesh1, sampling, task=task)
        .sample(variables, cond, key, return_tokens=True)[1])
    np.testing.assert_array_equal(toks8, toks1)
    _, toks_ref = gen.sample(variables, cond, sampling, key,
                             return_tokens=True)
    np.testing.assert_array_equal(toks8, np.asarray(toks_ref))
    ms8.compile_and_verify(variables, cond, key)


# ---- LayoutDM / VQDiffusion ------------------------------------------------


@pytest.mark.parametrize("q_type,pos_emb",
                         [("constrained", "elem_attr"), ("default", "layout")])
def test_diffusion_mesh_matches_single_chip(q_type, pos_emb):
    from ralf_tpu.models.diffusion import LayoutDMGenerator

    tok = _tok(special=("pad", "mask"))
    gen = LayoutDMGenerator(tok, TINY, num_timesteps=4, q_type=q_type,
                            pos_emb=pos_emb, image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    batch = {"layout": random_layout(np.random.default_rng(1), 8, S, 3),
             "image": _batch(8)["image"]}
    cond, _ = gen.build_condition(batch, np.random.default_rng(0), task="c")
    sampling = SamplingConfig(name="top_p", top_p=0.9)
    key = jax.random.PRNGKey(9)
    mesh8, mesh1 = _meshes()

    ms8 = build_mesh_sampler(gen, mesh8, sampling, task="c")
    toks8 = np.asarray(ms8.sample(variables, cond, key, return_tokens=True)[1])
    toks1 = np.asarray(
        build_mesh_sampler(gen, mesh1, sampling, task="c")
        .sample(variables, cond, key, return_tokens=True)[1])
    np.testing.assert_array_equal(toks8, toks1)
    _, toks_ref = gen.sample(variables, cond, sampling, key,
                             return_tokens=True)
    np.testing.assert_array_equal(toks8, np.asarray(toks_ref))
    ms8.compile_and_verify(variables, cond, key)


# ---- CGL-GAN / DS-GAN ------------------------------------------------------


def test_gan_mesh_matches_single_chip():
    from ralf_tpu.models.cgl_gan import CGLGANGenerator

    gen = CGLGANGenerator(num_labels=3, cfg=TINY, image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    batch = {"layout": random_layout(np.random.default_rng(2), 8, S, 3),
             "image": _batch(8)["image"]}
    mesh8, mesh1 = _meshes()

    ms8 = build_mesh_sampler(gen, mesh8, None)
    # identical host rng seeds => identical random inits => identical layouts
    out8 = ms8.sample(variables, batch, np.random.default_rng(3))
    out1 = build_mesh_sampler(gen, mesh1, None).sample(
        variables, batch, np.random.default_rng(3))
    ref = gen.sample(variables, batch, np.random.default_rng(3))
    for a, b in ((out8, out1), (out8, ref)):
        # discrete outputs (labels, hence masks) are bit-identical; box
        # floats can differ at ulp level (~2e-7 measured) because XLA
        # fuses the per-row conv/norm chain differently per partitioning
        np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(np.asarray(a.center_x),
                                   np.asarray(b.center_x), atol=1e-5)
    ms8.compile_and_verify(variables, batch, np.random.default_rng(3))


def test_dsgan_rides_gan_mesh_sampler():
    from ralf_tpu.models.dsgan import DSGANGenerator

    gen = DSGANGenerator(num_labels=3, cfg=TINY, image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    batch = {"layout": random_layout(np.random.default_rng(2), 8, S, 3),
             "image": _batch(8)["image"]}
    mesh8, _ = _meshes()
    ms = build_mesh_sampler(gen, mesh8, None)
    assert type(ms).__name__ == "GANMeshSampler"
    out = ms.sample(variables, batch, np.random.default_rng(0))
    assert np.asarray(out.label).shape == (8, S)
    ms.compile_and_verify(variables, batch, np.random.default_rng(0))


# ---- ICVT ------------------------------------------------------------------


def test_icvt_mesh_matches_single_chip():
    from ralf_tpu.models.icvt import ICVTGenerator

    gen = ICVTGenerator(num_labels=3, cfg=GeneratorConfig(
        d_model=40, nhead=4, num_encoder_layers=1, num_decoder_layers=1,
        backbone="resnet18"), image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    batch = {"layout": random_layout(np.random.default_rng(4), 8, S, 3),
             "image": _batch(8)["image"]}
    key = jax.random.PRNGKey(21)
    mesh8, mesh1 = _meshes()

    ms8 = build_mesh_sampler(gen, mesh8, None)
    out8 = ms8.sample(variables, batch, np.random.default_rng(0), key=key)
    out1 = build_mesh_sampler(gen, mesh1, None).sample(
        variables, batch, np.random.default_rng(0), key=key)
    ref = gen.sample(variables, batch, np.random.default_rng(0), key=key)
    for a, b in ((out8, out1), (out8, ref)):
        np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))
        np.testing.assert_array_equal(np.asarray(a.width), np.asarray(b.width))
    ms8.compile_and_verify(variables, batch, np.random.default_rng(0), key=key)


# ---- Retriever top-1 baseline ---------------------------------------------


def test_retriever_mesh_matches_predict_top1():
    from ralf_tpu.models.retriever_baseline import RetrieverGenerator

    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=16,
                                seed=0, image_hw=HW)
    gen = RetrieverGenerator.build(ds, "saliency")
    batch = _batch(8, seed=5)
    mesh8, _ = _meshes()

    ms = build_mesh_sampler(gen, mesh8, None)
    out = ms.sample({"params": {}}, batch)
    ref = gen.sample({"params": {}}, batch)
    np.testing.assert_array_equal(np.asarray(out.label), np.asarray(ref.label))
    np.testing.assert_allclose(np.asarray(out.center_x),
                               np.asarray(ref.center_x))
    ms.compile_and_verify({"params": {}}, batch)


# ---- dispatch completeness -------------------------------------------------


def test_build_mesh_sampler_rejects_unknown():
    mesh8, _ = _meshes()
    with pytest.raises(TypeError):
        build_mesh_sampler(object(), mesh8, None)


def test_build_mesh_sampler_rejects_quant_for_non_ar():
    """--kv-quant/--self-quant on a family without int8 caches must fail
    loudly (ADVICE r4: the mesh path silently dropped them)."""
    from ralf_tpu.models.maskgit import MaskGITGenerator

    gen = MaskGITGenerator(_tok(special=("pad", "mask")), TINY,
                           num_timesteps=4, image_hw=HW)
    mesh8, _ = _meshes()
    with pytest.raises(ValueError, match="int8 cache"):
        build_mesh_sampler(gen, mesh8, SamplingConfig(name="top_p"),
                           task="c", kv_quant=True)
    with pytest.raises(ValueError, match="int8 cache"):
        build_mesh_sampler(gen, mesh8, SamplingConfig(name="top_p"),
                           task="c", self_quant=True)


def test_maskgit_mesh_sampler_rejects_zero_timesteps():
    from ralf_tpu.models.maskgit import MaskGITGenerator
    from ralf_tpu.parallel.zoo import MaskGITMeshSampler

    gen = MaskGITGenerator(_tok(special=("pad", "mask")), TINY,
                           num_timesteps=4, image_hw=HW)
    mesh8, _ = _meshes()
    with pytest.raises(ValueError, match=">= 1"):
        MaskGITMeshSampler(gen, mesh8, SamplingConfig(name="top_p"),
                           num_timesteps=0)
