"""Multitask conditioning, image-side metrics with pluggable features,
retriever baseline generator."""

import jax
import numpy as np

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.data.dataset import DatasetConfig, SyntheticPosterDataset
from ralf_tpu.eval.image_metrics import compute_image_fid, compute_rshm
from ralf_tpu.models.autoreg import AutoregGenerator
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.retriever_baseline import RetrieverGenerator

S, HW = 10, (64, 48)


def test_multitask_samples_tasks():
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = AutoregGenerator(tok, GeneratorConfig(d_model=32, nhead=4,
                                                num_encoder_layers=1,
                                                num_decoder_layers=1,
                                                dim_feedforward=64,
                                                backbone="resnet18"),
                           auxiliary_task="multitask", image_hw=HW)
    rng = np.random.default_rng(0)
    batch = {"layout": random_layout(rng, 2, S, 3),
             "image": np.zeros((2, *HW, 4), np.float32)}
    tasks = set()
    for _ in range(30):
        cond, _ = gen.build_condition(batch, rng)
        tasks.add(cond.task)
    assert len(tasks) >= 3  # several distinct tasks drawn


def test_image_metrics_with_fake_features():
    rng = np.random.default_rng(0)
    gt = random_layout(rng, 8, S, 3)
    pred = random_layout(rng, 8, S, 3)
    images = rng.random((8, 32, 24, 4)).astype(np.float32)

    def feature_fn(imgs):
        x = np.asarray(imgs)
        return x.reshape(x.shape[0], -1)[:, :64]

    out = compute_image_fid(gt, pred, images, feature_fn)
    assert "image_fid" in out and np.isfinite(out["image_fid"])
    r = compute_rshm(pred, images, feature_fn)
    assert r.shape == (8,) and (r >= 0).all()


def test_retriever_generator():
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=16,
                                seed=0, image_hw=HW)
    gen = RetrieverGenerator.build(ds)
    q = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=4,
                               seed=1, image_hw=HW)
    out = gen.sample(gen.init(None), {"image": q.get_images(np.arange(4))})
    assert np.asarray(out.label).shape == (4, S)
    assert np.asarray(out.mask).any()
