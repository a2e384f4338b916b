"""Offline builders: saliency nets (shape smoke), inpaint masks, cache
builders on synthetic data.  The annotation readers, split mapping and the
full dataset-dump pipeline are exercised hermetically in
tests/test_build_dataset.py (fabricated PKU csv / CGL COCO-json trees)."""

import os
import pickle
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.preprocess.inpainting import box_union_mask
from ralf_tpu.preprocess.saliency_models import BASNet, ISNetDIS, RSUBlock


def test_rsu_block():
    m = RSUBlock(4, 8, 16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = m.apply(v, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 16)


def test_isnet_shapes():
    net = ISNetDIS()
    x = jnp.zeros((1, 128, 128, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    sal = net.apply(v, x)
    assert sal.shape == (1, 128, 128)
    assert float(sal.min()) >= 0 and float(sal.max()) <= 1


def test_basnet_shapes():
    net = BASNet()
    x = jnp.zeros((1, 64, 64, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    sal = net.apply(v, x)
    assert sal.shape == (1, 64, 64)


def test_box_union_mask():
    rng = np.random.default_rng(0)
    lay = random_layout(rng, 2, 10, 3)
    mask = box_union_mask(lay, 64, 48)
    assert mask.shape == (2, 64, 48)
    assert set(np.unique(mask)) <= {0, 255}
    assert mask.sum() > 0


def test_build_caches_cli(tmp_path):
    from conftest import cli_subprocess_env

    env = cli_subprocess_env()
    for what in ("clusters", "relationships"):
        r = subprocess.run(
            [sys.executable, "-m", "ralf_tpu.cli.build_caches", "--what", what,
             "--synthetic", "--cache-dir", str(tmp_path)],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    clusters = pickle.load(open(tmp_path / "pku10_kmeans_train_clusters.pkl", "rb"))
    assert "center_x-128" in clusters and len(clusters["center_x-128"]) == 128
    rels = pickle.load(open(tmp_path / "pku10_relationships_dic.pkl", "rb"))
    assert len(rels) > 0
