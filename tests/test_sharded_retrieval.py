"""Gallery-sharded retrieval matches the single-device exact scan.

Covers the mesh integration of `sharded_topk` into `Retriever` /
`RetrievalAugmentedLoader` (SURVEY §2.10: the faiss index replacement
must also be the distributed one).  Runs on the 8-virtual-device CPU
platform from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.parallel.mesh import GALLERY_AXIS, make_mesh
from ralf_tpu.retrieval.retriever import Retriever, exact_topk, sharded_topk
from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader


def _gallery_mesh():
    # all 8 virtual devices on the gallery axis
    return make_mesh((1, 8))


def test_sharded_topk_matches_exact_with_padding_and_self_exclusion():
    rng = np.random.default_rng(0)
    N, D, B, K = 37, 16, 5, 4  # N not divisible by 8 -> padding path
    g = rng.normal(size=(N, D)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    q = g[:B] + 0.01 * rng.normal(size=(B, D)).astype(np.float32)
    qid = jnp.arange(B, dtype=jnp.int32)

    ref = np.asarray(
        exact_topk(jnp.asarray(q), jnp.asarray(g), K, True, qid)
    )
    mesh = _gallery_mesh()
    pad = (-N) % mesh.shape[GALLERY_AXIS]
    gp = jnp.pad(jnp.asarray(g), ((0, pad), (0, 0)))
    got = np.asarray(
        sharded_topk(
            mesh, GALLERY_AXIS, jnp.asarray(q), gp, K,
            exclude_self=True, query_ids=qid, n_valid=N,
        )
    )
    np.testing.assert_array_equal(got, ref)
    assert (got < N).all()  # padded rows never retrieved
    assert (got != np.arange(B)[:, None]).all()  # self excluded


def test_retriever_shard_gallery_table_parity():
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=21, seed=3, image_hw=(64, 48)
    )
    plain = Retriever.build(ds)
    table_ref = plain.precompute_table(ds, k=4, is_train_split=True)

    sharded = Retriever.build(ds).shard_gallery(_gallery_mesh())
    table = sharded.precompute_table(ds, k=4, is_train_split=True)
    np.testing.assert_array_equal(table, table_ref)


def test_wrapper_with_sharded_retriever():
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=12, seed=1, image_hw=(64, 48)
    )
    mk = lambda r: RetrievalAugmentedLoader(
        BatchLoader(ds, 4, shuffle=False, seed=0), r, top_k=3,
        is_train_split=True,
    )
    ref_batches = list(mk(Retriever.build(ds)))
    got_batches = list(mk(Retriever.build(ds).shard_gallery(_gallery_mesh())))
    assert len(got_batches) == len(ref_batches)
    for got, ref in zip(got_batches, ref_batches):
        np.testing.assert_array_equal(
            got["retrieved_indices"], ref["retrieved_indices"]
        )
        for key in ref["retrieved"]:
            np.testing.assert_array_equal(
                got["retrieved"][key], ref["retrieved"][key]
            )
        assert (got["retrieved_indices"] != got["indices"][:, None]).all()
