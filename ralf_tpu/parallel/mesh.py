"""Device mesh + sharding layer — the framework's 'communication backend'.

The reference's distributed story is single-node DDP over NCCL
(`image2layout/train/helpers/distrubuted.py:10-31`): data parallelism with
implicit gradient all-reduce.  The TPU-native equivalent is one
`jax.sharding.Mesh` with named axes and XLA-emitted collectives
(SURVEY §2.10):

  * axis "data"    — batch data parallelism (DDP equivalent): batches are
    sharded on it, parameters replicated; the SPMD partitioner turns the
    replicated-gradient requirement into an all-reduce over ICI.
  * axis "gallery" — retrieval-gallery model parallelism: the top-k scan
    shards the gallery rows (see retrieval/retriever.sharded_topk), a
    TP-like decomposition of the one genuinely large tensor in this
    workload.  The same axis doubles as a tensor-parallel axis for the
    decoder logit head on very large vocabularies.

Multi-slice (DCN) extends the same mesh with an outer "dcn" axis via
`jax.experimental.mesh_utils.create_hybrid_device_mesh`; batch stays on
the DCN axis so only gradient reduction crosses slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GALLERY_AXIS = "gallery"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, GALLERY_AXIS),
    devices: Optional[list] = None,
) -> Mesh:
    """Default: all devices on the data axis, gallery axis size 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gallery_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a [N, D] gallery over the gallery axis."""
    return NamedSharding(mesh, P(GALLERY_AXIS, None))


def shard_batch(mesh: Mesh, batch):
    """Device_put every array leaf with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
