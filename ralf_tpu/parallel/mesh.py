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

  * axis "dcn"     — multi-slice data parallelism (`make_hybrid_mesh`):
    an OUTER axis across TPU slices.  Batch is sharded over (dcn, data)
    jointly, parameters stay replicated, so the only cross-slice traffic
    is the gradient all-reduce — the one collective that tolerates DCN
    latency.  Gallery sharding stays strictly within a slice (ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GALLERY_AXIS = "gallery"
DCN_AXIS = "dcn"


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


def make_hybrid_mesh(
    ici_shape: Sequence[int],
    num_slices: Optional[int] = None,
    axis_names: Sequence[str] = (DCN_AXIS, DATA_AXIS, GALLERY_AXIS),
    devices: Optional[list] = None,
) -> Mesh:
    """Multi-slice mesh: outer `dcn` axis across slices, `ici_shape` axes
    within each slice (SURVEY §2.10's TPU-native DDP extension).

    On real multi-slice hardware (devices expose distinct `slice_index`es)
    the assignment comes from `mesh_utils.create_hybrid_device_mesh`, which
    keeps each slice contiguous so only the dcn axis crosses the data-center
    network.  On single-slice or virtual (CPU) device sets — where there is
    no slice topology to respect — the same logical mesh is built by
    reshaping, so the hybrid program compiles and runs anywhere.
    """
    devices = devices if devices is not None else jax.devices()
    ici = int(np.prod(ici_shape))
    if num_slices is None:
        assert len(devices) % ici == 0, (len(devices), ici_shape)
        num_slices = len(devices) // ici
    assert num_slices * ici == len(devices), (num_slices, ici_shape, len(devices))

    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=tuple(ici_shape),
            dcn_mesh_shape=(num_slices,) + (1,) * (len(ici_shape) - 1),
            devices=devices,
        )
        # hybrid mesh comes back as (dcn*ici_0, ici_1, ...); lift the dcn
        # axis out front to match axis_names
        arr = arr.reshape((num_slices, *ici_shape))
    else:
        arr = np.asarray(devices).reshape((num_slices, *ici_shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis — jointly over
    (dcn, data) on a hybrid mesh, so every device holds a distinct
    microbatch and gradients all-reduce across both axes."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gallery_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a [N, D] gallery over the gallery axis."""
    return NamedSharding(mesh, P(GALLERY_AXIS, None))


def shard_batch(mesh: Mesh, batch):
    """Device_put every array leaf with batch-axis sharding; rank-0
    leaves (e.g. ICVT's KL warmup beta) are replicated — a batch-axis
    PartitionSpec is invalid for scalars."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, rep if jnp.ndim(x) == 0 else sh), batch
    )


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def assert_dp_train_hlo(compiled, expect_sync: bool = True) -> None:
    """Assert a compiled data-parallel train step matches the DDP contract
    (SURVEY §2.10): its ONLY cross-device collectives are the all-reduces
    that sync gradients / batch statistics — no all-gathers, all-to-alls or
    permutes (which would mean an activation or weight got sharded and the
    per-chip scaling claim silently broke), and no host round-trips.

    With `expect_sync` (a mesh with >1 device on the batch axes) at least
    one all-reduce must be present — a program with none never syncs
    replicas and is silently training n independent models.
    """
    txt = compiled.as_text().lower()
    forbidden = ("all-gather", "all-to-all", "collective-permute",
                 "collective-broadcast")
    for op in forbidden:
        assert f"{op}(" not in txt and f"{op}-start(" not in txt, (
            f"dp train step contains a non-all-reduce collective ({op})")
    for op in ("infeed", "outfeed", "send-to-host", "recv-from-host",
               "xla_python_cpu_callback", "xla_ffi_python_cpu_callback"):
        assert op not in txt, f"dp train step contains a host sync ({op})"
    has_ar = ("all-reduce(" in txt or "all-reduce-start(" in txt
              or "reduce-scatter(" in txt)  # XLA may split the grad sync
    if expect_sync:
        assert has_ar, ("dp train step over a multi-device mesh has NO "
                        "gradient all-reduce — replicas never sync")
