"""Mesh-sharded batched decode — the multi-chip INFERENCE path.

The north star (BASELINE.md) is >=5,000 generated layouts/sec on a v5e-8:
a *decode* throughput claim, not a train one.  The reference's equivalent
surface is the "ms per sample" wall-clock over `model.sample` batches
(`image2layout/train/inference.py:371,441-443,495`), measured on one GPU;
its only scale-out story is DDP *training*.  Here the full sample program
— image+constraint(+retrieval) encode followed by the KV-cached
constrained decode scan — is jitted ONCE over a `jax.sharding.Mesh` with

  * batch rows sharded over the mesh batch axes ((dcn, data) on a hybrid
    mesh, data otherwise),
  * parameters and the PRNG key replicated,

so each chip runs its batch shard of the *identical* program.  Every op in
the sample path is per-row independent (convs/matmuls against replicated
weights, per-row LayerNorm, per-row sampling), so the SPMD partitioner
emits NO collectives and no per-step host syncs: throughput scales as
n_chips x per-chip, which is exactly how the projected v5e-8 number in
BENCH_NOTES.md is computed.  Both properties are asserted, not assumed —
`assert_clean_decode_hlo` greps the compiled HLO for collectives and host
callbacks, and `__graft_entry__.dryrun_multichip` checks the sharded
program's tokens are bit-identical to the single-device program's
(jax's threefry PRNG is counter-based, so sampling is shard-invariant).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.parallel.mesh import batch_sharding, replicated

# HLO fingerprints that would invalidate the n_chips-x-per-chip scaling
# claim: cross-device collectives and host round-trips.
_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast",
)
_HOST_SYNC_OPS = ("infeed", "outfeed", "send-to-host", "recv-from-host",
                  "xla_python_cpu_callback", "xla_ffi_python_cpu_callback")


def assert_clean_decode_hlo(compiled) -> None:
    """Assert a compiled sample program contains no collectives and no host
    callbacks — the two ways a 'sharded' decode could silently serialize."""
    txt = compiled.as_text().lower()
    for op in _COLLECTIVE_OPS:
        # HLO spells these as e.g. `all-reduce(`/`all-gather-start(`
        assert f"{op}(" not in txt and f"{op}-start(" not in txt, (
            f"sharded decode program contains a cross-device collective "
            f"({op}) — per-chip scaling claim is void")
    for op in _HOST_SYNC_OPS:
        assert op not in txt, (
            f"sharded decode program contains a host sync ({op})")


class MeshProgram:
    """Shared plumbing for every mesh-sharded inference program: batch /
    replicated shardings, shard-count bookkeeping, and row padding.

    Determinism contract (all subclasses): same (key, padded batch shape)
    => bit-identical outputs on ANY mesh, 1 chip or 8 — jax's threefry
    PRNG is counter-based and partitionable, so in-program sampling is
    shard-invariant.  Asserted in dryrun_multichip and tests/test_mesh_zoo.
    """

    def __init__(self, mesh) -> None:
        self.mesh = mesh
        self.batch_sh = batch_sharding(mesh)
        self.rep = replicated(mesh)
        # total batch shards = product of mesh axis sizes named in the
        # batch PartitionSpec (data, plus dcn on hybrid meshes)
        spec = self.batch_sh.spec[0]
        axes = (spec,) if isinstance(spec, str) else tuple(spec)
        self.num_shards = int(np.prod([mesh.shape[a] for a in axes]))

    def _rows(self, B: int) -> int:
        return -(-B // self.num_shards) * self.num_shards

    def _pad(self, a: np.ndarray, rows: int) -> np.ndarray:
        """Pad the batch axis to `rows` by repeating the last row.  Padding
        changes the batch shape, hence any in-program PRNG draws, so
        fixed-seed reproducibility is per (seed, padded-shape) — same
        contract as the reference's per-batch-size determinism."""
        a = np.asarray(a)
        B = a.shape[0]
        if B == rows:
            return a
        reps = np.repeat(a[-1:], rows - B, axis=0)
        return np.concatenate([a, reps], axis=0)

    def _pad_tree(self, tree, rows: int):
        import jax

        return jax.tree.map(lambda a: self._pad(a, rows), tree)


class MeshSampler(MeshProgram):
    """One jitted sample program (encode + constrained decode scan) sharded
    over a mesh's batch axes; params replicated.

    Drives the AR family (Autoreg/RALF and fusion variants): anything whose
    generator exposes `core.encode_memory` + `decode` (the KV-cached scan in
    `ops/decode_loop.ar_decode`).  The relation task rides
    `parallel/zoo.RelationMeshSampler` (the retry loop is itself one jitted
    scan — ops/relation_decode); every other task rides this.
    """

    def __init__(self, gen, mesh, sampling: SamplingConfig, *,
                 kv_quant: bool = False, self_quant: bool = False) -> None:
        super().__init__(mesh)
        self.gen = gen
        self.sampling = sampling
        self.kv_quant = kv_quant
        self.self_quant = self_quant
        self._is_ralf = hasattr(gen, "_retrieved_arrays")
        self._fn = self._build()

    def _build(self):
        gen = self.gen
        core_cls = type(gen.core)
        is_ralf = self._is_ralf
        sampling, kv_quant, self_quant = (
            self.sampling, self.kv_quant, self.self_quant)

        def fn(variables, image, const_seq, const_keep, retrieved, forced, key):
            if is_ralf:
                memory = gen.core.apply(
                    variables, image, retrieved, const_seq, const_keep, False,
                    method=core_cls.encode_memory)
            else:
                memory = gen.core.apply(
                    variables, image, const_seq, const_keep, False,
                    method=core_cls.encode_memory)
            return gen.decode(variables, memory, forced, sampling, key,
                              kv_quant=kv_quant, self_quant=self_quant)

        b, r = self.batch_sh, self.rep
        return jax.jit(
            fn,
            in_shardings=(r, b, b, b, b, b, r),
            out_shardings=b,
        )

    # -- shape plumbing ------------------------------------------------------

    def sample_tokens(self, variables, cond, key) -> np.ndarray:
        """Condition -> sampled token ids [B, L] (padding rows stripped)."""
        from ralf_tpu.core.conditioning import build_forced_tokens

        gen = self.gen
        forced = np.asarray(build_forced_tokens(cond, gen.tokenizer))
        B = forced.shape[0]
        rows = self._rows(B)
        image = self._pad(np.asarray(cond.image), rows)
        const_seq = self._pad(np.asarray(cond.const_seq), rows)
        const_keep = self._pad(np.asarray(cond.const_mask), rows)
        forced = self._pad(forced, rows)
        retrieved = {}
        if self._is_ralf:
            retrieved = {
                k: self._pad(np.asarray(v), rows)
                for k, v in gen._retrieved_arrays(cond.retrieved).items()
            }
        with self.mesh:
            toks = self._fn(variables, image, const_seq, const_keep,
                            retrieved, forced, key)
        return np.asarray(toks)[:B]

    def sample(self, variables, cond, key, return_tokens: bool = False):
        toks = self.sample_tokens(variables, cond, key)
        layout = self.gen.tokenizer.decode(jnp.asarray(toks))
        return (layout, toks) if return_tokens else layout

    # -- verification --------------------------------------------------------

    def compile_and_verify(self, variables, cond, key) -> Any:
        """AOT-compile the sharded program for this condition's shapes and
        assert the HLO is collective- and host-sync-free."""
        from ralf_tpu.core.conditioning import build_forced_tokens

        gen = self.gen
        forced = np.asarray(build_forced_tokens(cond, gen.tokenizer))
        B = forced.shape[0]
        rows = self._rows(B)
        image = self._pad(np.asarray(cond.image), rows)
        const_seq = self._pad(np.asarray(cond.const_seq), rows)
        const_keep = self._pad(np.asarray(cond.const_mask), rows)
        forced = self._pad(forced, rows)
        retrieved = {}
        if self._is_ralf:
            retrieved = {
                k: self._pad(np.asarray(v), rows)
                for k, v in gen._retrieved_arrays(cond.retrieved).items()
            }
        with self.mesh:
            compiled = self._fn.lower(
                variables, image, const_seq, const_keep, retrieved, forced, key
            ).compile()
        assert_clean_decode_hlo(compiled)
        return compiled


def make_decode_mesh(devices: Optional[list] = None):
    """All devices on one flat 'data' axis — decode has no gallery/TP axis;
    batch parallelism is the whole story (SURVEY §2.10(c))."""
    from ralf_tpu.parallel.mesh import DATA_AXIS, make_mesh

    devices = devices if devices is not None else jax.devices()
    return make_mesh((len(devices),), (DATA_AXIS,), devices=devices)
