"""Probe: is the int8 shared-memory decode stream DMA-rate-bound by its
*dtype tiling* (int8 min-tile (32,128)) rather than by bytes?

BENCH_NOTES records the q8 kernel streaming at ~425GB/s effective while the
bf16 kernel streams at ~626GB/s — int8 moves half the bytes at two-thirds
the rate.  If the SAME bytes stream faster when the HBM-resident buffer is
bitcast to a wider dtype (int16/int32 views of the int8 memory), the q8
kernel could DMA a wide view and unpack in VMEM, lifting the dominant
decode stream toward the bf16 rate on half the bytes.

This measures pure stream rate: a minimal Pallas kernel per dtype view that
DMAs [bb, M, ...] blocks of identical byte count and does one cheap VPU
reduction (so Mosaic cannot elide the load).  50 sequential calls at the
bench shape, distinct inputs per call (memoization hygiene).

Usage: python scripts/probe_dma_rate.py [B]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sum_kernel(x_ref, o_ref):
    # one cheap reduction per block: forces the DMA, negligible VPU time.
    # Output is [bb, 128] (rank-1 outputs require 128-multiple blocks on
    # this lowering) — the row sum broadcast across the lane dim.  The
    # reduction keeps rank >= 2 throughout: a rank-1 intermediate SIGABRTs
    # Mosaic ("arr.size() >= layout_rank").
    x = x_ref[...].astype(jnp.float32)
    s = jnp.sum(x, axis=tuple(range(2, x.ndim)))  # [bb, d1]
    s = jnp.sum(s, axis=1, keepdims=True)  # [bb, 1]
    o_ref[...] = jnp.broadcast_to(s, o_ref.shape)


@functools.partial(jax.jit, static_argnames=("bb",))
def stream_sum(x: jax.Array, bb: int = 8) -> jax.Array:
    B = x.shape[0]
    # grid=(B // bb,) would silently skip tail rows on a ragged B — the
    # reported GB/s would divide full-B bytes by a shorter stream (ADVICE r3)
    assert B >= bb and B % bb == 0, f"B={B} must be a multiple of bb={bb}"
    blk = (bb,) + x.shape[1:]
    ix = lambda b: (b,) + (0,) * (x.ndim - 1)
    out = pl.pallas_call(
        _sum_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        grid=(B // bb,),
        in_specs=[pl.BlockSpec(blk, ix, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=x.size, bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x)
    return out[:, 0]


def timed(fn, xs, tag, nbytes, warm):
    # warm/compile on a DEDICATED slab: warming on xs[0] would let the
    # runtime's memo cache serve timed call 1 and inflate GB/s (ADVICE r3)
    jax.block_until_ready(fn(warm))
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(xs)
    print(f"{tag:28s}: {dt * 1e3:7.3f} ms/call, {nbytes / dt / 1e9:6.0f} GB/s")
    assert len({np.asarray(o).tobytes() for o in outs}) == len(xs), "memoized"
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    M, E = 680, 256
    nbytes = B * M * E  # one int8 memory slab's bytes

    key = jax.random.PRNGKey(0)
    N = 9  # slab 0 is the dedicated warmup slab; HBM budget: one int8 set
    # (N x 356MB at B=2048) plus ONE derived view family at a time
    slabs = []
    for i in range(N):
        r = jax.random.randint(
            jax.random.fold_in(key, i), (B, M, E), -127, 128, jnp.int32
        )
        slabs.append(jax.block_until_ready(r.astype(jnp.int8)))

    def v16(s):
        return jax.lax.bitcast_convert_type(
            s.reshape(B, M, E // 2, 2), jnp.int16).reshape(B, M, E // 2)

    def v32(s):
        return jax.lax.bitcast_convert_type(
            s.reshape(B, M, E // 4, 4), jnp.int32).reshape(B, M, E // 4)

    def vf32(s):
        # clear bit 30 of each word first: with the exponent's MSB zero no
        # 32-bit pattern is NaN/Inf, so the f32 reduction stays finite and
        # the outputs stay distinct (random int8 bytes otherwise hit a
        # NaN pattern in ~every row and all sums collapse to NaN; ADVICE r3)
        w = v32(s) & jnp.int32(~(1 << 30))
        return jax.lax.bitcast_convert_type(w[..., None], jnp.float32)[..., 0]

    timed(stream_sum, slabs[1:], f"int8   [{B},{M},{E}]", nbytes, slabs[0])
    for maker, tag, nb in (
        (v16, f"int16  [{B},{M},{E // 2}] (bitcast)", nbytes),
        (v32, f"int32  [{B},{M},{E // 4}] (bitcast)", nbytes),
        (vf32, f"f32    [{B},{M},{E // 4}] (bitcast)", nbytes),
        (lambda s: s.astype(jnp.bfloat16), f"bf16   [{B},{M},{E}] (2x bytes)",
         2 * nbytes),
    ):
        views = [jax.block_until_ready(maker(s)) for s in slabs]
        timed(stream_sum, views[1:], tag, nb, views[0])
        del views


if __name__ == "__main__":
    main()
