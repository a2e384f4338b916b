"""Probe: does this Mosaic toolchain accept int8 x int8 -> int32 MXU dots,
and is the full-int8 shared-memory decode kernel faster than the
convert-to-f32 one?  Runs both kernels at the bench shape (B=2048, M=680,
E=256, H=8) for 50 back-to-back steps (the decode scan's shape) and reports
per-call time + numeric deltas.

Usage: python scripts/probe_q8mxu.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H, E, M = 8, 256, 680
    from ralf_tpu.ops.pallas.decode_attention import (
        fused_decode_shared_attention_q8,
        fused_decode_shared_attention_q8mxu,
        q8mxu_reference,
        quantize_shared_memory,
    )

    k = jax.random.PRNGKey(0)
    qt = jax.random.normal(k, (B, H, E), jnp.bfloat16)
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, M, E), jnp.bfloat16)
    mi, ms = quantize_shared_memory(mem)
    mi, ms = jax.block_until_ready((mi, ms))

    # compile probe — a Mosaic rejection aborts the process right here
    out_new = jax.block_until_ready(
        fused_decode_shared_attention_q8mxu(qt, mi, ms)
    )
    print("q8mxu compiled and ran OK")
    ref = q8mxu_reference(qt.astype(jnp.float32), mi, ms)
    d = float(jnp.max(jnp.abs(out_new.astype(jnp.float32) - ref)))
    print(f"kernel vs oracle max delta: {d:.3e} (bf16 io)")

    old = jax.block_until_ready(fused_decode_shared_attention_q8(qt, mi, ms))
    rel = float(
        jnp.max(jnp.abs(out_new.astype(jnp.float32) - old.astype(jnp.float32)))
        / jnp.max(jnp.abs(old.astype(jnp.float32)))
    )
    print(f"new vs current-q8 max rel delta: {rel:.4f}")

    # timing: 50 sequential calls, distinct queries per call (memoization)
    def timed(fn, tag):
        qs = [
            qt + jax.random.normal(jax.random.PRNGKey(10 + i), qt.shape, qt.dtype) * 0.01
            for i in range(50)
        ]
        jax.block_until_ready(qs)
        jax.block_until_ready(fn(qs[0]))  # warm
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 50
        bw = B * M * E / dt / 1e9
        print(f"{tag}: {dt*1e3:.2f} ms/call, int8-stream eff {bw:.0f} GB/s")
        assert len({np.asarray(o).tobytes() for o in outs}) == 50, "memoized"
        return dt

    t_old = timed(lambda q: fused_decode_shared_attention_q8(q, mi, ms), "q8 (convert)")
    t_new = timed(lambda q: fused_decode_shared_attention_q8mxu(q, mi, ms), "q8mxu (int8 dots)")
    print(f"speedup: {t_old / t_new:.3f}x")


if __name__ == "__main__":
    main()
