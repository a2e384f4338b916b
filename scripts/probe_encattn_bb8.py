"""Probe: can the fused encoder attention reach bb=8 by query-chunking on
an 8-ALIGNED padded sequence?

BENCH_NOTES r1-r3: at S=330 the kernel runs bb=4 (bb=8 scoped-VMEM OOM),
costing ~29ms per B=1024 encode chunk vs a ~7ms roofline — ~88ms/batch at
B=4096.  Every q_chunk attempt aborted Mosaic, attributed to the ragged
final chunk's partial-sublane o_ref store: S=330 has NO divisor that is a
multiple of 8.  This probe pads S to 336 OUTSIDE the kernel (padded keys
masked via the exp(bias) keep-weights, padded query rows sliced off), so
q_chunk in {112, 56, 48} gives sublane-aligned stores, shrinking the live
score tile enough for bb=8.

Usage (real TPU): python scripts/probe_encattn_bb8.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.ops.pallas.encoder_attention import (
    _reference_attention,
    fused_encoder_attention,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
VARIANTS = sys.argv[2:] or ["base", "8:112", "8:56"]  # "bb:qchunk" or "base"
S, E, H = 330, 256, 8
SP = 336  # S rounded to sublane 8
NEG = -1e9


def make_inputs(n=6):
    key = jax.random.PRNGKey(0)
    outs = []
    for i in range(n):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        q = jax.random.normal(ks[0], (B, S, E), jnp.bfloat16) * 0.1
        k = jax.random.normal(ks[1], (B, S, E), jnp.bfloat16) * 0.1
        v = jax.random.normal(ks[2], (B, S, E), jnp.bfloat16)
        outs.append((q, k, v))
    return jax.block_until_ready(outs)


def pad_s(a):
    return jnp.pad(a, ((0, 0), (0, SP - S), (0, 0)))


def timed(tag, fn, inputs):
    try:
        o = jax.block_until_ready(fn(*inputs[0]))
    except Exception as e:  # noqa: BLE001 — probing Mosaic limits
        print(f"{tag:40s}: COMPILE/RUN FAIL {type(e).__name__}: {str(e)[:120]}")
        return None
    # correctness vs the XLA oracle
    q, k, v = inputs[0]
    ref = _reference_attention(q, k, v, H, None)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
    t0 = time.perf_counter()
    outs = [fn(*x) for x in inputs[1:]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (len(inputs) - 1)
    assert len({np.asarray(x).tobytes() for x in outs}) == len(inputs) - 1
    print(f"{tag:40s}: {dt * 1e3:7.2f} ms/call  maxerr {err:.2e}")
    return dt


def main():
    inputs = make_inputs()

    # padded-S variants: keys padded + masked, queries padded + sliced
    bias = jnp.concatenate(
        [jnp.zeros((B, S), jnp.float32),
         jnp.full((B, SP - S), NEG, jnp.float32)], axis=1)

    def padded(bb, qc):
        def fn(q, k, v):
            o = fused_encoder_attention(
                pad_s(q), pad_s(k), pad_s(v), H, key_bias=bias,
                block_b=bb, q_chunk=qc)
            return o[:, :S]
        return fn

    def qkv_folded(bb, qc):
        # in-kernel projection variant: per-row VMEM is x+o+qkv-tile only,
        # so bb=8 may fit where the 4-operand kernel OOMs
        from ralf_tpu.ops.pallas.encoder_attention import (
            fused_encoder_self_attention,
        )

        key = jax.random.PRNGKey(99)
        wqkv = jax.random.normal(key, (E, 3 * E), jnp.bfloat16) * 0.05
        bias_h = jnp.broadcast_to(bias[:, None, :], (B, H, SP))

        def fn(q, k, v):
            # q reused as the x input; k/v ignored (distinctness preserved)
            o = fused_encoder_self_attention(
                pad_s(q), wqkv, H, key_bias=bias_h, block_b=bb, q_chunk=qc)
            return o[:, :S]
        return fn

    for v in VARIANTS:
        if v == "base":
            timed("baseline auto-bb (bb=4)",
                  lambda q, k, v_: fused_encoder_attention(q, k, v_, H),
                  inputs)
        elif v.startswith("qkv"):
            _, bb_s, qc_s = v.split(":")
            bb = None if bb_s == "auto" else int(bb_s)
            qc = None if qc_s == "none" else int(qc_s)
            # no oracle check for this variant (different math); timing only
            fn = qkv_folded(bb, qc)
            try:
                jax.block_until_ready(fn(*inputs[0]))
                t0 = time.perf_counter()
                outs = [fn(*x) for x in inputs[1:]]
                jax.block_until_ready(outs)
                dt = (time.perf_counter() - t0) / (len(inputs) - 1)
                print(f"qkv-folded bb={bb_s} q_chunk={qc_s:20s}: "
                      f"{dt * 1e3:7.2f} ms/call (incl. in-kernel projection)")
            except Exception as e:  # noqa: BLE001
                print(f"qkv-folded bb={bb_s} q_chunk={qc_s}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}")
        else:
            bb_s, qc_s = v.split(":")
            bb = None if bb_s == "auto" else int(bb_s)
            qc = None if qc_s == "none" else int(qc_s)
            timed(f"padded S=336 bb={bb_s} q_chunk={qc_s}",
                  padded(bb, qc), inputs)


if __name__ == "__main__":
    main()
