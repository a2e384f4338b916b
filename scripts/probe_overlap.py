"""Perf probe (VERDICT r4 #8, the last unexplored lever): can fusing
encode(chunk N+1) with decode(chunk N) into ONE XLA program overlap the
conv/MXU-heavy encode with the HBM-bound decode scan?

Hypothesis check, not an optimization commitment: a single TPU core
executes its HLO schedule serially (ops don't run concurrently the way
CUDA streams do; only DMA prefetch is async), so the expectation is that
the fused program's time ~= t(encode) + t(decode) and the pipeline buys
nothing.  Either outcome closes the question with a trace-backed number
(BENCH_NOTES ceiling analysis).

Method: batch of C chunks of 1024 (the adopted ENC_CHUNK).
  baseline : bench.build_flagship's sample_fn — encode all chunks
             (jitted per chunk), then one decode over the full batch.
  pipelined: fused jit (memory_next, tokens_cur) = f(image_next, mem_cur)
             — software pipeline across chunks, same math, same key per
             chunk pairing as a chunked-decode baseline variant.
  chunked  : encode+decode per chunk in separate jits (isolates the
             per-chunk-decode cost from the fusion question).

Usage: python scripts/probe_overlap.py [--chunks 2] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=2)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # the probe's "baseline" arm is the r1-r4 whole-batch-decode schedule;
    # bench.py's default is now the winning "chunked" schedule, so pin it
    # here or the baseline and chunked arms would measure the same thing
    os.environ["RALF_BENCH_SCHEDULE"] = "whole"
    # ... and the r1-r4 chunk size (the r5 default moved to 128 for the
    # chunked schedule; this probe's arms are all built around CH=1024)
    os.environ["RALF_BENCH_ENC_CHUNK"] = "1024"
    from bench import build_flagship
    from ralf_tpu.models.ralf import RALFCore

    setup = build_flagship()
    gen, variables, sampling = setup.gen, setup.variables, setup.sampling
    CH = 1024
    C = args.chunks
    B = C * CH

    tile = lambda a: np.concatenate([a] * C, 0)
    image = jnp.asarray(tile(setup.image1k)).astype(jnp.bfloat16)
    retrieved = {k: jnp.asarray(tile(v)) for k, v in setup.retrieved1k.items()}
    const_seq = jnp.asarray(tile(setup.const1k))
    const_keep = jnp.asarray(tile(setup.keep1k))
    forced = jnp.asarray(tile(setup.forced1k))
    key = setup.key

    enc = jax.jit(lambda v, im, r, cs, ck: gen.core.apply(
        v, im, r, cs, ck, False, method=RALFCore.encode_memory))
    dec = jax.jit(lambda v, m, f, k: gen.decode(
        v, m, f, sampling, k, kv_quant=True, self_quant=setup.self_quant))

    @jax.jit
    def fused(v, im_next, r_next, cs_next, ck_next, mem_cur, f_cur, k):
        mem_next = gen.core.apply(v, im_next, r_next, cs_next, ck_next,
                                  False, method=RALFCore.encode_memory)
        toks = gen.decode(v, mem_cur, f_cur, sampling, k,
                          kv_quant=True, self_quant=setup.self_quant)
        return mem_next, toks

    def chunk(a, i):
        return a[i * CH:(i + 1) * CH]

    def rchunk(i):
        return {k: chunk(a, i) for k, a in retrieved.items()}

    def run_baseline(img, k):
        return setup.sample_fn(img, retrieved, const_seq, const_keep,
                               forced, k)

    def run_chunked(img, k):
        outs = []
        for i in range(C):
            mem = enc(variables, chunk(img, i), rchunk(i),
                      chunk(const_seq, i), chunk(const_keep, i))
            outs.append(dec(variables, mem, chunk(forced, i),
                            jax.random.fold_in(k, i)))
        return jnp.concatenate(outs, 0)

    def run_pipelined(img, k):
        outs = []
        mem = enc(variables, chunk(img, 0), rchunk(0),
                  chunk(const_seq, 0), chunk(const_keep, 0))
        for i in range(1, C):
            mem, toks = fused(variables, chunk(img, i), rchunk(i),
                              chunk(const_seq, i), chunk(const_keep, i),
                              mem, chunk(forced, i - 1),
                              jax.random.fold_in(k, i - 1))
            outs.append(toks)
        outs.append(dec(variables, mem, chunk(forced, C - 1),
                        jax.random.fold_in(k, C - 1)))
        return jnp.concatenate(outs, 0)

    results = {}
    for name, fn in (("baseline", run_baseline), ("chunked", run_chunked),
                     ("pipelined", run_pipelined)):
        out = fn(image, key)
        jax.block_until_ready(out)
        times, sigs = [], []
        for i in range(args.iters):
            img_i = image + jax.random.normal(
                jax.random.PRNGKey(100 + i), image.shape, image.dtype) * 0.05
            jax.block_until_ready(img_i)
            t0 = time.perf_counter()
            out = fn(img_i, jax.random.fold_in(key, i))
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
            sigs.append(np.asarray(out).tobytes())
        assert len(set(sigs)) == args.iters, f"{name}: memoized executions"
        results[name] = {"best_s": round(min(times), 4),
                         "layouts_per_sec": round(B / min(times), 1)}
        print(json.dumps({name: results[name]}), flush=True)

    gain = results["baseline"]["best_s"] / results["pipelined"]["best_s"]
    print(json.dumps({"B": B, "chunks": C,
                      "pipelined_vs_baseline_speedup": round(gain, 4)}))


if __name__ == "__main__":
    main()
