"""Profile the flagship encode path on the real TPU and print the top ops
by device time (reads the xplane protobuf directly — no TensorBoard).

Usage: python scripts/profile_encode.py [--batch 1024] [--decode]
"""

import argparse
import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(trace_dir, top=40):
    """Parse the .xplane.pb and aggregate device-op durations by name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = {}
    total = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            names = {i: m.name for i, m in plane.event_metadata.items()}
            for line in plane.lines:
                lname = line.name.lower()
                if "step" in lname or "xla modules" in lname:
                    continue  # avoid double counting; op lines only
                for ev in line.events:
                    nm = names.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    agg[nm] = agg.get(nm, 0.0) + dur
                    total += dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"total device op-ms (all iterations): {total:.1f}")
    for nm, ms in items:
        print(f"{ms:9.2f} ms  {nm[:140]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--decode", action="store_true",
                   help="profile the decode scan instead of encode")
    p.add_argument("--iters", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ralf_tpu.core.conditioning import build_forced_tokens
    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.data.dataset import (
        BatchLoader,
        DatasetConfig,
        SyntheticPosterDataset,
    )
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.models.ralf import RALFCore, RALFGenerator
    from ralf_tpu.retrieval.retriever import Retriever
    from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

    HW = (350, 240)
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=128)
    )
    gen = RALFGenerator(
        tok, GeneratorConfig(dtype=jnp.bfloat16), "uncond", image_hw=HW, top_k=16
    )
    variables = gen.init(jax.random.PRNGKey(0))
    gallery = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=256, seed=1, image_hw=HW
    )
    retriever = Retriever.build(gallery, "saliency")
    feats = gen.precompute_retrieved_feats(variables, retriever.layouts)
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=args.batch, seed=0, image_hw=HW
    )
    loader = RetrievalAugmentedLoader(
        BatchLoader(ds, args.batch, shuffle=False, seed=0), retriever,
        top_k=16, feats_table=feats,
    )
    batch = next(iter(loader))
    cond, _ = gen.build_condition(batch, np.random.default_rng(0), task="uncond")
    image = jnp.asarray(cond.image).astype(jnp.bfloat16)
    retrieved = {k: jnp.asarray(v)
                 for k, v in gen._retrieved_arrays(cond.retrieved).items()}
    const_seq = jnp.asarray(cond.const_seq)
    const_keep = jnp.asarray(cond.const_mask)

    enc = jax.jit(
        lambda v, im, r, cs, ck: gen.core.apply(
            v, im, r, cs, ck, False, method=RALFCore.encode_memory
        )
    )
    memory = enc(variables, image, retrieved, const_seq, const_keep)
    jax.block_until_ready(memory)

    if args.decode:
        sampling = SamplingConfig(name="top_p", top_p=0.9)
        forced = jnp.asarray(build_forced_tokens(cond, tok))
        dec = jax.jit(
            lambda v, m, f, k: gen.decode(v, m, f, sampling, k, kv_quant=True)
        )
        out = dec(variables, memory, forced, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        run = lambda i: dec(variables, memory, forced, jax.random.PRNGKey(i))
    else:
        imgs = [
            image + jax.random.normal(jax.random.PRNGKey(9 + i), image.shape,
                                      image.dtype) * 0.05
            for i in range(args.iters)
        ]
        jax.block_until_ready(imgs)
        run = lambda i: enc(variables, imgs[i], retrieved, const_seq, const_keep)

    trace_dir = tempfile.mkdtemp(prefix="ralf_prof_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(args.iters):
        jax.block_until_ready(run(i))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall for {args.iters} iters at B={args.batch}: {wall*1e3:.1f} ms")
    summarize_xplane(trace_dir)


if __name__ == "__main__":
    main()
