"""Headline benchmark: batched, KV-cached, constrained AR decode throughput
of the flagship RALF model on one TPU chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Contract (BASELINE.md): the reference measures "ms per sample" over
`model.sample` batches (batch_size=128, 1 GPU) — 50 sequential full-prefix
decoder forwards per batch with host-side logit restriction.  The north
star is >=5,000 layouts/sec on a v5e-8 at parity quality, i.e. 625
layouts/sec/chip; vs_baseline is measured against that per-chip share.

This benchmark runs the COMPLETE sample path (image+saliency encoder,
frozen FIDNet over 16 retrieved layouts, fusion, constraint encoder, and
the 50-step jitted decode scan with token-mask + forced-token restriction),
bf16 compute, on synthetic reference-shaped inputs.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.data.dataset import DatasetConfig, SyntheticPosterDataset, BatchLoader
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.models.ralf import RALFGenerator
    from ralf_tpu.retrieval.retriever import Retriever
    from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

    B = 128  # reference inference batch size (`config/__init__.py:57`)
    HW = (350, 240)  # reference canvas
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=128)
    )
    gen = RALFGenerator(
        tok,
        GeneratorConfig(dtype=jnp.bfloat16),
        auxiliary_task="uncond",
        image_hw=HW,
        top_k=16,
    )
    variables = gen.init(jax.random.PRNGKey(0))

    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=B, seed=0, image_hw=HW)
    gallery = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=256, seed=1, image_hw=HW)
    retriever = Retriever.build(gallery, "saliency")
    loader = RetrievalAugmentedLoader(
        BatchLoader(ds, B, shuffle=False, seed=0), retriever, top_k=16
    )
    batch = next(iter(loader))
    rng = np.random.default_rng(0)
    cond, _ = gen.build_condition(batch, rng, task="uncond")
    sampling = SamplingConfig(name="top_p", top_p=0.9, temperature=1.0)

    # one jitted program: memory encode + 50-step decode scan
    from ralf_tpu.core.conditioning import build_forced_tokens

    forced = jnp.asarray(build_forced_tokens(cond, tok))
    image = jnp.asarray(cond.image)
    retrieved = gen._retrieved_arrays(cond.retrieved)
    const_seq = jnp.asarray(cond.const_seq)
    const_keep = jnp.asarray(cond.const_mask)

    from ralf_tpu.models.ralf import RALFCore

    def sample_fn(variables, image, retrieved, const_seq, const_keep, forced, key):
        memory = gen.core.apply(
            variables, image, retrieved, const_seq, const_keep, False,
            method=RALFCore.encode_memory,
        )
        return gen.decode(variables, memory, forced, sampling, key)

    fn = jax.jit(sample_fn)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    out = fn(variables, image, retrieved, const_seq, const_keep, forced, key)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(
            variables, image, retrieved, const_seq, const_keep, forced,
            jax.random.fold_in(key, i),
        )
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    layouts_per_sec = B * iters / dt
    per_chip_target = 5000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "layouts/sec/chip (batched KV-cached constrained AR decode, RALF, B=128, bf16)",
                "value": round(layouts_per_sec, 2),
                "unit": "layouts/sec",
                "vs_baseline": round(layouts_per_sec / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
