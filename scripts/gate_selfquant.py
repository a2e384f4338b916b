"""Quality gate for int8 per-token SELF-attention caches (self_quant).

Compares greedy decode on a trained flagship checkpoint in three arms —
bf16, kv_quant (the current bench config), kv_quant+self_quant — on real
val canvases, reporting token agreement, element-count L1, and the
alignment/overlap heuristic-metric deltas (the same evidence format as
the int8 shared-memory gate in BENCH_NOTES.md).

Usage: python scripts/gate_selfquant.py --job-dir tmp/jobs/<ralf job> [--n 64]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--job-dir", required=True)
    p.add_argument("--n", type=int, default=64)
    args = p.parse_args()

    import jax

    from ralf_tpu.config import (
        FrameworkConfig,
        build_datasets,
        build_generator,
        build_tokenizer,
    )
    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.data.dataset import BatchLoader
    from ralf_tpu.eval.metrics import compute_alignment, compute_overlap
    from ralf_tpu.retrieval.retriever import Retriever
    from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader
    from ralf_tpu.train.trainer import Trainer

    cfg = FrameworkConfig.load(args.job_dir)
    train_ds, val_ds, _ = build_datasets(cfg)
    tokenizer = build_tokenizer(cfg)
    gen = build_generator(cfg, tokenizer)
    trainer = Trainer(gen, cfg.train)
    state = trainer.restore("best")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    loader = BatchLoader(val_ds, args.n, shuffle=False,
                         transforms=cfg.transforms, seed=0)
    retriever = Retriever.build(train_ds, cache_dir=cfg.cache_dir,
                                dataset_name=cfg.dataset.name)
    top_k = cfg.generator_kwargs.get("top_k", 16)
    feats = gen.precompute_retrieved_feats(variables, retriever.layouts)
    loader = RetrievalAugmentedLoader(loader, retriever, top_k=top_k,
                                      feats_table=feats)
    batch = next(iter(loader))
    cond, _ = gen.build_condition(batch, np.random.default_rng(0), task="uncond")
    sampling = SamplingConfig(name="deterministic")
    key = jax.random.PRNGKey(0)

    arms = {
        "bf16": dict(kv_quant=False, self_quant=False),
        "kv_quant": dict(kv_quant=True, self_quant=False),
        "kv+self_quant": dict(kv_quant=True, self_quant=True),
    }
    outs = {}
    for name, kw in arms.items():
        layout, seq = gen.sample(variables, cond, sampling, key,
                                 return_tokens=True, **kw)
        jax.block_until_ready(seq)
        align = float(np.mean(np.asarray(compute_alignment(layout))))
        over = float(np.mean(np.asarray(compute_overlap(layout))))
        outs[name] = dict(seq=np.asarray(seq),
                          counts=np.asarray(layout.mask).sum(-1),
                          align=align, overlap=over)
        print(f"{name:>14}: alignment={align:.5f} overlap={over:.5f}")

    ref = outs["bf16"]
    for name in ("kv_quant", "kv+self_quant"):
        o = outs[name]
        agree = float(np.mean(o["seq"] == ref["seq"]))
        dl1 = int(np.abs(o["counts"] - ref["counts"]).sum())
        print(
            f"{name:>14} vs bf16: token agreement {agree:.3f}, "
            f"elem-count L1 {dl1}/{args.n}, "
            f"align delta {abs(o['align'] - ref['align']):.2e}, "
            f"overlap delta {abs(o['overlap'] - ref['overlap']):.2e}"
        )


if __name__ == "__main__":
    main()
