"""Batch inference entry point.

Reference equivalent: `python -m image2layout.train.inference job_dir=...`
(`image2layout/train/inference.py`) plus its single-canvas and
unannotated-split variants (`inference_single_data.py`,
`inference_unanno.py`) behind flags:

    python -m ralf_tpu.cli.inference --job-dir tmp/jobs/ralf_pku \
        --cond uncond --split test --num-seeds 3
    python -m ralf_tpu.cli.inference --job-dir ... --single-image img.png
    python -m ralf_tpu.cli.inference --job-dir ... --unannotated

Writes per (split, seed): `{split}_{seed}.pkl` (results list of
per-sample layout dicts), `{split}_{seed}_violation.csv`, and the
"ms per sample" timing line the reference prints (`inference.py:495`).
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import pickle
import time

import numpy as np


def layout_to_records(layout, ids) -> list[dict]:
    out = []
    lab = np.asarray(layout.label)
    mask = np.asarray(layout.mask)
    geos = {k: np.asarray(layout.geo(k)) for k in
            ("center_x", "center_y", "width", "height")}
    for b in range(lab.shape[0]):
        m = mask[b]
        rec = {"id": ids[b] if ids is not None else b,
               "label": lab[b][m].tolist()}
        for k, v in geos.items():
            rec[k] = v[b][m].tolist()
        out.append(rec)
    return out


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--job-dir", required=True)
    p.add_argument("--ckpt", default="final")
    p.add_argument("--cond", default="uncond",
                   choices=["uncond", "c", "cwh", "partial", "refinement",
                            "relation", "gt"])
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--num-seeds", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--single-image", default=None,
                   help="run on one canvas (inference_single_data equivalent)")
    p.add_argument("--unannotated", action="store_true",
                   help="no-GT split (inference_unanno equivalent)")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--topk", type=int, default=None,
                   help="inference-time retrieval k override — the paper's "
                        "dynamic top-k sweep (reference inference.py:331-339)")
    p.add_argument("--no-backtrack", action="store_true",
                   help="disable backtracking in relation-constrained decode "
                        "(the reference's backtrack=False sweep arm)")
    p.add_argument("--max-retries", type=int, default=8,
                   help="relation-decode backtracking budget (violations "
                        "fall monotonically with retries: 59.5%% at 0 -> "
                        "23.6%% at 12 on the synthetic relation model; the "
                        "default R=8 BEATS the reference automaton 1.4x on "
                        "violations at ~21x lower latency — MODELS_E2E.md; "
                        "R=4 trades ~23%% fewer violations back for ~30%% "
                        "faster decode). "
                        "SEMANTIC DELTA vs the reference: the reference's "
                        "relation automaton (relation_restriction.py) prunes "
                        "the token space IN-LOOP during generation; this "
                        "rebuild instead samples up to max-retries candidate "
                        "elements per position from the same KV snapshot and "
                        "keeps the fewest-violations one (post-hoc scoring, "
                        "whole batch in one jitted scan — see "
                        "ops/relation_decode.py). Matched-weights violation "
                        "rates for both: scripts/compare_relation_decode.py")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 shared-memory decode (1.13x; layout metrics "
                        "at parity with bf16 on trained checkpoints)")
    p.add_argument("--self-quant", action="store_true",
                   help="int8 per-token self-attention caches in the decode "
                        "scan (AR models only; scales fold exactly)")
    p.add_argument("--mesh", default="auto", choices=["auto", "on", "off"],
                   help="run sampling through the mesh-sharded jitted "
                        "program (parallel/zoo.build_mesh_sampler — covers "
                        "every experiment preset incl. the relation retry "
                        "decode). auto/on = always (on ONE device it is the "
                        "same program, just jitted+cached instead of "
                        "eagerly dispatched); off = the eager per-family "
                        "sample paths")
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
    from ralf_tpu.eval.violations import calculate_violation

    cfg = FrameworkConfig.load(args.job_dir)
    num_seeds = args.num_seeds or cfg.num_seeds
    # dynamic-topk / no-backtrack sweep arms get their own sample dirs,
    # mirroring the reference's job-dir naming (`inference.py:331-366`)
    suffix = ""
    if args.topk is not None:
        suffix += f"_dynamictopk_{args.topk}"
    if args.no_backtrack:
        suffix += "_nobacktrack"
    out_dir = args.out_dir or os.path.join(
        args.job_dir, f"generated_samples_{args.cond}{suffix}"
    )
    os.makedirs(out_dir, exist_ok=True)

    train_ds, val_ds, test_ds = build_datasets(cfg)
    ds = {"val": val_ds, "test": test_ds}[args.split]
    if args.unannotated:
        # `with_no_annotation` split: real canvases, no GT layouts
        # (`inference_unanno.py`); parquet dumps expose it as a 4th dir,
        # synthetic runs reuse the test set with GT ignored
        try:
            from ralf_tpu.data.dataset import HFParquetDataset

            ds = HFParquetDataset(cfg.dataset, "with_no_annotation")
        except Exception:
            logging.warning("no with_no_annotation split; using %s canvases",
                            args.split)
    tokenizer = build_tokenizer(cfg)
    gen = build_generator(cfg, tokenizer)

    # precomputed relation-clause table (valid only under deterministic
    # element order — clause letters index into the sorted layout)
    if (args.cond == "relation" and hasattr(gen, "relationships_table")
            and set(cfg.transforms) <= {"image", "sort_label",
                                        "sort_lexicographic"}):
        from ralf_tpu import cache as cache_mod

        gen.relationships_table = cache_mod.load_relationships(
            cfg.cache_dir, cfg.dataset.name
        )

    # restore the trained params (the retriever baseline is non-learnable:
    # no checkpoint exists, the gallery was rebuilt by build_generator)
    if cfg.experiment == "retriever":
        variables = {"params": {}}
    else:
        from ralf_tpu.train.trainer import TrainConfig, Trainer

        trainer = Trainer(gen, cfg.train)
        state = trainer.restore(args.ckpt)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    loader = BatchLoader(ds, args.batch_size, shuffle=False,
                         transforms=cfg.transforms, drop_last=False,
                         seed=0)
    needs_retrieval = cfg.experiment == "ralf" or cfg.generator_kwargs.get(
        "with_retrieval"
    )
    if needs_retrieval:
        from ralf_tpu import cache as cache_mod
        from ralf_tpu.retrieval.retriever import Retriever
        from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

        retriever = Retriever.build(
            train_ds, cache_dir=cfg.cache_dir, dataset_name=cfg.dataset.name
        )
        top_k = args.topk or cfg.generator_kwargs.get("top_k", 16)
        table = None
        if not args.unannotated:  # cached tables are keyed by the GT split
            # cached tables hold the TRAIN-config k columns; a dynamic-topk
            # override within that width slices, a wider one re-queries
            table = cache_mod.load_retrieval_table(
                cfg.cache_dir, cfg.dataset.name, args.split,
                retriever.backbone_name,
                cfg.generator_kwargs.get("top_k", 16), expect_rows=len(ds),
            )
            if table is not None and table.shape[1] < top_k:
                table = None
        # RALF-family: precompute the frozen layout tower's gallery features
        # once per run (fixed gallery + frozen FIDNet => pure function of the
        # checkpoint); skips the per-batch B*K FIDNet forward in the model
        feats_table = None
        if hasattr(gen, "precompute_retrieved_feats"):
            feats_table = gen.precompute_retrieved_feats(
                variables, retriever.layouts
            )
        loader = RetrievalAugmentedLoader(loader, retriever, top_k, table=table,
                                          feats_table=feats_table)

    if args.single_image:
        # single-canvas demo (`inference_single_data.py:39-43`): a B=1
        # batch with a placeholder layout (a bare canvas has no GT, so
        # conditional tasks see zero constrained elements) and, for
        # retrieval models, neighbors fetched for THIS query image
        from ralf_tpu.core.layout import Layout

        img = _load_single_image(args.single_image, cfg)
        S = cfg.dataset.max_seq_length
        zeros = np.zeros((1, S), np.float32)
        batch = {
            "layout": Layout(
                label=np.zeros((1, S), np.int32),
                center_x=zeros, center_y=zeros.copy(),
                width=zeros.copy(), height=zeros.copy(),
                mask=np.zeros((1, S), bool),
            ),
            "image": img,
            "id": np.asarray([0]),
            "indices": np.asarray([0]),
        }
        if needs_retrieval:
            nbrs = np.asarray(retriever.topk(retriever.embed(img), top_k))
            batch["retrieved"] = retriever.gather_neighbors(nbrs)
            if feats_table is not None:
                batch["retrieved"]["feats"] = feats_table[nbrs]
            batch["retrieved_indices"] = nbrs
        batches = [batch]
    else:
        batches = list(loader)

    sampling = cfg.sampling
    is_token_model = tokenizer is not None

    # multi-chip decode: one jitted per-row sample program, batch sharded
    # over the mesh, params replicated (the v5e-8 north-star path —
    # BASELINE.md).  build_mesh_sampler dispatches per family: AR decode
    # scan, the relation retry decode, MaskGIT's mask-predict loop, the
    # diffusion scan, GAN/ICVT forwards and the retriever top-1.
    mesh_sampler = None
    # engage on ANY device count: on 1 device the mesh program is simply
    # the jitted+cached version of the same sample path (the eager
    # gen.sample routes re-trace per batch — measured 67.8 ms/sample for
    # MaskGIT through a remote-TPU link vs 0.55 jitted)
    want_mesh = args.mesh != "off"
    if want_mesh:
        from ralf_tpu.parallel.decode import make_decode_mesh
        from ralf_tpu.parallel.zoo import build_mesh_sampler

        mesh_sampler = build_mesh_sampler(
            gen, make_decode_mesh(), sampling, task=args.cond,
            kv_quant=args.kv_quant, self_quant=args.self_quant,
            use_backtrack=not args.no_backtrack,
            max_retries=args.max_retries,
        )
        logging.info("mesh inference (%s) over %d device(s), %d batch "
                     "shard(s)", type(mesh_sampler).__name__,
                     len(jax.devices()), mesh_sampler.num_shards)

    for seed in range(num_seeds):
        pkl_path = os.path.join(out_dir, f"{args.split}_{seed}.pkl")
        if os.path.exists(pkl_path):
            logging.info("skip existing %s", pkl_path)  # resume (`inference.py:364`)
            continue
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        results, violations = [], {"total": 0, "viorated": 0}
        t_total, n_total = 0.0, 0
        for batch in batches:
            t0 = time.perf_counter()
            if is_token_model:
                cond, _ = gen.build_condition(batch, rng, task=args.cond) \
                    if hasattr(gen, "build_condition") else (None, None)
                if mesh_sampler is not None:
                    # kv/self-quant, backtracking and retries were baked into
                    # the mesh sampler at construction (build_mesh_sampler
                    # validates them per family and fails loudly)
                    layout, seq = mesh_sampler.sample(
                        variables, cond,
                        jax.random.fold_in(key, len(results)),
                        return_tokens=True,
                    )
                else:
                    # eager fallback (--mesh off): kv_quant only exists on
                    # the AR decode path; other token models (maskgit/
                    # diffusion) fail loudly if requested
                    extra = {"kv_quant": True} if args.kv_quant else {}
                    if args.self_quant:
                        extra["self_quant"] = True
                    if args.cond == "relation":
                        if args.no_backtrack:
                            extra["use_backtrack"] = False
                        else:
                            extra["max_retries"] = args.max_retries
                    out = gen.sample(variables, cond, sampling,
                                     jax.random.fold_in(key, len(results)),
                                     return_tokens=True, **extra)
                    layout, seq = out if isinstance(out, tuple) else (out, None)
                jax.block_until_ready(layout.label)
                if seq is not None and cond is not None:
                    v = calculate_violation(cond, np.asarray(seq), layout, tokenizer)
                    violations["total"] += v["total"]
                    violations["viorated"] += v["viorated"]
            else:
                if mesh_sampler is not None:
                    layout = mesh_sampler.sample(variables, batch, rng)
                else:
                    layout = gen.sample(variables, batch, rng)
                jax.block_until_ready(layout.label)
            t_total += time.perf_counter() - t0
            n_total += np.asarray(layout.label).shape[0]
            results.extend(layout_to_records(layout, batch.get("id")))

        with open(pkl_path, "wb") as f:
            pickle.dump({"results": results, "cond": args.cond,
                         "split": args.split, "seed": seed}, f)
        with open(os.path.join(out_dir, f"{args.split}_{seed}_violation.csv"),
                  "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["total", "viorated", "rate"])
            rate = violations["viorated"] / max(violations["total"], 1)
            w.writerow([violations["total"], violations["viorated"], rate])
        ms = 1000.0 * t_total / max(n_total, 1)
        print(f"seed {seed}: {ms:.3f} ms per sample "
              f"({n_total / max(t_total, 1e-9):.1f} layouts/sec)")
    print(f"wrote {out_dir}")


def _load_single_image(path: str, cfg) -> np.ndarray:
    """Load + resize one canvas; saliency falls back to a center prior when
    no saliency model weights are available."""
    from PIL import Image

    H, W = cfg.dataset.image_h, cfg.dataset.image_w
    img = np.asarray(
        Image.open(path).convert("RGB").resize((W, H)), np.float32
    ) / 255.0
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    sal = np.exp(-(xx**2 + yy**2) / 0.5).astype(np.float32)
    return np.concatenate([img, sal[..., None]], -1)[None]


if __name__ == "__main__":
    main()
