"""Headline benchmark: batched, KV-cached, constrained AR decode throughput
of the flagship RALF model on one TPU chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Contract (BASELINE.md): the reference measures "ms per sample" over
`model.sample` batches — 50 sequential full-prefix decoder forwards per
sample with host-side logit restriction, batch 128, one GPU.  The north
star is >=5,000 layouts/sec on a v5e-8 at parity quality, i.e. 625
layouts/sec/chip; vs_baseline is against that per-chip share.

This runs the COMPLETE sample path (ResNet50 image+saliency encoder,
frozen FIDNet over 16 retrieved layouts, cross-attn fusion, constraint
encoder, and the 50-step jitted decode scan with token-mask restriction +
top-p sampling), bf16 compute, reference canvas 350x240, sweeping batch
size and reporting the best.

Benchmark hygiene: the axon runtime memoizes executions whose input
buffers are identical, so every timed iteration perturbs the image batch
to force real execution.

`build_flagship` / `timed_throughput` are importable so one-off sweeps
(scripts/bench_b4096.py) measure the SAME adopted config instead of a
copy-pasted snapshot of it (ADVICE r2).
"""

import json
import os
import time
from types import SimpleNamespace

import numpy as np


def build_flagship(self_quant: bool | None = None) -> SimpleNamespace:
    """Construct the flagship RALF sample path + one B=1024 conditioned batch.

    Returns a namespace with `sample_fn(image, key)` closing over the adopted
    config (bf16 compute, int8 shared-memory decode, ENC_CHUNK=1024 chunked
    encode, top-p 0.9) and the tiled-batch source arrays.
    """
    import jax
    import jax.numpy as jnp

    from ralf_tpu.core.conditioning import build_forced_tokens
    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.models.ralf import RALFCore, RALFGenerator
    from ralf_tpu.retrieval.retriever import Retriever
    from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

    HW = (350, 240)  # reference canvas
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=128)
    )
    gen = RALFGenerator(
        tok, GeneratorConfig(dtype=jnp.bfloat16), "uncond", image_hw=HW, top_k=16
    )
    variables = gen.init(jax.random.PRNGKey(0))
    # pre-cast float PARAMS to the compute dtype (OFF by default —
    # measured 2491.6 vs the 2534-2542 band, i.e. neutral-to-worse: the
    # per-call f32->bf16 weight conversions the r4 encode profile showed
    # are async-overlapped by XLA, so removing them buys nothing and the
    # bf16 weight rounding costs a little; kept as an env toggle for
    # future toolchains).  batch_stats stay f32 either way.
    if os.environ.get("RALF_BENCH_BF16_PARAMS", "0") == "1":
        variables = dict(variables)
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables["params"],
        )
    sampling = SamplingConfig(name="top_p", top_p=0.9, temperature=1.0)
    key = jax.random.PRNGKey(0)

    gallery = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=256, seed=1, image_hw=HW
    )
    retriever = Retriever.build(gallery, "saliency")
    # frozen-tower gallery features precomputed ONCE (fixed gallery + frozen
    # FIDNet => pure function of the checkpoint); each sample call then
    # gathers [B,K,256] rows instead of running B*K FIDNet forwards
    gallery_feats = gen.precompute_retrieved_feats(variables, retriever.layouts)

    enc = jax.jit(
        lambda v, im, r, cs, ck: gen.core.apply(
            v, im, r, cs, ck, False, method=RALFCore.encode_memory
        )
    )
    # int8 shared-memory decode AND int8 per-token self caches: both
    # quality-gated on trained synthetic checkpoints (r3 gate, 15-epoch
    # flagship, greedy, 64 val canvases: kv+self_quant vs bf16 = 93.6%
    # token agreement, elem-count L1 5/64, align delta 8.5e-4, overlap
    # delta 2.1e-2 — same class as the kv_quant-only arm; BENCH_NOTES.md)
    if self_quant is None:
        self_quant = os.environ.get("RALF_BENCH_SELF_QUANT", "1") == "1"
    dec = jax.jit(
        lambda v, m, f, k: gen.decode(
            v, m, f, sampling, k, kv_quant=True, self_quant=self_quant
        )
    )

    # Chunk size for the chunked schedule (r5 re-sweep under per-chunk
    # decode, scripts/sweep_enc_chunk.py, B=4096 single-session arms:
    # 1024→2569.9, 512→2582.1, 256→2659.9, 128→2701.1, 64→1923 —
    # smaller chunks let the host enqueue chunk N+1's encode while chunk
    # N's decode still runs on device, overlapping dispatch with compute
    # until per-chunk dispatch overhead dominates at 64).  The r1-r4
    # value 1024 was tuned for the whole-batch-decode schedule's encode
    # memory ceiling.  Env-overridable for one-off sweeps.
    ENC_CHUNK = int(os.environ.get("RALF_BENCH_ENC_CHUNK", "128"))
    assert ENC_CHUNK > 0, (
        f"RALF_BENCH_ENC_CHUNK must be a positive int, got {ENC_CHUNK}")

    # one B=1024 retrieval-augmented batch, tiled on the batch axis: the
    # timed loop perturbs every canvas independently, so all tiled rows are
    # distinct work; tiling only avoids ~3min of host-side synthetic-data
    # setup that is not part of the measured path
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=1024, seed=0, image_hw=HW
    )
    loader = RetrievalAugmentedLoader(
        BatchLoader(ds, 1024, shuffle=False, seed=0), retriever, top_k=16,
        feats_table=gallery_feats,
    )
    batch1k = next(iter(loader))
    cond, _ = gen.build_condition(batch1k, np.random.default_rng(0), task="uncond")
    image1k = np.asarray(cond.image)
    retrieved1k = {
        k: np.asarray(v) for k, v in gen._retrieved_arrays(cond.retrieved).items()
    }
    const1k = np.asarray(cond.const_seq)
    keep1k = np.asarray(cond.const_mask)
    forced1k = np.asarray(build_forced_tokens(cond, tok))

    # schedule across ENC_CHUNK-sized chunks (scripts/probe_overlap.py, r5):
    #   whole   — encode all chunks, concat memory, one whole-batch decode
    #             (the r1-r4 adopted path)
    #   chunked — encode+decode per chunk in separate jits: the decode's KV
    #             caches stay at B=1024 working-set and the last chunk's
    #             decode issues immediately instead of waiting on a
    #             full-batch memory concat.  Measured 2570.4 vs 2539.1
    #             layouts/s at B=4096/4 chunks and 2507.9 vs 2481.2 at
    #             B=2048/2 (+1.2% at both operating points) — adopted.
    #   pipelined — fused encode(N+1)+decode(N) single program; won the
    #             first r5 session (+2.4% at B=2048) but LOST at
    #             B=4096/4 on re-measure (2496.3) — kept for probes only.
    SCHEDULE = os.environ.get("RALF_BENCH_SCHEDULE", "chunked")
    assert SCHEDULE in ("whole", "chunked", "pipelined"), SCHEDULE

    def sample_fn(image, retrieved, const_seq, const_keep, forced, key):
        B = image.shape[0]
        if SCHEDULE == "chunked" and B > ENC_CHUNK:
            outs = []
            for i, s in enumerate(range(0, B, ENC_CHUNK)):
                sl = slice(s, min(s + ENC_CHUNK, B))
                r = {k: a[sl] for k, a in retrieved.items()}
                mem = enc(variables, image[sl], r, const_seq[sl], const_keep[sl])
                outs.append(dec(variables, mem, forced[sl],
                                jax.random.fold_in(key, i)))
            return jnp.concatenate(outs, 0)
        mems = []
        for s in range(0, B, ENC_CHUNK):
            sl = slice(s, min(s + ENC_CHUNK, B))
            r = {k: a[sl] for k, a in retrieved.items()}
            mems.append(enc(variables, image[sl], r, const_seq[sl], const_keep[sl]))
        memory = (
            jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *mems)
            if len(mems) > 1
            else mems[0]
        )
        return dec(variables, memory, forced, key)

    return SimpleNamespace(
        gen=gen, tok=tok, variables=variables, sampling=sampling, key=key,
        retriever=retriever, cond=cond, self_quant=self_quant,
        sample_fn=sample_fn, image1k=image1k, retrieved1k=retrieved1k,
        const1k=const1k, keep1k=keep1k, forced1k=forced1k,
    )


def timed_throughput(setup: SimpleNamespace, B: int, iters: int = 5) -> tuple:
    """Time `iters` full sample passes at batch B; returns (layouts/s, times).

    Hygiene: each iteration gets a genuinely distinct perturbed canvas batch
    (the runtime memoizes identical executions) generated JUST before its
    timed region — only one perturbed batch is ever resident, so an OOM here
    is the measured path's, not the scaffolding's (ADVICE r2).  Raises
    AssertionError if any two outputs match (memoization polluted timing).
    """
    import jax
    import jax.numpy as jnp

    reps = B // setup.image1k.shape[0]
    tile = lambda a: np.concatenate([a] * reps, 0) if reps > 1 else a
    # feed pixels in compute dtype: an f32 image costs the first conv a
    # 1.4GB read at B=1024 (pixel data in [0,1] loses nothing in bf16)
    image = jnp.asarray(tile(setup.image1k)).astype(jnp.bfloat16)
    retrieved = {k: jnp.asarray(tile(v)) for k, v in setup.retrieved1k.items()}
    const_seq = jnp.asarray(tile(setup.const1k))
    const_keep = jnp.asarray(tile(setup.keep1k))
    forced = jnp.asarray(tile(setup.forced1k))

    out = setup.sample_fn(image, retrieved, const_seq, const_keep, forced,
                          setup.key)
    jax.block_until_ready(out)

    times, outs = [], []
    for i in range(iters):
        img_i = image + jax.random.normal(
            jax.random.PRNGKey(100 + i), image.shape, image.dtype
        ) * 0.05
        jax.block_until_ready(img_i)  # pre-generation excluded from timing
        t0 = time.perf_counter()
        out = setup.sample_fn(
            img_i, retrieved, const_seq, const_keep, forced,
            jax.random.fold_in(setup.key, i),
        )
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        outs.append(np.asarray(out).tobytes())
        del img_i
    assert len(set(outs)) == iters, "memoized executions polluted timing"
    return B / min(times), times


def bench_family(family: str, task: str = "uncond", B: int = 512,
                 iters: int = 4) -> dict:
    """Throughput of ANY experiment preset's full sample path at batch B
    (VERDICT r3 #4: the reference prints ms/sample per job across all 8
    families and 6 tasks — `inference.py:495`).  Reference-scale synthetic
    data (canvas 350x240, S=10), init weights, bf16 for the token models
    (the flagship bench config), f32 for the GAN/VAE families.

    Returns {"family", "task", "B", "layouts_per_sec", "ms_per_sample"}.
    """
    import jax
    import jax.numpy as jnp

    from ralf_tpu.config import build_config, build_generator, build_tokenizer
    from ralf_tpu.data.dataset import BatchLoader, SyntheticPosterDataset

    kwargs = dict(synthetic_data=True, allow_linear_fallback=True)
    cfg = build_config(family, **kwargs)
    cfg.auxiliary_task = task
    if cfg.tokenizer is not None:  # token models ride the bf16 bench config
        cfg.model["dtype"] = jnp.bfloat16

    tokenizer = build_tokenizer(cfg) if cfg.tokenizer is not None else None
    gen = build_generator(cfg, tokenizer)
    variables = ({"params": {}} if cfg.experiment == "retriever"
                 else gen.init(jax.random.PRNGKey(0)))
    sampling = cfg.sampling

    src = min(B, 512)
    ds = SyntheticPosterDataset(cfg.dataset, size=src, seed=0)
    loader = BatchLoader(ds, src, shuffle=False, seed=0,
                         transforms=cfg.transforms)
    needs_retrieval = (cfg.experiment == "ralf"
                       or cfg.generator_kwargs.get("with_retrieval"))
    if needs_retrieval:
        from ralf_tpu.retrieval.retriever import Retriever
        from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

        gallery = SyntheticPosterDataset(cfg.dataset, size=256, seed=1)
        retriever = Retriever.build(gallery, "saliency")
        feats = (gen.precompute_retrieved_feats(variables, retriever.layouts)
                 if hasattr(gen, "precompute_retrieved_feats") else None)
        loader = RetrievalAugmentedLoader(
            loader, retriever, cfg.generator_kwargs.get("top_k", 16),
            feats_table=feats)
    batch = next(iter(loader))
    reps = B // src
    if reps > 1:
        tile = lambda a: np.concatenate([a] * reps, 0)
        batch = jax.tree.map(
            lambda a: tile(np.asarray(a)) if hasattr(a, "shape")
            and getattr(a, "ndim", 0) >= 1 and a.shape[0] == src else a,
            batch)

    is_token = tokenizer is not None
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # Sample through the 1-device mesh sampler's JITTED program — the one
    # cli/inference uses (parallel/zoo) — with all conditioning built ONCE
    # and device-resident, and ONLY the canvas perturbed (on device) per
    # timed iteration.  Same methodology as the flagship headline: through
    # a remote-TPU tunnel, re-uploading a B=512 f32 image batch per call
    # (~700MB) would otherwise dominate and measure the link, not the chip.
    from ralf_tpu.parallel.decode import make_decode_mesh
    from ralf_tpu.parallel.zoo import build_mesh_sampler

    is_ar = cfg.experiment in ("ralf", "autoreg")
    ms = build_mesh_sampler(
        gen, make_decode_mesh(jax.devices()[:1]), sampling, task=task,
        # AR families ride the adopted flagship decode config (BENCH_NOTES
        # quality gates); other families have no int8 cache path
        kv_quant=is_ar, self_quant=is_ar,
    )
    name = type(ms).__name__
    dev = lambda tree: jax.tree.map(jnp.asarray, tree)

    if is_token:
        cond, _ = gen.build_condition(batch, rng, task=task)
    img_dtype = jnp.bfloat16 if cfg.tokenizer is not None else jnp.float32

    if name in ("MeshSampler", "RelationMeshSampler"):
        from ralf_tpu.core.conditioning import build_forced_tokens

        if name == "RelationMeshSampler":
            a, _ = ms._prepare(cond)
            args = dev((a["const_seq"], a["const_keep"], a["retrieved"],
                        a["forced"], a["tensors"]))
            image0 = jnp.asarray(a["image"], img_dtype)
            call = lambda img, k: ms._fn(variables, img, args[0], args[1],
                                         args[2], args[3], args[4], k)
        else:
            forced = np.asarray(build_forced_tokens(cond, gen.tokenizer))
            retrieved = (dev(gen._retrieved_arrays(cond.retrieved))
                         if hasattr(gen, "_retrieved_arrays") else {})
            cs, ck, fc = dev((np.asarray(cond.const_seq),
                              np.asarray(cond.const_mask), forced))
            image0 = jnp.asarray(np.asarray(cond.image), img_dtype)
            call = lambda img, k: ms._fn(variables, img, cs, ck, retrieved,
                                         fc, k)
    elif name == "MaskGITMeshSampler":
        image_, seq_user, known_user, enk, _ = ms._prepare(cond)
        image0 = image_.astype(img_dtype)
        fn = ms._fn(enk)
        call = lambda img, k: fn(variables, img, seq_user, known_user, k)
    elif name == "DiffusionMeshSampler":
        prepared, ts, skips, _ = ms._prepare(cond, key)
        prepared = dev(prepared)
        image0 = jnp.asarray(prepared["image"], img_dtype)
        fn = ms._fn()
        call = lambda img, k: fn(variables, {**prepared, "image": img},
                                 ts, skips, k)
    elif name == "GANMeshSampler":
        inputs, _ = ms._prepare(batch, rng)
        inputs = dev(inputs)
        image0 = jnp.asarray(inputs["image"], img_dtype)
        fn = ms._fn()
        call = lambda img, k: fn(variables, {**inputs, "image": img})
    elif name == "ICVTMeshSampler":
        image_, z, _ = ms._prepare(batch, rng, key)
        image0 = jnp.asarray(image_, img_dtype)
        z = jnp.asarray(z)
        fn = ms._fn()
        call = lambda img, k: fn(variables, img, z)
    else:  # RetrieverMeshSampler
        image0 = jnp.asarray(ms._pad(np.asarray(batch["image"]),
                                     ms._rows(B)), img_dtype)
        feats = jnp.asarray(gen.retriever.features)
        fn = ms._fn()
        call = lambda img, k: fn(img.astype(jnp.float32), feats)

    image0 = jax.block_until_ready(image0)

    def run(i: int):
        img_i = image0 + jax.random.normal(
            jax.random.PRNGKey(100 + i), image0.shape, image0.dtype) * 0.05
        jax.block_until_ready(img_i)  # perturbation excluded from timing
        t0 = time.perf_counter()
        out = call(img_i, jax.random.fold_in(key, i))
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        leaves = jax.tree.leaves(out)
        return dt, np.asarray(leaves[0]).tobytes()

    run(0)  # warm / compile
    times, outs = [], []
    for i in range(iters):
        dt, o = run(i + 1)
        times.append(dt)
        outs.append(o)
    assert len(set(outs)) == iters or cfg.experiment == "retriever", \
        "memoized executions polluted timing"
    best = min(times)
    return {
        "family": family, "task": task, "B": B,
        "layouts_per_sec": round(B / best, 1),
        "ms_per_sample": round(1000.0 * best / B, 3),
    }


def main() -> None:
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None,
                    help="experiment preset (ralf/autoreg/maskgit/layoutdm/"
                         "vqdiffusion/cglgan/dsgan/icvt/retriever/...); "
                         "default = the flagship headline bench")
    ap.add_argument("--task", default="uncond")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.family is not None:
        r = bench_family(args.family, args.task, args.batch, args.iters)
        print(json.dumps({
            "metric": f"layouts/sec/chip ({r['family']} {r['task']} full "
                      f"sample path, B={r['B']})",
            "value": r["layouts_per_sec"],
            "unit": "layouts/sec",
            "ms_per_sample": r["ms_per_sample"],
            "vs_baseline": round(r["layouts_per_sec"] / (5000.0 / 8.0), 3),
        }))
        return

    setup = build_flagship()

    best, best_B = 0.0, 0
    for B in (2048, 4096):
        tput, _ = timed_throughput(setup, B)
        if tput > best:
            best, best_B = tput, B

    # v5e-8 projection: verify the mesh-sharded sample program (the path
    # cli/inference uses on >1 device — parallel/decode.MeshSampler) compiles
    # on this chip with NO cross-device collectives and NO host syncs, so
    # multi-chip throughput is n_chips x per-chip (dryrun_multichip further
    # checks token-identity on an 8-device virtual mesh).
    from ralf_tpu.parallel.decode import MeshSampler, make_decode_mesh

    cond = setup.cond
    ms = MeshSampler(setup.gen, make_decode_mesh(jax.devices()[:1]),
                     setup.sampling, kv_quant=True, self_quant=setup.self_quant)
    small = {k: v[:8] for k, v in setup.retrieved1k.items()}
    cond_small = type(cond)(
        image=setup.image1k[:8], task=cond.task, const_seq=setup.const1k[:8],
        const_mask=setup.keep1k[:8], retrieved=small,
        seq=None if cond.seq is None else cond.seq[:8],
        seq_mask=None if cond.seq_mask is None else cond.seq_mask[:8],
    )
    ms.compile_and_verify(setup.variables, cond_small, setup.key)

    per_chip_target = 5000.0 / 8.0
    # regression tripwire (VERDICT r4 weak #5): anything under 2,550/s is
    # a real regression, not run noise — fail the bench instead of quietly
    # reporting it.  2550 trips on a fallback to the r3/r4
    # whole-batch-decode band (2532-2542) while leaving the r5 headline
    # (2689.8, chunked schedule at ENC_CHUNK=128) ~5% of tunnel-variance
    # headroom — see BENCH_NOTES.md.
    BENCH_FLOOR = 2550.0
    assert best >= BENCH_FLOOR, (
        f"throughput regression: {best:.1f} layouts/s/chip < floor "
        f"{BENCH_FLOOR} (r5=2689.8 at ENC_CHUNK=128 chunked schedule; "
        f"see BENCH_NOTES.md)")
    print(
        json.dumps(
            {
                "metric": f"layouts/sec/chip (full RALF sample: encode+KV-cached constrained decode, B={best_B}, bf16 compute, int8 shared memory + int8 self caches, top-p; sharded program verified collective/host-sync free => v5e-8 projection = 8x)",
                "value": round(best, 2),
                "unit": "layouts/sec",
                "vs_baseline": round(best / per_chip_target, 3),
                "projected_v5e8": round(best * 8, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
