"""Training-performance contract (VERDICT r4 #1): measured steps/sec and
layouts-trained/sec on the real chip at reference scale, for the flagship
RALF AdamW path, one GAN family (dual gen/dis steps + on-device JV
matcher) and one diffusion family, plus

  * a component breakdown of the flagship train step (encode fwd, loss
    fwd, fwd+bwd, full step incl. AdamW) from separately jitted
    sub-programs — each timed on device with evolving inputs, and
  * an input-pipeline saturation check: host loader + preprocess
    throughput (BatchLoader [+ RetrievalAugmentedLoader] + native collate
    + gen.preprocess) vs the device step — the chip starves iff
    host_batches/sec < device_steps/sec (prefetch overlaps the two).

Reference surface: the train hot loop `image2layout/train/train.py:409-489`
(per-batch fwd/bwd dominated by ResNet50 over 240x350x4 + k=16 frozen
FIDNet encodes, SURVEY §3.1).  The multichip side of the contract lives in
`__graft_entry__.dryrun_multichip`, which asserts the dp train-step HLO is
all-reduce-only.

Usage:
    python scripts/bench_train.py                       # full table
    python scripts/bench_train.py --families ralf --batches 64
Writes one JSON line per row; optionally --out bench_train.json.

Benchmark hygiene (see BENCH_NOTES): the optimizer state evolves every
step, so no two step executions see identical buffers (the axon runtime's
execution memoization cannot short-circuit them); timings are end-to-end
wall over >=steps with a block_until_ready tail, after discarding warmup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HW = (350, 240)  # reference canvas (global_variables.py:4-5, HxW)
S = 10


def _flagship(top_k=16):
    import jax

    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.models.ralf import RALFGenerator

    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=128))
    gen = RALFGenerator(tok, GeneratorConfig(), "uncond", image_hw=HW,
                        top_k=top_k)
    return gen, tok


def _dataset(n, seed=0):
    from ralf_tpu.data.dataset import DatasetConfig, SyntheticPosterDataset

    return SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=n,
                                  seed=seed, image_hw=HW)


def _loader(ds, B, *, retrieval=False, top_k=16, prefetch=2):
    from ralf_tpu.data.dataset import BatchLoader

    loader = BatchLoader(ds, B, shuffle=True, seed=0, prefetch=prefetch)
    if retrieval:
        from ralf_tpu.retrieval.retriever import Retriever
        from ralf_tpu.retrieval.wrapper import RetrievalAugmentedLoader

        retriever = Retriever.build(ds, "saliency")
        loader = RetrievalAugmentedLoader(loader, retriever, top_k=top_k,
                                          is_train_split=True)
    return loader


def _timed_steps(step, state_and_args, steps, warmup, get_state):
    """Run `steps` donated train steps after `warmup`; the state threads
    through so every execution sees fresh buffers."""
    import jax

    carry = state_and_args
    for _ in range(warmup):
        carry = step(carry)
    jax.block_until_ready(jax.tree.leaves(carry[0])[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = step(carry)
    jax.block_until_ready(jax.tree.leaves(get_state(carry))[0])
    dt = time.perf_counter() - t0
    return steps / dt, carry


def bench_family(family: str, B: int, steps: int, warmup: int) -> dict:
    import jax

    from ralf_tpu.train.trainer import TrainConfig, Trainer

    tcfg = TrainConfig(epochs=1, batch_size=B, lr=1e-4,
                       job_dir="/tmp/bench_train_job")
    rng = np.random.default_rng(0)

    if family == "ralf":
        gen, _ = _flagship()
        ds = _dataset(max(2 * B, 256))
        loader = _loader(ds, B, retrieval=True)
        trainer = Trainer(gen, tcfg)
        batch = next(iter(loader))
        inputs, targets = gen.preprocess(batch, rng)
        inputs, targets = trainer._device_batch(inputs, targets)
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        key = jax.random.PRNGKey(1)

        def step(carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = trainer._train_step(st, inputs, targets, sub)
            return (st, k)

        sps, _ = _timed_steps(step, (state, key), steps, warmup,
                              lambda c: c[0])
        return {"family": "ralf(AdamW)", "B": B, "steps_per_sec": sps,
                "layouts_trained_per_sec": sps * B}

    if family == "cglgan":
        from ralf_tpu.models.base import GeneratorConfig
        from ralf_tpu.models.cgl_gan import CGLGANGenerator
        from ralf_tpu.train.gan_trainer import GANTrainer

        gen = CGLGANGenerator(num_labels=3, cfg=GeneratorConfig(),
                              image_hw=HW)
        ds = _dataset(max(2 * B, 256))
        loader = _loader(ds, B)
        trainer = GANTrainer(gen, tcfg)
        batch = next(iter(loader))
        inputs, targets = gen.preprocess(batch, rng)
        inputs, targets = trainer._device_batch(inputs, targets)
        g_state, d_state = trainer.init_states(jax.random.PRNGKey(0))
        trainer._build_gan_steps()
        key = jax.random.PRNGKey(1)

        def step(carry):
            gs, dstate, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            gs, _ = trainer._train_step(gs, dstate, inputs, targets, k1)
            dstate, _ = trainer._dis_step(dstate, gs, inputs, targets, k2)
            return (gs, dstate, k)

        sps, _ = _timed_steps(step, (g_state, d_state, key), steps, warmup,
                              lambda c: c[0])
        # one "step" = one generator update + one discriminator update
        # (the reference's per-batch pair, train.py:449-473)
        return {"family": "cglgan(gen+dis,JV)", "B": B, "steps_per_sec": sps,
                "layouts_trained_per_sec": sps * B}

    if family == "layoutdm":
        from ralf_tpu.core.tokenizer import (
            LayoutSequenceTokenizer,
            TokenizerConfig,
        )
        from ralf_tpu.models.base import GeneratorConfig
        from ralf_tpu.models.diffusion import LayoutDMGenerator

        tok = LayoutSequenceTokenizer(
            TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=128,
                            special_tokens=("pad", "mask")))
        gen = LayoutDMGenerator(tok, GeneratorConfig(), num_timesteps=100,
                                q_type="constrained", pos_emb="elem_attr",
                                image_hw=HW)
        ds = _dataset(max(2 * B, 256))
        loader = _loader(ds, B)
        trainer = Trainer(gen, tcfg)
        batch = next(iter(loader))
        inputs, targets = gen.preprocess(batch, rng)
        inputs, targets = trainer._device_batch(inputs, targets)
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        key = jax.random.PRNGKey(1)

        def step(carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = trainer._train_step(st, inputs, targets, sub)
            return (st, k)

        sps, _ = _timed_steps(step, (state, key), steps, warmup,
                              lambda c: c[0])
        return {"family": "layoutdm(AdamW)", "B": B, "steps_per_sec": sps,
                "layouts_trained_per_sec": sps * B}

    raise ValueError(family)


def breakdown_flagship(B: int, steps: int, warmup: int) -> dict:
    """Component times of one flagship train step from separately jitted
    sub-programs (each timed with a fresh perturbed input so no execution
    memoizes): encode fwd | full loss fwd | fwd+bwd | full step."""
    import jax
    import jax.numpy as jnp

    from ralf_tpu.train.trainer import TrainConfig, Trainer

    gen, _ = _flagship()
    ds = _dataset(max(2 * B, 256))
    loader = _loader(ds, B, retrieval=True)
    trainer = Trainer(gen, TrainConfig(epochs=1, batch_size=B, lr=1e-4,
                                       job_dir="/tmp/bench_train_job"))
    rng = np.random.default_rng(0)
    batch = next(iter(loader))
    inputs, targets = gen.preprocess(batch, rng)
    inputs, targets = trainer._device_batch(inputs, targets)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    core_cls = type(gen.core)

    @jax.jit
    def encode_fwd(variables, image, retrieved, const_seq, const_keep):
        return gen.core.apply(variables, image, retrieved, const_seq,
                              const_keep, False,
                              method=core_cls.encode_memory)

    @jax.jit
    def loss_fwd(variables, inputs, targets):
        loss, _ = gen.loss(variables, inputs, targets, train=False)
        return loss

    @jax.jit
    def loss_fwd_train(variables, inputs, targets, key):
        # train-mode forward (dropout masks + batch-stat reductions): the
        # honest numerator for the bwd/fwd split — eval-mode fwd is faster
        loss, _ = gen.loss(variables, inputs, targets, train=True,
                           rngs={"dropout": key})
        return loss

    @jax.jit
    def fwd_bwd(variables, inputs, targets, key):
        def f(params):
            loss, aux = gen.loss(
                {"params": params, "batch_stats": variables["batch_stats"]},
                inputs, targets, train=True, rngs={"dropout": key})
            return loss, aux

        (loss, _), grads = jax.value_and_grad(f, has_aux=True)(
            variables["params"])
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    retrieved = inputs["retrieved"]

    def timed(fn, *args, perturb_image=None):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(steps):
            if perturb_image is not None:
                args = perturb_image(args, i)
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1e3  # ms

    def bump_inputs(args, i):
        # nudge the image so the runtime cannot memoize repeat executions
        v, inp, *rest = args
        inp = dict(inp, image=inp["image"] + np.float32(1e-6) * (i + 1))
        return (v, inp, *rest)

    def bump_encode(args, i):
        v, image, *rest = args
        return (v, image + np.float32(1e-6) * (i + 1), *rest)

    ms_encode = timed(encode_fwd, variables, inputs["image"], retrieved,
                      inputs["const_seq"], inputs["const_keep"],
                      perturb_image=bump_encode)
    ms_fwd = timed(loss_fwd, variables, inputs, targets,
                   perturb_image=bump_inputs)
    ms_fwd_train = timed(loss_fwd_train, variables, inputs, targets,
                         jax.random.PRNGKey(2), perturb_image=bump_inputs)
    ms_fwd_bwd = timed(fwd_bwd, variables, inputs, targets,
                       jax.random.PRNGKey(2), perturb_image=bump_inputs)

    # full step: donated state threads -> fresh buffers every execution
    key = jax.random.PRNGKey(1)

    def step(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        st, _ = trainer._train_step(st, inputs, targets, sub)
        return (st, k)

    sps, _ = _timed_steps(step, (state, key), steps, warmup,
                          lambda c: c[0])
    ms_step = 1e3 / sps
    return {
        "B": B,
        "encode_fwd_ms": round(ms_encode, 2),
        "loss_fwd_eval_ms": round(ms_fwd, 2),
        "loss_fwd_train_ms": round(ms_fwd_train, 2),
        "fwd_bwd_ms": round(ms_fwd_bwd, 2),
        "full_step_ms": round(ms_step, 2),
        "bwd_share": round((ms_fwd_bwd - ms_fwd_train) / ms_step, 3),
        "optimizer_share": round((ms_step - ms_fwd_bwd) / ms_step, 3),
        # NOTE: standalone sub-jits materialize their outputs at the jit
        # boundary, so components need not sum to full_step_ms (XLA fuses
        # across more of the graph inside the one-program step)
        "encode_share_of_fwd": round(ms_encode / ms_fwd, 3),
    }


_PARQUET_CACHE = "/tmp/bench_train_parquet"


def _parquet_dataset(n: int = 512):
    """A REAL parquet-backed dataset (written once from synthetic posters):
    the production input path is arrow fetch + uint8 decode, not the
    synthetic fixture's per-image procedural render (which costs ~10x an
    arrow decode and would misreport the pipeline as starving)."""
    import datasets as hfds
    from PIL import Image

    from ralf_tpu.data.dataset import DatasetConfig, HFParquetDataset

    root = f"{_PARQUET_CACHE}_{n}"
    split_dir = os.path.join(root, "train")
    if not os.path.isdir(split_dir):
        os.makedirs(split_dir, exist_ok=True)
        src = _dataset(n)
        lay = src.get_layouts(np.arange(n))
        records = []
        for i in range(n):
            img = src.get_images(np.asarray([i]))[0]
            m = lay["mask"][i]
            records.append({
                "id": str(i),
                "image": Image.fromarray(
                    (img[..., :3] * 255).astype(np.uint8)),
                "saliency": Image.fromarray(
                    (img[..., 3] * 255).astype(np.uint8)),
                "label": lay["label"][i][m].tolist(),
                **{k: lay[k][i][m].tolist() for k in
                   ("center_x", "center_y", "width", "height")},
            })
        hfds.Dataset.from_list(records).to_parquet(
            os.path.join(split_dir, "train-00000-of-00001.parquet"))
    return HFParquetDataset(
        DatasetConfig(name="pku10", data_dir=root), "train")


def input_pipeline_rate(B: int, n_batches: int = 12,
                        image_dtype=np.float32) -> dict:
    """Host-side batches/sec off the REAL input path: HFParquetDataset
    (batched arrow fetch + image decode) -> BatchLoader transforms (native
    collate) -> retrieval wrapper gather -> gen.preprocess — everything
    the host must produce per device step.  prefetch=0 measures the raw
    producer rate; in training a prefetch thread overlaps this with the
    device step, so the chip starves iff this rate < device steps/sec."""
    gen, _ = _flagship()
    ds = _parquet_dataset(max(2 * B, 256))
    loader = _loader(ds, B, retrieval=True, prefetch=0)  # raw host rate
    inner = getattr(loader, "loader", loader)
    inner.image_dtype = image_dtype
    rng = np.random.default_rng(0)
    it = iter(loader)
    batch = next(it)  # pay one-time setup (gallery embed) outside the clock
    gen.preprocess(batch, rng)
    t0 = time.perf_counter()
    done = 0
    while done < n_batches:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        gen.preprocess(batch, rng)
        done += 1
    dt = time.perf_counter() - t0
    return {"B": B, "host_batches_per_sec": done / dt,
            "host_layouts_per_sec": done / dt * B}


def sustained_rate(B: int, n_steps: int = 24, image_dtype=np.uint8) -> dict:
    """END-TO-END sustained training rate: the real parquet loader (+
    retrieval wrapper, prefetch=2 producer thread, uint8 images) feeding
    the donated train step — measures the actual overlap, not the two
    rates in isolation.  sustained/device ratio == 1 means the prefetch
    thread fully hides the host; < 1 quantifies the starvation."""
    import jax

    from ralf_tpu.train.trainer import TrainConfig, Trainer

    gen, _ = _flagship()
    # enough rows that one epoch >> prefetch depth: with a tiny fixture
    # the per-epoch iterator restarts (new producer thread, reshuffle)
    # dominate and the measurement reflects the fixture, not the pipeline
    ds = _parquet_dataset(max(8 * B, 1024))
    loader = _loader(ds, B, retrieval=True, prefetch=2)
    getattr(loader, "loader", loader).image_dtype = image_dtype
    trainer = Trainer(gen, TrainConfig(epochs=1, batch_size=B, lr=1e-4,
                                       job_dir="/tmp/bench_train_job"))
    rng = np.random.default_rng(0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()
    key = jax.random.PRNGKey(1)

    def epoch_steps():
        nonlocal state, key
        done = 0
        while done < n_steps:
            for batch in loader:
                if done >= n_steps:
                    break
                inputs, targets = gen.preprocess(batch, rng)
                inputs, targets = trainer._device_batch(inputs, targets)
                key, sub = jax.random.split(key)
                state, m = trainer._train_step(state, inputs, targets, sub)
                done += 1
                yield m

    # warmup: first 3 steps pay compile + cache fill
    it = epoch_steps()
    for _ in range(3):
        m = next(it)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    n = 0
    for m in it:
        n += 1
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return {"B": B, "sustained_steps_per_sec": n / dt,
            "sustained_layouts_per_sec": n / dt * B}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="ralf,cglgan,layoutdm")
    p.add_argument("--batches", default="32,64,128")
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--breakdown-b", type=int, default=64)
    p.add_argument("--skip-breakdown", action="store_true")
    p.add_argument("--skip-pipeline", action="store_true")
    p.add_argument("--sustained", type=int, default=0,
                   help="also run the end-to-end sustained loop at this B")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    rows = []
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    for family in filter(None, args.families.split(",")):
        for B in (int(b) for b in args.batches.split(",")):
            r = bench_family(family, B, args.steps, args.warmup)
            r = {k: (round(v, 2) if isinstance(v, float) else v)
                 for k, v in r.items()}
            rows.append(r)
            print(json.dumps(r), flush=True)

    if not args.skip_breakdown:
        br = breakdown_flagship(args.breakdown_b, args.steps, args.warmup)
        br["row"] = "flagship_step_breakdown"
        rows.append(br)
        print(json.dumps(br), flush=True)

    if not args.skip_pipeline:
        for B in (int(b) for b in args.batches.split(",")):
            for dt, tag in ((np.float32, "f32"), (np.uint8, "uint8")):
                r = input_pipeline_rate(B, image_dtype=dt)
                r = {k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in r.items()}
                r["row"] = f"input_pipeline_{tag}"
                # starving iff host rate < device steps/sec at the same B
                dev = next((x for x in rows
                            if x.get("family") == "ralf(AdamW)"
                            and x["B"] == B), None)
                if dev:
                    r["saturation"] = round(
                        r["host_batches_per_sec"] / dev["steps_per_sec"], 2)
                rows.append(r)
                print(json.dumps(r), flush=True)

    if args.sustained:
        r = sustained_rate(args.sustained)
        r = {k: (round(v, 2) if isinstance(v, float) else v)
             for k, v in r.items()}
        r["row"] = "sustained_e2e"
        rows.append(r)
        print(json.dumps(r), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
