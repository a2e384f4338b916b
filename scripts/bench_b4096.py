"""One-off: measure the flagship sample path at B=4096 (decode at 4096,
encode chunked at 1024) vs the adopted B=2048 config, same hygiene as
bench.py (distinct perturbed canvases per iter, output-difference assert).

Usage: python scripts/bench_b4096.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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

    HW = (350, 240)
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=128)
    )
    gen = RALFGenerator(
        tok, GeneratorConfig(dtype=jnp.bfloat16), "uncond", image_hw=HW, top_k=16
    )
    variables = gen.init(jax.random.PRNGKey(0))
    sampling = SamplingConfig(name="top_p", top_p=0.9, temperature=1.0)
    key = jax.random.PRNGKey(0)

    gallery = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=256, seed=1, image_hw=HW
    )
    retriever = Retriever.build(gallery, "saliency")
    gallery_feats = gen.precompute_retrieved_feats(variables, retriever.layouts)

    enc = jax.jit(
        lambda v, im, r, cs, ck: gen.core.apply(
            v, im, r, cs, ck, False, method=RALFCore.encode_memory
        )
    )
    self_quant = os.environ.get("RALF_BENCH_SELF_QUANT", "0") == "1"
    dec = jax.jit(
        lambda v, m, f, k: gen.decode(
            v, m, f, sampling, k, kv_quant=True, self_quant=self_quant
        )
    )

    ENC_CHUNK = 1024

    def sample_fn(image, retrieved, const_seq, const_keep, forced, key):
        B = image.shape[0]
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
    retrieved1k = {k: np.asarray(v) for k, v in gen._retrieved_arrays(cond.retrieved).items()}
    const1k = np.asarray(cond.const_seq)
    keep1k = np.asarray(cond.const_mask)
    forced1k = np.asarray(build_forced_tokens(cond, tok))

    for B in (2048, 4096):
        reps = B // 1024
        tile = lambda a: np.concatenate([a] * reps, 0) if reps > 1 else a
        try:
            image = jnp.asarray(tile(image1k)).astype(jnp.bfloat16)
            retrieved = {k: jnp.asarray(tile(v)) for k, v in retrieved1k.items()}
            const_seq = jnp.asarray(tile(const1k))
            const_keep = jnp.asarray(tile(keep1k))
            forced = jnp.asarray(tile(forced1k))
            out = sample_fn(image, retrieved, const_seq, const_keep, forced, key)
            jax.block_until_ready(out)
            iters = 5
            imgs = [
                image
                + jax.random.normal(
                    jax.random.PRNGKey(100 + i), image.shape, image.dtype
                )
                * 0.05
                for i in range(iters)
            ]
            jax.block_until_ready(imgs)
            times, outs = [], []
            for i in range(iters):
                t0 = time.perf_counter()
                out = sample_fn(
                    imgs[i], retrieved, const_seq, const_keep, forced,
                    jax.random.fold_in(key, i),
                )
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
                outs.append(np.asarray(out).tobytes())
            assert len(set(outs)) == iters
            print(f"B={B}: {B / min(times):.1f} layouts/s "
                  f"(times: {[round(t * 1e3, 1) for t in times]})")
        except Exception as e:  # OOM etc — report and continue
            print(f"B={B}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
