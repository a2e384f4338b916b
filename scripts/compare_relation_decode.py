"""Matched-weights violation-rate comparison: batched candidate-scoring
relation decode (ops/relation_decode.py) vs the reference's in-loop
token-space automaton (`models/layoutformerpp/relation_restriction.py` via
`models/autoreg.py:223-392` sample_relation).

Both sides run the SAME `ConcateAuxilaryTaskAutoreg` weights (torch init,
ported tensor-for-tensor through `utils.torch_port.port_autoreg_core` — the
same weight-port contract proven logits-exact in tests/test_ralf_full_parity
for the RALF superset), the SAME GT layouts/images, the same 10%% relation
sampling rate and top-p sampling config, and report each pipeline's own
end-to-end violation rate: fraction of conditioned clauses whose relation,
re-detected geometrically on the generated layout, differs from the
conditioned one.  The detectors on both sides are the same published
definitions (RelSize +-10%% area, RelLoc boundary comparisons) — the
reference scores with `calculate_vio_rate_relation` (violate.py:143-236),
ours with `eval.violations.calculate_relation_violation`.

Semantic delta being quantified (see --max-retries in cli/inference.py):
the reference PRUNES the decoding space in-loop (an 825-LoC per-sample host
automaton with probability pruning, backtracking and resets; B=1, one
device round-trip per token), while the rebuild samples up to R candidate
elements from the same KV snapshot and keeps the fewest-violations one —
the whole batch in ONE jitted scan.  The harness also times both, because
throughput is the other half of the trade.

Run on CPU (the reference loop is host-side per-sample):
  JAX_PLATFORMS=cpu python scripts/compare_relation_decode.py \
      [--n 8] [--seeds 2] [--retries 1 4 8] [--train-steps 0]
"""

import argparse
import os
import random
import sys
import tempfile
import time
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import ref_shims  # tests/ref_shims.py — torchvision/timm twins

ref_shims.install()

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def build_reference_table(gt: dict, label_names: list[str]) -> dict:
    """Reference-format relationship table ({id: clause list}) from GT,
    using the reference's OWN detectors and letter convention
    (`preprocess/precompute_relationship.py:30-125`: letters are per-label
    ordinals, elements enumerated in reversed valid order)."""
    from image2layout.train.helpers.relationships import (
        RelElement,
        detect_loc_relation_between_element_and_canvas,
        detect_loc_relation_between_elements,
        detect_size_relation,
    )

    table = {}
    B, S = gt["label"].shape
    for b in range(B):
        counts: dict[int, int] = {}
        unique = {}
        for i in range(S):
            if not gt["mask"][b, i]:
                continue
            lab = int(gt["label"][b, i])
            counts[lab] = counts.get(lab, 0) + 1
            unique[i] = [label_names[lab], list(RelElement)[counts[lab] - 1]]
        valid = [i for i in range(S) if gt["mask"][b, i]][::-1]
        loc, size, canvas = [], [], []
        for idx, i in enumerate(valid):
            bbox_a = [float(gt[k][b, i]) for k in
                      ("center_x", "center_y", "width", "height")]
            for j in valid[idx + 1:]:
                bbox_b = [float(gt[k][b, j]) for k in
                          ("center_x", "center_y", "width", "height")]
                loc.append([*unique[i],
                            detect_loc_relation_between_elements(bbox_a, bbox_b),
                            *unique[j]])
                size.append([*unique[i], detect_size_relation(bbox_a, bbox_b),
                             *unique[j]])
            canvas.append([*unique[i],
                           detect_loc_relation_between_element_and_canvas(bbox_a),
                           "canvas", "pad"])
        table[str(b)] = loc + size + canvas
    return table


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--s", type=int, default=5, help="max elements")
    p.add_argument("--num-bin", type=int, default=32)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--retries", type=int, nargs="+", default=[1, 4, 8])
    p.add_argument("--train-steps", type=int, default=0,
                   help="optional teacher-forcing steps to move both sides "
                        "off the random-init floor before comparing")
    p.add_argument("--quant", action="store_true",
                   help="also run our decode with int8 kv+self caches — "
                        "the relation-path int8 quality gate")
    args = p.parse_args()

    import torch

    import datasets as ds_lib

    B, S, H = args.n, args.s, args.hw
    rng = np.random.default_rng(0)

    # ---- shared synthetic GT (sorted labels, valid geometry) --------------
    n_elem = rng.integers(2, S + 1, size=B)
    mask = np.arange(S)[None, :] < n_elem[:, None]
    label = np.sort(rng.integers(0, 3, size=(B, S)), axis=1)
    gt = {
        "label": np.where(mask, label, 0).astype(np.int64),
        "mask": mask,
        "center_x": np.where(mask, rng.uniform(0.1, 0.9, (B, S)), 0.0),
        "center_y": np.where(mask, rng.uniform(0.1, 0.9, (B, S)), 0.0),
        "width": np.where(mask, rng.uniform(0.05, 0.5, (B, S)), 0.0),
        "height": np.where(mask, rng.uniform(0.05, 0.5, (B, S)), 0.0),
    }
    image = rng.random((B, 4, H, H)).astype(np.float32)
    label_names = ["text", "logo", "underlay"]

    # ---- reference model under shims, in a scratch cwd --------------------
    cwd = os.getcwd()
    scratch = tempfile.mkdtemp(prefix="relcmp_")
    os.chdir(scratch)
    try:
        torch.manual_seed(0)
        torch.save(ref_shims.resnet50().state_dict(),
                   "resnet50_a1_0-14fe96d1.pth")
        os.makedirs("cache", exist_ok=True)

        import image2layout.train.models.autoreg as ref_autoreg
        from image2layout.train.helpers.layout_tokenizer import (
            LayoutSequenceTokenizer,
        )
        from image2layout.train.helpers.relationships import (
            RelElement,
            RelLoc,
            RelSize,
        )

        # the reference's RelationshipPreprocessor torch.load()s the table
        # with torch>=2.6 weights_only defaults, which reject its own enums
        torch.serialization.add_safe_globals([RelElement, RelLoc, RelSize])

        feat_label = ds_lib.ClassLabel(names=label_names)
        ref_tok = LayoutSequenceTokenizer(
            label_feature=feat_label, max_seq_length=S, num_bin=args.num_bin,
            var_order=["label", "width", "height", "center_x", "center_y"],
        )
        table = build_reference_table(gt, label_names)
        torch.save(
            table,
            "cache/pku_cgl_relationships_dic_using_canvas_sort_label_lexico.pt",
        )
        features = ds_lib.Features({"label": ds_lib.Sequence(feat_label)})
        model = ref_autoreg.ConcateAuxilaryTaskAutoreg(
            features=features, tokenizer=ref_tok,
            auxilary_task="relation", use_flag_embedding=True,
        )
        model.eval()
    finally:
        os.chdir(cwd)

    batch_t = {
        "image": torch.tensor(image),
        "saliency": torch.zeros((B, 0, H, H)),  # image already has 4 ch
        "label": torch.tensor(gt["label"]),
        "mask": torch.tensor(gt["mask"]),
        "center_x": torch.tensor(gt["center_x"]).float(),
        "center_y": torch.tensor(gt["center_y"]).float(),
        "width": torch.tensor(gt["width"]).float(),
        "height": torch.tensor(gt["height"]).float(),
        "id": torch.arange(B),
    }

    # ---- optional shared training ----------------------------------------
    if args.train_steps:
        from image2layout.train.helpers.task import get_condition as ref_get_cond

        model.train()
        opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
        for step in range(args.train_steps):
            random.seed(1000 + step)
            inputs, targets = model.preprocess(dict(batch_t))
            _, losses = model.train_loss(inputs, targets)  # (outputs, losses)
            loss = sum(losses.values())
            opt.zero_grad()
            loss.backward()
            opt.step()
            if step % 10 == 0:
                print(f"[train] step {step}: loss {float(loss):.4f}")
        model.eval()

    # ---- port the weights --------------------------------------------------
    import jax
    import jax.numpy as jnp

    from ralf_tpu.core.layout import Layout
    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.core.tokenizer import (
        LayoutSequenceTokenizer as OurTokenizer,
        TokenizerConfig,
    )
    from ralf_tpu.eval.violations import calculate_relation_violation
    from ralf_tpu.models.autoreg import AutoregGenerator
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.utils.torch_port import (
        merge_params,
        numpy_state_dict,
        port_autoreg_core,
    )

    our_tok = OurTokenizer(TokenizerConfig(
        num_labels=3, max_seq_length=S, num_bin=args.num_bin,
    ))
    gen = AutoregGenerator(
        our_tok,
        GeneratorConfig(d_model=256, nhead=8, num_encoder_layers=6,
                        num_decoder_layers=6, dim_feedforward=1024),
        auxiliary_task="relation", image_hw=(H, H),
    )
    assert gen.vocab.N_total == model.preprocessor.N_total, (
        gen.vocab.N_total, model.preprocessor.N_total,
    )
    variables = gen.init(jax.random.PRNGKey(0))
    ported_p, ported_s = port_autoreg_core(numpy_state_dict(model))
    variables = {
        "params": merge_params(jax.device_get(variables["params"]), ported_p),
        "batch_stats": merge_params(
            jax.device_get(variables["batch_stats"]), ported_s
        ),
    }

    image_nhwc = image.transpose(0, 2, 3, 1)
    gt_layout = Layout(
        label=gt["label"].astype(np.int32),
        center_x=gt["center_x"].astype(np.float32),
        center_y=gt["center_y"].astype(np.float32),
        width=gt["width"].astype(np.float32),
        height=gt["height"].astype(np.float32),
        mask=gt["mask"],
    )
    sampling = SamplingConfig(name="top_p", top_p=0.9, temperature=1.0)
    ref_sampling = SimpleNamespace(name="top_p", top_p=0.9, temperature=1.0)

    from image2layout.train.helpers.task import get_condition as ref_get_cond

    ref_rates, our_rates = [], {r: [] for r in args.retries}
    ref_times, our_times = [], {r: [] for r in args.retries}
    q_rates = {r: [] for r in args.retries}
    for seed in range(args.seeds):
        # reference side: its own conditioning + automaton + scorer
        random.seed(seed)
        torch.manual_seed(seed)
        cond_t, _ = ref_get_cond(
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in batch_t.items()},
            "relation", ref_tok,
        )
        t0 = time.perf_counter()
        _, viol = model.sample_relation(
            cond_t, sampling_cfg=ref_sampling, return_violation=True,
        )
        dt = time.perf_counter() - t0
        ref_rates.append(viol["viorated"] / max(viol["total"], 1))
        ref_times.append(dt / B)
        print(f"[seed {seed}] reference automaton: "
              f"{viol['viorated']}/{viol['total']} violated "
              f"({ref_rates[-1]:.1%}), {dt / B * 1e3:.0f} ms/sample")

        # our side: our conditioning + batched candidate-scoring decode
        nrng = np.random.default_rng(seed)
        cond, _ = gen.build_condition(
            {"layout": gt_layout, "image": image_nhwc}, nrng, task="relation"
        )
        for r in args.retries:
            key = jax.random.PRNGKey(seed)
            t0 = time.perf_counter()
            layout = gen.sample(variables, cond, sampling, key, max_retries=r)
            jax.block_until_ready(layout.label)
            dt = time.perf_counter() - t0
            v = calculate_relation_violation(cond, layout)
            our_rates[r].append(v["viorated"] / max(v["total"], 1))
            our_times[r].append(dt / B)
            print(f"[seed {seed}] ours (retries={r}): "
                  f"{v['viorated']}/{v['total']} violated "
                  f"({our_rates[r][-1]:.1%}), {dt / B * 1e3:.0f} ms/sample "
                  f"(incl. compile on first call)")

        # int8 quality gate for the relation path (--quant): the bench
        # table's relation row runs kv_quant+self_quant — pin that the
        # quantized caches don't degrade clause satisfaction
        if args.quant:
            for r in args.retries:
                key = jax.random.PRNGKey(seed)
                layout = gen.sample(variables, cond, sampling, key,
                                    max_retries=r, kv_quant=True,
                                    self_quant=True)
                jax.block_until_ready(layout.label)
                v = calculate_relation_violation(cond, layout)
                q_rates[r].append(v["viorated"] / max(v["total"], 1))
                print(f"[seed {seed}] ours int8 (retries={r}): "
                      f"{v['viorated']}/{v['total']} violated "
                      f"({q_rates[r][-1]:.1%})")

    print("\n=== matched-weights relation decode comparison ===")
    print(f"model: shared ConcateAuxilaryTaskAutoreg weights "
          f"({'random init' if not args.train_steps else f'{args.train_steps} train steps'}), "
          f"B={B}, S={S}, num_bin={args.num_bin}, {args.seeds} seeds")
    print(f"reference in-loop automaton : "
          f"violation {np.mean(ref_rates):.1%} +- {np.std(ref_rates):.1%}, "
          f"{np.mean(ref_times) * 1e3:.0f} ms/sample")
    for r in args.retries:
        # steady-state timing = later seeds (first call pays the jit)
        ts = our_times[r][1:] or our_times[r]
        print(f"ours, candidate scoring R={r:<2}: "
              f"violation {np.mean(our_rates[r]):.1%} +- "
              f"{np.std(our_rates[r]):.1%}, {np.mean(ts) * 1e3:.0f} ms/sample")
        if args.quant:
            print(f"ours, int8 kv+self    R={r:<2}: "
                  f"violation {np.mean(q_rates[r]):.1%} +- "
                  f"{np.std(q_rates[r]):.1%}")


if __name__ == "__main__":
    main()
