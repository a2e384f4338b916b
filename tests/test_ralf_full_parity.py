"""FULL-MODEL weight parity: the flagship RALF vs the reference torch
assembly (VERDICT r1 missing #1 / next-round #2).

Instantiates the complete reference
`ConcateAuxilaryTaskConcateCrossAttnRetrievalAugmentedAutoreg`
(`retrieval_augmented_autoreg.py:997-1033`: ResNet50-FPN head, 6L
pre-LN encoder, FIDNet layout tower, ViT cross-attn fusion, constraint
encoder, flag embeddings, BaseDecoder) with random weights, ports every
tensor through `utils.torch_port.port_ralf_core`, and asserts:

  * teacher-forcing logits parity (train-loss path), and
  * greedy decode token equality under the reference's token_mask.

The env lacks timm/torchvision; `ref_shims.install()` provides
torchvision-naming-compatible random twins (we only need shared random
weights, not pretrained ones).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
import ref_shims

ref_shims.install()

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import datasets as ds_lib
import jax
import jax.numpy as jnp

from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.ralf import RALFCore
from ralf_tpu.utils.torch_port import merge_params, numpy_state_dict, port_ralf_core

# D is pinned to 256: the reference hardwires 256-d towers (FIDNet layout
# encoder, `layout_adapter` dim=256, and BaseDecoder's memory_dim_converter
# ablation that kicks in whenever decoder_d_model != 256 — `common.py:50-55`)
B, S, K, D, NUM_BIN = 2, 5, 4, 256, 32
H = W = 64  # /16 -> 4x4 feature map -> M=16; /32 map is 2x2 (integer 2x up)
LC = 13  # our ConstraintVocabulary.const_len("c") at S=5


@pytest.fixture(scope="module")
def torch_model(tmp_path_factory):
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("ref_cwd"))
    try:
        torch.manual_seed(0)
        # the reference ctor insists on loading this exact file (its cache
        # convention, `common/image.py:38-48`); a random-weight twin is fine
        torch.save(ref_shims.resnet50().state_dict(),
                   "resnet50_a1_0-14fe96d1.pth")

        import image2layout.train.fid.model as fid_mod
        import image2layout.train.models.retrieval_augmented_autoreg as ra

        # skip the trained-FIDNet checkpoint load: random twin, shared below
        ra.load_fidnet_feature_extractor.__globals__["load_fidnet_v3"] = (
            lambda model, ckpt_dir: model
        )

        from image2layout.train.helpers.layout_tokenizer import (
            LayoutSequenceTokenizer,
        )

        label = ds_lib.ClassLabel(names=["text", "logo", "underlay"])
        tok = LayoutSequenceTokenizer(
            label_feature=label, max_seq_length=S, num_bin=NUM_BIN,
            var_order=["label", "width", "height", "center_x", "center_y"],
        )
        features = ds_lib.Features({"label": ds_lib.Sequence(label)})
        model = ra.ConcateAuxilaryTaskConcateCrossAttnRetrievalAugmentedAutoreg(
            features=features, tokenizer=tok, dataset_name="pku10",
            max_seq_length=S, db_dataset=None, d_model=D, decoder_d_model=D,
            top_k=K, auxilary_task="c", use_flag_embedding=True,
        )
        model.eval()
        return model, tok
    finally:
        os.chdir(cwd)


def _random_inputs(rng, n_total, const_n_total):
    T = 5 * S + 1  # BOS + max_token_length
    seq = rng.integers(0, n_total, size=(B, T))
    image = rng.random((B, H, W, 4), dtype=np.float64).astype(np.float32)
    geo = lambda: rng.random((B, K, S)).astype(np.float32)
    n_elem = rng.integers(1, S + 1, size=(B, K))  # >=1: no empty layouts
    mask = np.arange(S)[None, None, :] < n_elem[..., None]
    retrieved = {
        "label": rng.integers(0, 3, size=(B, K, S)),
        "center_x": geo(), "center_y": geo(), "width": geo(), "height": geo(),
        "mask": mask,
    }
    const = rng.integers(0, const_n_total, size=(B, LC))
    const_pad = np.arange(LC)[None, :] >= rng.integers(4, LC + 1, size=(B, 1))
    return seq, image, retrieved, const, const_pad


def _torch_inputs(seq, image, retrieved, const, const_pad):
    return {
        "seq": torch.tensor(seq),
        "tgt_key_padding_mask": torch.zeros(seq.shape, dtype=torch.bool),
        "image": torch.tensor(image.transpose(0, 3, 1, 2)),
        "retrieved": {
            k: torch.tensor(np.asarray(v, np.float32))
            for k, v in retrieved.items()
        },
        "seq_layout_const": torch.tensor(const),
        "seq_layout_const_pad_mask": torch.tensor(const_pad),
    }


@pytest.fixture(scope="module")
def ported(torch_model):
    model, tok = torch_model
    core = RALFCore(
        vocab_size=tok.N_total,
        const_vocab_size=model.preprocessor.N_total,
        num_labels=3,
        max_seq_length=S,
        top_k=K,
        fusion="concat_crossattn",
        cfg=GeneratorConfig(d_model=D, nhead=8, num_encoder_layers=6,
                            num_decoder_layers=6, dim_feedforward=4 * D,
                            dropout=0.1, backbone="resnet50"),
    )
    rng = np.random.default_rng(0)
    seq, image, retrieved, const, const_pad = _random_inputs(
        rng, tok.N_total, model.preprocessor.N_total
    )
    variables = core.init(
        jax.random.PRNGKey(0),
        jnp.asarray(seq), jnp.asarray(image),
        {k: jnp.asarray(np.asarray(v, np.float32)) if k != "label"
         else jnp.asarray(v, jnp.int32) for k, v in retrieved.items()},
        jnp.asarray(const), jnp.asarray(~const_pad),
    )
    p, bs = port_ralf_core(numpy_state_dict(model))
    params = merge_params(jax.device_get(variables["params"]), p)
    batch_stats = merge_params(jax.device_get(variables["batch_stats"]), bs)
    return core, {"params": params, "batch_stats": batch_stats}


def test_full_model_logits_parity(torch_model, ported):
    model, tok = torch_model
    core, variables = ported
    rng = np.random.default_rng(7)
    seq, image, retrieved, const, const_pad = _random_inputs(
        rng, tok.N_total, model.preprocessor.N_total
    )

    with torch.no_grad():
        logits_t = model(_torch_inputs(seq, image, retrieved, const, const_pad))
        logits_t = logits_t["logits"].numpy()

    logits_f = np.asarray(core.apply(
        variables,
        jnp.asarray(seq), jnp.asarray(image),
        {k: jnp.asarray(np.asarray(v, np.float32)) if k != "label"
         else jnp.asarray(v, jnp.int32) for k, v in retrieved.items()},
        jnp.asarray(const), jnp.asarray(~const_pad),
    ))

    assert logits_f.shape == logits_t.shape
    diff = np.abs(logits_f - logits_t)
    scale = np.abs(logits_t).max()
    assert diff.max() / scale < 1e-3, (
        f"max rel diff {diff.max() / scale:.2e} (abs {diff.max():.2e}, "
        f"scale {scale:.2e})"
    )


def test_full_model_greedy_decode_parity(torch_model, ported):
    model, tok = torch_model
    core, variables = ported
    rng = np.random.default_rng(11)
    _, image, retrieved, const, const_pad = _random_inputs(
        rng, tok.N_total, model.preprocessor.N_total
    )
    T = 5 * S + 1
    bos = tok.name_to_id("bos")
    token_mask = tok.token_mask.numpy()  # [max_token_length, N_total]

    # full-length fixed-shape trick: causal decoders never read positions
    # > i, so one compiled shape serves the whole greedy loop on each side
    seq_t = np.full((B, T), bos, np.int64)
    seq_f = np.full((B, T), bos, np.int64)

    inputs_t = _torch_inputs(seq_t, image, retrieved, const, const_pad)
    with torch.no_grad():
        enc_in = {
            "image": inputs_t["image"], "retrieved": inputs_t["retrieved"],
            "seq_layout_const": inputs_t["seq_layout_const"],
            "seq_layout_const_pad_mask": inputs_t["seq_layout_const_pad_mask"],
        }
        encoded = model._encode_into_memory(enc_in)

    ret_jax = {k: jnp.asarray(np.asarray(v, np.float32)) if k != "label"
               else jnp.asarray(v, jnp.int32) for k, v in retrieved.items()}
    apply_fn = jax.jit(lambda s: core.apply(
        variables, s, jnp.asarray(image), ret_jax,
        jnp.asarray(const), jnp.asarray(~const_pad),
    ))

    for i in range(T - 1):
        with torch.no_grad():
            lt = model.decoder(
                tgt=torch.tensor(seq_t),
                tgt_key_padding_mask=torch.zeros((B, T), dtype=torch.bool),
                is_causal=True,
                **encoded,
            )[:, i].numpy()
        lf = np.array(apply_fn(jnp.asarray(seq_f)))[:, i]  # writable copy

        keep = token_mask[i]  # same restriction applied to both sides
        lt[:, ~keep] = -np.inf
        lf[:, ~keep] = -np.inf
        nt, nf = lt.argmax(-1), lf.argmax(-1)
        assert (nt == nf).all(), f"step {i}: torch {nt} vs flax {nf}"
        seq_t[:, i + 1] = nt
        seq_f[:, i + 1] = nf
