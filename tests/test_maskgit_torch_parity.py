"""Torch A/B parity for MaskGIT (VERDICT r2 next-round #3).

Instantiates the reference `image2layout/train/models/maskgit.py` MaskGIT
with random weights, ports every tensor through
`utils.torch_port.port_maskgit`, and asserts on shared inputs:

  * forward logits parity (train path, use_padding_as_vocab),
  * masked-CE train loss parity under a pinned loss_mask,
  * FULL T-step sample parity for uncond and 'c' — with
    use_gumbel_noise=False and deterministic sampling the reference's
    iterative unmasking loop (`maskgit.py:209-277`) is RNG-free, so the
    produced token grids must be bit-identical.
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

from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.maskgit import MaskGITGenerator
from ralf_tpu.utils.torch_port import merge_params, numpy_state_dict, port_maskgit

pytestmark = pytest.mark.slow

B, S, D, NUM_BIN = 2, 5, 256, 32
H = W = 64
T_STEPS = 4


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    from image2layout.train.helpers.layout_tokenizer import (
        LayoutSequenceTokenizer as RefTok,
    )
    from image2layout.train.models.maskgit import MaskGIT as RefMaskGIT

    label = ds_lib.ClassLabel(names=["text", "logo", "underlay"])
    ref_tok = RefTok(
        label_feature=label, max_seq_length=S, num_bin=NUM_BIN,
        var_order=["label", "width", "height", "center_x", "center_y"],
        special_tokens=["pad", "mask"],
    )
    features = ds_lib.Features({"label": ds_lib.Sequence(label)})
    ref = RefMaskGIT(
        features=features, tokenizer=ref_tok, d_model=D,
        use_gumbel_noise=False,
    )
    ref.eval()

    tok = LayoutSequenceTokenizer(TokenizerConfig(
        num_labels=3, max_seq_length=S, num_bin=NUM_BIN,
        special_tokens=("pad", "mask"),
    ))
    assert tok.N_total == ref_tok.N_total
    assert tok.name_to_id("mask") == ref_tok.name_to_id("mask")
    gen = MaskGITGenerator(
        tok,
        cfg=GeneratorConfig(d_model=D, nhead=8, num_encoder_layers=6,
                            num_decoder_layers=6, dropout=0.1,
                            backbone="resnet50"),
        use_gumbel_noise=False, num_timesteps=T_STEPS, image_hw=(H, W),
    )
    variables = gen.init(jax.random.PRNGKey(0), batch_size=B)
    p, bs = port_maskgit(numpy_state_dict(ref))
    params = merge_params(jax.device_get(variables["params"]), p)
    batch_stats = merge_params(jax.device_get(variables["batch_stats"]), bs)
    return ref, ref_tok, gen, {"params": params, "batch_stats": batch_stats}


def _inputs(rng, n_total):
    L = 5 * S  # no BOS: full-length grid
    seq = rng.integers(0, n_total, size=(B, L)).astype(np.int64)
    image = rng.random((B, H, W, 4), dtype=np.float64).astype(np.float32)
    return seq, image


def test_forward_logits_parity(pair):
    ref, ref_tok, gen, variables = pair
    rng = np.random.default_rng(3)
    seq, image = _inputs(rng, ref_tok.N_total)

    with torch.no_grad():
        lt = ref({
            "seq": torch.tensor(seq),
            "image": torch.tensor(image.transpose(0, 3, 1, 2)),
        })["logits"].numpy()

    lf = np.asarray(gen.core.apply(
        variables, jnp.asarray(seq), jnp.asarray(image), False
    ))
    assert lf.shape == lt.shape
    rel = np.abs(lf - lt).max() / np.abs(lt).max()
    assert rel < 1e-3, f"max rel diff {rel:.2e}"


def test_train_loss_parity(pair):
    ref, ref_tok, gen, variables = pair
    rng = np.random.default_rng(5)
    seq, image = _inputs(rng, ref_tok.N_total)
    mask_id = ref_tok.name_to_id("mask")
    loss_mask = rng.random((B, 5 * S)) < 0.4
    loss_mask[:, 0] = True  # never empty
    masked = np.where(loss_mask, mask_id, seq)

    with torch.no_grad():
        _, losses = ref.train_loss(
            {"seq": torch.tensor(masked),
             "image": torch.tensor(image.transpose(0, 3, 1, 2))},
            {"seq": torch.tensor(seq), "loss_mask": torch.tensor(loss_mask)},
        )
    lt = float(losses["nll_loss"])

    lf, _ = gen.loss(
        variables,
        {"seq": jnp.asarray(masked), "image": jnp.asarray(image)},
        {"seq": jnp.asarray(seq), "loss_mask": jnp.asarray(loss_mask)},
        train=False,
    )
    assert abs(float(lf) - lt) < 2e-4 * max(1.0, abs(lt)), (float(lf), lt)


def _ref_sample(ref, image, seq=None, mask=None, task=None):
    from image2layout.train.models.common.base_model import (
        ConditionalInputsForDiscreteLayout,
    )
    from omegaconf import OmegaConf

    cond = ConditionalInputsForDiscreteLayout(
        image=torch.tensor(image.transpose(0, 3, 1, 2)),
        id=None, task=task,
        seq=None if seq is None else torch.tensor(seq),
        mask=None if mask is None else torch.tensor(mask),
    )
    cfg = OmegaConf.create(
        {"name": "deterministic", "num_timesteps": T_STEPS, "temperature": 1.0}
    )
    with torch.no_grad():
        # tokenizer.decode() is lossy; grab the raw token grid instead by
        # replaying the decode input: MaskGIT.sample returns layouts, so we
        # monkeypatch decode to identity for the comparison.
        orig = ref.tokenizer.decode
        ref.tokenizer.decode = lambda s: s.clone()
        try:
            toks = ref.sample(cond, sampling_cfg=cfg)
        finally:
            ref.tokenizer.decode = orig
    return toks.numpy()


def test_sample_parity_uncond(pair):
    ref, ref_tok, gen, variables = pair
    rng = np.random.default_rng(7)
    _, image = _inputs(rng, ref_tok.N_total)

    toks_t = _ref_sample(ref, image, task=None)

    from ralf_tpu.core.conditioning import Condition

    cond = Condition(image=image, task="uncond")
    sampling = SamplingConfig(name="deterministic", temperature=1.0)
    _, toks_f = gen.sample(variables, cond, sampling, jax.random.PRNGKey(0),
                           return_tokens=True, num_timesteps=T_STEPS)
    assert (np.asarray(toks_f) == toks_t).all(), (
        f"tokens diverge: {np.asarray(toks_f)} vs {toks_t}"
    )


def test_sample_parity_c_task(pair):
    """Label tokens pinned by the user, geometry masked ('c' task shape:
    element count known -> PAD predictions forbidden)."""
    ref, ref_tok, gen, variables = pair
    rng = np.random.default_rng(11)
    _, image = _inputs(rng, ref_tok.N_total)
    L = 5 * S
    mask_id = ref_tok.name_to_id("mask")
    pad_id = ref_tok.name_to_id("pad")

    # 3 real elements: label column known, geometry masked; tail PAD-known
    seq = np.full((B, L), mask_id, np.int64)
    known = np.zeros((B, L), bool)
    n_elem = 3
    for e in range(S):
        if e < n_elem:
            seq[:, 5 * e] = rng.integers(0, 3, size=B)  # label id
            known[:, 5 * e] = True
        else:
            seq[:, 5 * e: 5 * e + 5] = pad_id
            known[:, 5 * e: 5 * e + 5] = True

    toks_t = _ref_sample(ref, image, seq=seq, mask=known, task="c")

    from ralf_tpu.core.conditioning import Condition

    cond = Condition(image=image, task="c", seq=seq, seq_mask=known)
    sampling = SamplingConfig(name="deterministic", temperature=1.0)
    _, toks_f = gen.sample(variables, cond, sampling, jax.random.PRNGKey(0),
                           return_tokens=True, num_timesteps=T_STEPS)
    toks_f = np.asarray(toks_f)
    assert (toks_f == toks_t).all(), f"tokens diverge:\n{toks_f}\n{toks_t}"
    # the pinned labels survived
    assert (toks_f[known] == seq[known]).all()
