"""Seeded torch A/B for the discrete-diffusion core (VERDICT r2 item #2).

Compares, on shared inputs, the jax `MaskAndReplaceDiffusion` (full-vocab
per-position-table redesign) against the reference classes
`diffusion/discrete/default.py` (q_type='default') and `constrained.py`
(q_type='constrained'), plus `logit_adjustment.py`/`clg_lo.py`:

  * schedule buffers,
  * q_pred / q_pred_one_timestep (default directly; constrained through
    the reference's own pf converter),
  * q_posterior at t in {0, mid, T-1} with mask tokens present,
  * the KL + auxiliary training losses with a stubbed denoiser and a
    pinned x_t (randomness factored out on both sides),
  * sample_single_step under strong constraints ('c'), refinement weak
    logits, and known-count PAD disabling,
  * the relation logit adjustment (stochastic_convert + CLG-LO costs +
    the SGD update loop).

Convention note: the reference keeps the class axis at dim 1 ([B, V, L]);
the TPU layout keeps it LAST ([B, L, V]) so it rides the 128-wide lanes —
every comparison transposes.
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

from ralf_tpu.core.tokenizer import (
    LayoutSequenceTokenizer as JaxTokenizer,
    TokenizerConfig,
)
from ralf_tpu.models.diffusion import (
    LOG_EPS,
    MaskAndReplaceDiffusion,
    index_to_log_onehot as jax_log_onehot,
)

pytestmark = pytest.mark.slow

B, S, NUM_BIN, T = 3, 4, 8, 12
L = 5 * S  # no bos/eos for diffusion tokenizers
VAR_ORDER = ["label", "width", "height", "center_x", "center_y"]


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_tok():
    from image2layout.train.helpers.layout_tokenizer import (
        LayoutSequenceTokenizer as RefTokenizer,
    )

    label = ds_lib.ClassLabel(names=["text", "logo", "underlay"])
    return RefTokenizer(
        label_feature=label, max_seq_length=S, num_bin=NUM_BIN,
        var_order=VAR_ORDER, special_tokens=["pad", "mask"],
        pad_until_max=True,
    )


@pytest.fixture(scope="module")
def jax_tok():
    return JaxTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=NUM_BIN,
                        special_tokens=("pad", "mask"))
    )


def _ref_diffusion(ref_tok, q_type):
    if q_type == "default":
        from image2layout.train.models.diffusion.discrete.default import (
            MaskAndReplaceDiffusion as RefCls,
        )

        pos_emb = "layout"
    else:
        from image2layout.train.models.diffusion.discrete.constrained import (
            ConstrainedMaskAndReplaceDiffusion as RefCls,
        )

        pos_emb = "elem_attr"
    torch.manual_seed(0)
    ref = RefCls(d_model=32, num_layers=1, nhead=4, tokenizer=ref_tok,
                 num_timesteps=T, pos_emb=pos_emb, auxiliary_loss_weight=0.1)
    ref.eval()
    return ref


@pytest.fixture(scope="module", params=["default", "constrained"])
def pair(request, ref_tok, jax_tok):
    q_type = request.param
    return _ref_diffusion(ref_tok, q_type), MaskAndReplaceDiffusion(
        jax_tok, T, q_type
    ), q_type


# --------------------------------------------------------------------------
# shared random inputs
# --------------------------------------------------------------------------


def _valid_tokens(jax_tok, rng, with_mask=True):
    """[B, L] tokens valid per attribute slot (incl. pad and maybe mask)."""
    V = jax_tok.N_total
    out = np.zeros((B, L), np.int64)
    for p in range(L):
        key = VAR_ORDER[p % 5]
        if key == "label":
            pool = list(range(jax_tok.N_label))
        else:
            off = jax_tok.geo_offset(key)
            pool = list(range(off, off + NUM_BIN))
        pool.append(jax_tok.pad_id)
        if with_mask:
            pool.append(V - 1)
        out[:, p] = rng.choice(pool, size=B)
    return out


def _x0_tokens(jax_tok, rng):
    from ralf_tpu.core.layout import random_layout

    layout = random_layout(rng, B, S, 3)
    return np.asarray(jax_tok.encode(layout)["seq"], np.int64), layout


def _rand_log_prob(rng, V, mask_col_dead=True):
    """Normalized random log-probs [B, L, V] shaped like predict_start
    output (mask column pinned to -70)."""
    logits = rng.normal(0, 2.0, size=(B, L, V)).astype(np.float32)
    if mask_col_dead:
        lp = logits[..., :-1] - np.log(
            np.exp(logits[..., :-1]).sum(-1, keepdims=True))
        lp = np.concatenate([lp, np.full((B, L, 1), -70.0, np.float32)], -1)
    else:
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return np.clip(lp, -70.0, 0.0)


def _t_torch(lp):  # [B, L, V] -> torch [B, V, L]
    return torch.tensor(np.swapaxes(lp, 1, 2))


def _t_jax(t_tensor):  # torch [B, V, L] -> np [B, L, V]
    return np.swapaxes(t_tensor.detach().numpy(), 1, 2)


# --------------------------------------------------------------------------
# tokenizer + schedules
# --------------------------------------------------------------------------


def test_tokenizer_vocab_alignment(ref_tok, jax_tok):
    """Full-vocab token ids must agree or every comparison below is moot."""
    assert ref_tok.N_total == jax_tok.N_total
    assert ref_tok.name_to_id("pad") == jax_tok.pad_id
    assert ref_tok.name_to_id("mask") == jax_tok.N_total - 1
    rng = np.random.default_rng(0)
    x0, layout = _x0_tokens(jax_tok, rng)
    ref_in = {
        "label": torch.tensor(np.asarray(layout.label, np.int64)),
        "mask": torch.tensor(np.asarray(layout.mask)),
        **{k: torch.tensor(np.asarray(layout.geo(k)))
           for k in ("center_x", "center_y", "width", "height")},
    }
    ref_seq = ref_tok.encode(ref_in)["seq"].numpy()
    np.testing.assert_array_equal(ref_seq, x0)


def test_schedule_parity(pair):
    ref, mine, q_type = pair
    tb = mine.tables
    if q_type == "default":
        np.testing.assert_allclose(np.asarray(tb.log_at[:, 0]),
                                   ref.log_at.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(tb.log_cum_ct[:, 0])[:T],
                                   ref.log_cumprod_ct.numpy()[:T], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(tb.log_1_min_ct[:, 0]),
                                   ref.log_1_min_ct.numpy(), rtol=1e-5)
    else:
        for i, key in enumerate(VAR_ORDER):
            np.testing.assert_allclose(
                np.asarray(tb.log_at[:, i]),
                getattr(ref, f"{key}_log_at").numpy(), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(tb.log_cum_bt[:, i])[:T],
                getattr(ref, f"{key}_log_cumprod_bt").numpy()[:T], rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(tb.log_1_min_cum_ct[:, i])[:T],
                getattr(ref, f"{key}_log_1_min_cumprod_ct").numpy()[:T],
                rtol=1e-5)


# --------------------------------------------------------------------------
# q-process
# --------------------------------------------------------------------------


@pytest.mark.parametrize("t_val", [0, T // 2, T - 1])
def test_q_pred_parity_default(ref_tok, jax_tok, t_val):
    ref = _ref_diffusion(ref_tok, "default")
    mine = MaskAndReplaceDiffusion(jax_tok, T, "default")
    rng = np.random.default_rng(1)
    x0, _ = _x0_tokens(jax_tok, rng)
    log_x0 = np.asarray(jax_log_onehot(jnp.asarray(x0), mine.V))
    t = np.full((B,), t_val, np.int64)

    ref_out = _t_jax(ref.q_pred(_t_torch(log_x0), torch.tensor(t)))
    my_out = np.asarray(mine.q_pred(jnp.asarray(log_x0), jnp.asarray(t)))
    np.testing.assert_allclose(np.exp(my_out), np.exp(ref_out), atol=1e-6)

    ref_out1 = _t_jax(ref.q_pred_one_timestep(_t_torch(log_x0), torch.tensor(t)))
    my_out1 = np.asarray(
        mine.q_pred_one_timestep(jnp.asarray(log_x0), jnp.asarray(t)))
    np.testing.assert_allclose(np.exp(my_out1), np.exp(ref_out1), atol=1e-6)


def test_q_pred_parity_constrained_via_converter(ref_tok, jax_tok):
    """Constrained q_pred runs per-attribute in the reference's compact
    vocabulary; route the reference through its own pf converter and
    compare probabilities in the full vocabulary."""
    ref = _ref_diffusion(ref_tok, "constrained")
    mine = MaskAndReplaceDiffusion(jax_tok, T, "constrained")
    rng = np.random.default_rng(2)
    x0, _ = _x0_tokens(jax_tok, rng)
    log_x0 = np.asarray(jax_log_onehot(jnp.asarray(x0), mine.V))
    t = np.asarray([0, T // 2, T - 1], np.int64)

    my_out = np.exp(np.asarray(mine.q_pred(jnp.asarray(log_x0), jnp.asarray(t))))

    full = np.full((B, L, mine.V), np.exp(LOG_EPS), np.float64)
    for i, key in enumerate(VAR_ORDER):
        cols = torch.tensor(np.swapaxes(log_x0[:, i::5, :], 1, 2))  # [B,V,S]
        partial = ref.converter.f_to_p_log(cols, key)
        out_p = ref.q_pred(partial, torch.tensor(t), key)
        out_f = ref.converter.p_to_f_log(out_p, key)  # [B, V, S]
        full[:, i::5, :] = np.exp(np.swapaxes(out_f.numpy(), 1, 2))
    np.testing.assert_allclose(my_out, full, atol=1e-6)


@pytest.mark.parametrize("t_val", [0, 1, T // 2, T - 1])
def test_q_posterior_parity(pair, t_val):
    ref, mine, q_type = pair
    rng = np.random.default_rng(3 + t_val)
    # x_start: a predict_start-like log distribution; x_t: tokens incl. MASK
    log_x_start = _rand_log_prob(rng, mine.V)
    jtok = mine.tokenizer
    xt = _valid_tokens(jtok, rng, with_mask=True)
    log_x_t = np.asarray(jax_log_onehot(jnp.asarray(xt), mine.V))
    t = np.full((B,), t_val, np.int64)

    ref_out = _t_jax(ref.q_posterior(_t_torch(log_x_start), _t_torch(log_x_t),
                                     torch.tensor(t)))
    my_out = np.asarray(mine.q_posterior(
        jnp.asarray(log_x_start), jnp.asarray(log_x_t), jnp.asarray(t)))
    # compare distributions (dead columns differ only below the 1e-30 floor)
    np.testing.assert_allclose(np.exp(my_out), np.exp(ref_out), atol=2e-5)
    live = ref_out > -20
    np.testing.assert_allclose(my_out[live], ref_out[live], atol=2e-4,
                               rtol=1e-3)


# --------------------------------------------------------------------------
# training loss (stubbed denoiser, pinned x_t)
# --------------------------------------------------------------------------


class _StubModel(torch.nn.Module):
    """Replaces the reference's DiscreteDiffusionDecoder with fixed logits."""

    def __init__(self, logits_np):
        super().__init__()
        self._logits = torch.tensor(logits_np)

    def forward(self, tgt, memory, timestep):
        return self._logits  # [B, L, V]


def test_loss_parity(pair, jax_tok):
    ref, mine, q_type = pair
    rng = np.random.default_rng(5)
    x0, _ = _x0_tokens(jax_tok, rng)
    xt_full = _valid_tokens(jax_tok, rng, with_mask=True)
    logits_np = rng.normal(0, 2.0, size=(B, L, mine.V)).astype(np.float32)
    t = np.asarray([0, T // 2, T - 1], np.int64)
    pt = np.full((B,), 1.0 / T, np.float32)

    # reference side: stub the denoiser, pin (t, pt) and x_t
    ref.model = _StubModel(logits_np)
    ref.sample_time = lambda b, device, method=None: (
        torch.tensor(t), torch.tensor(pt))
    if q_type == "default":
        from image2layout.train.models.diffusion.discrete.util import (
            index_to_log_onehot as ref_log_onehot,
        )

        ref.q_sample = lambda log_x_start, t: ref_log_onehot(
            torch.tensor(xt_full), mine.V)
    else:
        from image2layout.train.models.diffusion.discrete.util import (
            index_to_log_onehot as ref_log_onehot,
        )

        def _q_sample(log_x_start, t, key):
            i = VAR_ORDER.index(key)
            partial = ref.converter.f_to_p_id(
                torch.tensor(xt_full[:, i::5]), key)
            return ref_log_onehot(partial, ref.mat_size[key])

        ref.q_sample = _q_sample
    with torch.no_grad():
        _, ref_losses = ref.forward(torch.tensor(x0), memory=None)

    # jax side: same pinned x_t, same stub logits
    mine.q_sample = lambda key, log_x_start, t: jax_log_onehot(
        jnp.asarray(xt_full), mine.V)
    _, my_losses = mine.loss(
        jax.random.PRNGKey(0), lambda x_t, tt: jnp.asarray(logits_np),
        jnp.asarray(x0), jnp.asarray(t), jnp.asarray(pt),
        auxiliary_loss_weight=0.1,
    )

    np.testing.assert_allclose(float(my_losses["kl_loss"]),
                               float(ref_losses["kl_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(my_losses["aux_loss"]),
                               float(ref_losses["aux_loss"]), rtol=1e-4)


# --------------------------------------------------------------------------
# one reverse step with constraints
# --------------------------------------------------------------------------


def _dict_cfg(**kw):
    from omegaconf import DictConfig

    return DictConfig(kw)


@pytest.mark.parametrize("task", ["c", "refinement"])
@pytest.mark.parametrize("t_val", [1, T - 1])
def test_sample_single_step_parity(pair, jax_tok, task, t_val):
    from image2layout.train.models.common.base_model import (
        ConditionalInputsForDiscreteLayout,
    )

    ref, mine, q_type = pair
    rng = np.random.default_rng(11 + t_val)
    seq_c, _ = _x0_tokens(jax_tok, rng)  # the conditioned tokens
    C = jax_tok.N_var_per_element
    attr = np.arange(L) % C
    if task == "c":
        known = np.broadcast_to(attr == 0, (B, L)).copy()
    else:  # refinement: everything known (reference task.py:163 quirk)
        known = np.ones((B, L), bool)

    xt = _valid_tokens(jax_tok, rng, with_mask=True)
    log_z = np.asarray(jax_log_onehot(jnp.asarray(xt), mine.V))
    logits_np = rng.normal(0, 2.0, size=(B, L, mine.V)).astype(np.float32)
    skip = 2
    cfg = _dict_cfg(name="deterministic", temperature=1.0,
                    refine_lambda=3.0, refine_mode="uniform",
                    refine_offset_ratio=0.2, time_difference=0.0)

    # --- reference ---
    ref.model = _StubModel(logits_np)
    cond = ConditionalInputsForDiscreteLayout(
        image=torch.zeros((B, 4, 8, 8)), id=None, task=task,
        seq=torch.tensor(seq_c), mask=torch.tensor(known),
        seq_observed=torch.tensor(seq_c),
    )
    if task == "refinement":
        from image2layout.train.models.diffusion.discrete.logit_adjustment import (
            set_weak_logits_for_refinement,
        )

        cond = set_weak_logits_for_refinement(cond, ref.tokenizer, cfg)
    out_ref = ref.sample_single_step(
        log_z=_t_torch(log_z), memory=None,
        model_t=torch.full((B,), t_val, dtype=torch.long),
        skip_step=skip, cond=cond, sampling_cfg=cfg,
    )
    ref_tokens = out_ref.argmax(dim=1).numpy()

    # --- jax ---
    from ralf_tpu.core.sampling import SamplingConfig

    weak_mask = weak_logits = None
    if task == "refinement":
        from ralf_tpu.core.conditioning import Condition
        from ralf_tpu.models.base import GeneratorConfig
        from ralf_tpu.models.diffusion import LayoutDMGenerator

        gen = LayoutDMGenerator(
            jax_tok, GeneratorConfig(d_model=32, nhead=4,
                                     num_encoder_layers=1,
                                     num_decoder_layers=1,
                                     dim_feedforward=64,
                                     backbone="resnet18"),
            num_timesteps=T, image_hw=(8, 8),
        )
        jcond = Condition(image=None, task="refinement", seq=seq_c,
                          seq_mask=known)
        weak_logits, weak_mask = gen._refinement_weak_logits(
            jcond, 3.0, "uniform", 0.2)
    pad_disable = jnp.asarray((attr[None, :] != 0)
                              & (seq_c != jax_tok.pad_id))
    out_my = mine.sample_single_step(
        jax.random.PRNGKey(0), jnp.asarray(log_z),
        lambda x_t, tt: jnp.asarray(logits_np),
        jnp.full((B,), t_val, jnp.int32), jnp.asarray(skip, jnp.int32),
        SamplingConfig(name="deterministic"),
        strong_seq=jnp.asarray(seq_c), strong_mask=jnp.asarray(known),
        weak_mask=weak_mask, weak_logits=weak_logits,
        pad_disable_mask=pad_disable,
    )
    my_tokens = np.asarray(jnp.argmax(out_my, axis=-1))
    np.testing.assert_array_equal(my_tokens, ref_tokens)


# --------------------------------------------------------------------------
# relation logit adjustment (CLG-LO)
# --------------------------------------------------------------------------


def _edges(rng, E=5):
    from ralf_tpu.core.relationships import RelLoc, RelSize

    idx = np.zeros((B, E, 2), np.int64)
    attr = np.zeros((B, E), np.int64)
    rels = [RelSize.SMALLER, RelSize.EQUAL, RelSize.LARGER, RelLoc.TOP,
            RelLoc.BOTTOM, RelLoc.LEFT, RelLoc.RIGHT, RelLoc.CENTER]
    for b in range(B):
        for e in range(E):
            if e == 0:
                i, j = 0, 1 + rng.integers(S)  # canvas edge
            else:
                i, j = rng.choice(np.arange(1, S + 1), 2, replace=False)
            idx[b, e] = (i, j)
            attr[b, e] = 1 << int(rels[rng.integers(len(rels))])
    return idx, attr


def test_stochastic_convert_parity(ref_tok, jax_tok):
    from image2layout.train.models.diffusion.discrete.logit_adjustment import (
        _stochastic_convert,
    )

    from ralf_tpu.ops.relation_costs import stochastic_convert

    rng = np.random.default_rng(21)
    lp = _rand_log_prob(rng, jax_tok.N_total, mask_col_dead=False)
    ref_out = _stochastic_convert(_t_torch(lp), ref_tok)
    my_out = stochastic_convert(jnp.asarray(lp), jax_tok)
    for key in ("center_x", "center_y", "width", "height"):
        np.testing.assert_allclose(np.asarray(my_out[key]),
                                   ref_out[key].detach().numpy(), atol=1e-5)


def test_relation_cost_parity(jax_tok):
    from image2layout.train.models.diffusion.discrete.clg_lo import (
        Graph,
        relation as ref_relation_fns,
    )

    from ralf_tpu.ops.relation_costs import relation_cost

    rng = np.random.default_rng(22)
    bbox = rng.random((B, S + 1, 4)).astype(np.float32) * 0.8 + 0.1
    bbox[:, 0] = (0.5, 0.5, 1.0, 1.0)
    idx, attr = _edges(rng)

    graph = Graph(edge_indexes=torch.tensor(idx),
                  edge_attributes=torch.tensor(attr))
    ref_cost = torch.stack(
        [f(torch.tensor(bbox), graph) for f in ref_relation_fns]).mean()
    my_cost = relation_cost(jnp.asarray(bbox), jnp.asarray(idx),
                            jnp.asarray(attr))
    np.testing.assert_allclose(float(my_cost), float(ref_cost), rtol=1e-5)


@pytest.mark.parametrize("t_val", [3, 20])
def test_update_logits_for_relation_parity(ref_tok, jax_tok, t_val):
    """Full SGD loop: 3 updates at t>=10, gated off at t<10.  The reference
    optimizes a (B, V, L) torch Parameter; the jax side unrolls jax.grad —
    identical iterates expected up to float tolerance."""
    from image2layout.train.models.common.base_model import (
        ConditionalInputsForDiscreteLayout,
    )
    from image2layout.train.models.diffusion.discrete.logit_adjustment import (
        update_logits_for_relation as ref_update,
    )

    from ralf_tpu.ops.relation_costs import update_logits_for_relation

    rng = np.random.default_rng(23 + t_val)
    lp = _rand_log_prob(rng, jax_tok.N_total, mask_col_dead=False)
    idx, attr = _edges(rng)
    cfg = _dict_cfg(relation_lambda=1.0, relation_num_update=3)
    cond = ConditionalInputsForDiscreteLayout(
        image=torch.zeros((B, 4, 8, 8)), id=None, task="relation",
        edge_indexes=torch.tensor(idx), edge_attributes=torch.tensor(attr),
    )
    ref_out = _t_jax(ref_update(t=t_val, cond=cond,
                                model_log_prob=_t_torch(lp),
                                tokenizer=ref_tok, sampling_cfg=cfg))
    my_out = np.asarray(update_logits_for_relation(
        jnp.asarray(lp), jnp.full((B,), t_val, jnp.int32),
        jnp.asarray(idx), jnp.asarray(attr), jax_tok,
        relation_lambda=1.0, num_update=3,
    ))
    if t_val < 10:
        np.testing.assert_allclose(my_out, lp, atol=1e-7)  # gated off
    np.testing.assert_allclose(my_out, ref_out, atol=5e-5)
