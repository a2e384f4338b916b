"""SeqLengthDistribution as shared infrastructure (VERDICT r1 #10):
EMA parity vs the reference torch module, plus its two new consumers
(GAN random-init element counts, LayoutDM forced-pad sampling)."""

import numpy as np
import pytest

from ralf_tpu.core.seq_length import SeqLengthDistribution

S = 7


def test_ema_matches_reference_module():
    """Bit-parity with the reference SeqLengthDistribution
    (`common/common.py:167-197`), including the empty-layout edge where
    count-0 mass silently leaves the histogram."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from image2layout.train.models.common.common import (
        SeqLengthDistribution as RefDist,
    )

    ours = SeqLengthDistribution(S)
    ref = RefDist(S)
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = rng.integers(0, S + 1, size=16)  # includes empty layouts
        mask = np.arange(S)[None, :] < n[:, None]
        ours.update(mask)
        ref.update(torch.tensor(mask))
    np.testing.assert_allclose(
        ours.n_elements_prob, ref.n_elements_prob.numpy(), rtol=1e-6
    )


def test_sample_range_and_distribution():
    d = SeqLengthDistribution(S, weight=0.0)  # weight 0 -> pure batch hist
    mask = np.zeros((10, S), bool)
    mask[:, :3] = True  # every layout has exactly 3 elements
    d.update(mask)
    out = d.sample(np.random.default_rng(1), 64)
    assert out.shape == (64,)
    assert (out == 3).all()


def test_gan_init_respects_n_elements():
    from ralf_tpu.models.gan_common import random_init_layout

    K = 4
    n = np.asarray([1, 3, 5])
    packed = random_init_layout(np.random.default_rng(2), 3, S, K,
                                n_elements=n)
    cls = packed[:, :, 0].argmax(-1)
    for b in range(3):
        assert (cls[b, n[b]:] == K - 1).all(), cls[b]  # no-object beyond n
    # without n_elements the no-object class stays a free draw
    free = random_init_layout(np.random.default_rng(2), 64, S, K)
    assert (free[:, :, 0].argmax(-1) == K - 1).mean() < 0.5


def test_layoutdm_seq_dist_pins_element_counts():
    import jax

    from ralf_tpu.core.conditioning import Condition
    from ralf_tpu.core.sampling import SamplingConfig
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
    from ralf_tpu.models.base import GeneratorConfig
    from ralf_tpu.models.diffusion import LayoutDMGenerator

    tok = LayoutSequenceTokenizer(TokenizerConfig(
        num_labels=3, max_seq_length=5, num_bin=8,
        special_tokens=("pad", "mask"),
    ))
    gen = LayoutDMGenerator(
        tok,
        GeneratorConfig(d_model=32, nhead=2, num_encoder_layers=1,
                        num_decoder_layers=1, dim_feedforward=64,
                        backbone="resnet18"),
        num_timesteps=4, image_hw=(64, 48), use_seq_dist=True,
    )
    # train the EMA to "always 2 elements"
    d = gen.seq_dist
    d.weight = 0.0
    mask = np.zeros((8, 5), bool)
    mask[:, :2] = True
    d.update(mask)

    variables = gen.init(jax.random.PRNGKey(0), batch_size=1)
    B = 3
    cond = Condition(task="uncond",
                     image=np.zeros((B, 64, 48, 4), np.float32))
    layout = gen.sample(variables, cond, SamplingConfig(name="deterministic"),
                        jax.random.PRNGKey(1))
    counts = np.asarray(layout.mask).sum(1)
    assert (counts <= 2).all(), counts  # pads beyond n are pinned
