"""Element-count (sequence-length) distribution — shared infrastructure.

Parity target: `common/common.py:167-197` SeqLengthDistribution, a
0.999-EMA over the per-batch histogram of element counts, sampled to
initialize element counts for non-autoregressive generation.  The
reference buries it inside MaskGIT (`maskgit.py:114,186,285`); here it is
a first-class core module shared by MaskGIT, the GAN family (element
counts for the random layout initializer) and LayoutDM/VQDiffusion
(forced trailing pads through the strong-constraint path).

Host-side numpy by design: it is a training-time statistics buffer
updated once per batch (a ~10-float EMA — device round-trips would cost
more than the arithmetic) and read only when building sampling inputs.
"""

from __future__ import annotations

import numpy as np


class SeqLengthDistribution:
    """EMA of the element-count histogram; counts are in [1, S]."""

    def __init__(self, max_seq_length: int, weight: float = 0.999) -> None:
        self.max_seq_length = max_seq_length
        self.weight = weight
        self.n_elements_prob = np.full(
            (max_seq_length,), 1.0 / max_seq_length, np.float64
        )

    def update(self, mask: np.ndarray) -> None:
        """mask: [B, S] bool element mask.  EMA step exactly as
        `common.py:184-191`: bincount over counts 1..S (empty layouts fall
        out of the histogram, shrinking total mass like the reference)."""
        mask = np.asarray(mask)
        assert mask.ndim == 2, mask.shape
        S = self.max_seq_length
        n = mask.sum(1).astype(np.int64)
        batch_prob = np.bincount(n, minlength=S + 1)[1:S + 1] / mask.shape[0]
        self.n_elements_prob = (
            self.weight * self.n_elements_prob + (1 - self.weight) * batch_prob
        )

    def sample(self, rng: np.random.Generator, batch_size: int) -> np.ndarray:
        """[batch_size] element counts in [1, S] ~ the EMA histogram
        (`common.py:192-197` torch.multinomial equivalent)."""
        p = self.n_elements_prob / self.n_elements_prob.sum()
        return rng.choice(self.max_seq_length, size=batch_size, p=p) + 1
