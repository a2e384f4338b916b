import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.sampling import (
    SamplingConfig,
    sample,
    top_k_filter,
    top_p_filter,
)


def test_deterministic_is_argmax():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [2.0, 0.0, 1.0]])
    out = sample(None, logits, SamplingConfig(name="deterministic"))
    assert out.tolist() == [1, 0]


def test_top_k_filter_keeps_k():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
    f = top_k_filter(logits, 2)
    kept = (f > -1e30).sum()
    assert int(kept) == 2


def test_top_p_always_keeps_argmax():
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    f = top_p_filter(logits, 0.01)
    assert bool(f[0, 0] > -1e30)
    assert int((f > -1e30).sum()) == 1


def test_top_p_mass():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    f = top_p_filter(logits, 0.8)
    kept = np.asarray(f[0] > -1e30)
    assert kept.tolist() == [True, True, False, False]


@pytest.mark.parametrize("name", ["random", "top_k", "top_p", "gumbel"])
def test_stochastic_within_support(name):
    key = jax.random.PRNGKey(0)
    logits = jnp.tile(jnp.asarray([[0.0, 1.0, 2.0, -1e9]]), (64, 1))
    cfg = SamplingConfig(name=name, temperature=1.0, top_k=2, top_p=0.9)
    out = sample(key, logits, cfg)
    assert out.shape == (64,)
    assert int(out.max()) <= 2  # the -1e9 logit is never sampled
    if name == "top_k":
        assert int(out.min()) >= 1  # only top-2 {1,2} survive


def test_temperature_sharpens():
    key = jax.random.PRNGKey(1)
    logits = jnp.tile(jnp.asarray([[0.0, 1.0]]), (512, 1))
    cold = sample(key, logits, SamplingConfig(name="random", temperature=0.05))
    frac = float((cold == 1).mean())
    assert frac > 0.99


def test_top_p_bisect_matches_sort_oracle():
    """The sort-free nucleus filter keeps exactly the same token sets as
    the sort+cumsum oracle across p values and random logits."""
    from ralf_tpu.core.sampling import top_p_filter, top_p_filter_bisect

    rng = jax.random.PRNGKey(0)
    for p in (0.3, 0.5, 0.9, 0.99):
        for i in range(3):
            rng, sub = jax.random.split(rng)
            logits = jax.random.normal(sub, (64, 518)) * 3.0
            a = np.asarray(top_p_filter(logits, p))
            b = np.asarray(top_p_filter_bisect(logits, p))
            keep_a, keep_b = np.isfinite(a) & (a > -1e30), np.isfinite(b) & (b > -1e30)
            diff = keep_a != keep_b
            if diff.any():
                # the oracle's sequential f32 cumsum drifts by up to ~5e-4
                # over 518 terms, while the bisect's masked tree-sums are
                # ~1e-7 — disagreements must be tokens whose true (f64)
                # inclusive prefix mass lies within that drift of p.
                probs = np.asarray(jax.nn.softmax(logits, axis=-1), np.float64)
                rows, cols = np.nonzero(diff)
                for r, c in zip(rows, cols):
                    mass = probs[r][probs[r] >= probs[r, c]].sum()
                    assert abs(mass - p) < 5e-4, (p, i, r, c, mass)
                assert diff.sum() <= 3, (p, i, int(diff.sum()))
            both = keep_a & keep_b
            np.testing.assert_allclose(a[both], b[both])
    # degenerate: p tiny -> only the argmax survives
    logits = jax.random.normal(jax.random.PRNGKey(9), (8, 32))
    b = np.asarray(top_p_filter_bisect(logits, 0.0001))
    keep = b > -1e30
    assert (keep.sum(-1) == 1).all()
    assert (np.argmax(np.asarray(logits), -1) == np.argmax(b, -1)).all()
