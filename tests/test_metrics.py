"""Golden-case metric tests — the same hand-computed tables as the
reference (`tests/train/helpers/test_metric.py`), plus alignment/overlap
sanity and distribution-metric self-consistency."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ralf_tpu.core.layout import Layout
from ralf_tpu.eval.metrics import (
    compute_alignment,
    compute_generative_model_scores,
    compute_overlap,
    compute_overlay,
    compute_saliency_aware_metrics,
    compute_underlay_effectiveness,
    compute_validity,
    nanmean,
)

LABELS = {"text": 0, "logo": 1, "underlay": 2}
S = 4  # pad to 4 elements


def make_layout(label_names, cx, cy, w, h):
    n = len(label_names)
    pad = lambda xs: np.pad(np.asarray(xs, np.float32), (0, S - n))
    return Layout(
        label=jnp.asarray(
            np.pad(np.asarray([LABELS[x] for x in label_names]), (0, S - n))
        )[None],
        center_x=jnp.asarray(pad(cx))[None],
        center_y=jnp.asarray(pad(cy))[None],
        width=jnp.asarray(pad(w))[None],
        height=jnp.asarray(pad(h))[None],
        mask=jnp.asarray(np.arange(S) < n)[None],
    )


UNDERLAY_CASES = [
    # (labels, cx, cy, w, h, loose, strict)
    (["text", "underlay"], [0.5, 0.5], [0.5, 0.5], [0.2, 0.4], [0.2, 0.4], 1.0, 1.0),
    (["text", "underlay"], [0.1, 0.9], [0.1, 0.9], [0.2, 0.2], [0.2, 0.2], 0.0, 0.0),
    (["text", "underlay"], [0.5, 0.5], [0.5, 0.5], [0.2, 0.6], [0.6, 0.2], 1 / 3, 0.0),
    (
        ["text", "underlay", "text"],
        [0.5, 0.5, 0.5],
        [0.5, 0.5, 0.5],
        [0.2, 0.6, 0.3],
        [0.6, 0.2, 0.1],
        1.0,
        1.0,
    ),
    (
        ["text", "underlay", "underlay"],
        [0.5, 0.5, 0.5],
        [0.5, 0.5, 0.5],
        [0.2, 0.3, 0.4],
        [0.2, 0.3, 0.4],
        1.0,
        1.0,
    ),
]


@pytest.mark.parametrize("case", UNDERLAY_CASES)
def test_underlay_effectiveness_golden(case):
    labels, cx, cy, w, h, loose, strict = case
    lay = make_layout(labels, cx, cy, w, h)
    out = compute_underlay_effectiveness(lay, underlay_id=LABELS["underlay"])
    assert math.isclose(float(out["underlay_effectiveness_loose"][0]), loose, rel_tol=1e-4)
    assert math.isclose(float(out["underlay_effectiveness_strict"][0]), strict, rel_tol=1e-4)


def test_overlay_golden():
    lay = make_layout(
        ["text", "text", "text"], [0.3, 0.5, 0.7], [0.5, 0.5, 0.5],
        [0.4, 0.4, 0.4], [0.4, 0.4, 0.4],
    )
    out = compute_overlay(lay, underlay_id=LABELS["underlay"])
    assert math.isclose(float(out[0]), (1 / 3 + 1 / 3 + 0) / 3, rel_tol=1e-4)

    # single element / underlay-only -> no result (NaN, dropped by nanmean)
    for labels in (["text"], ["underlay"]):
        lay1 = make_layout(labels, [0.3], [0.5], [0.4], [0.4])
        out1 = compute_overlay(lay1, underlay_id=LABELS["underlay"])
        assert np.isnan(float(out1[0]))
    assert math.isclose(nanmean(jnp.asarray([0.5, np.nan])), 0.5)


def test_alignment_zero_for_aligned():
    # two boxes sharing the same left edge -> perfectly aligned -> 0
    lay = make_layout(
        ["text", "text"], [0.3, 0.3], [0.2, 0.8], [0.2, 0.2], [0.2, 0.2]
    )
    out = compute_alignment(lay)
    assert float(out[0]) == pytest.approx(0.0, abs=1e-6)


def test_overlap_golden():
    # identical boxes: ai/a1 = 1 both directions -> sum 2 / n 2 = 1
    lay = make_layout(["text", "text"], [0.5, 0.5], [0.5, 0.5], [0.2, 0.2], [0.2, 0.2])
    assert float(compute_overlap(lay)[0]) == pytest.approx(1.0, rel=1e-5)
    # disjoint boxes -> 0
    lay2 = make_layout(["text", "text"], [0.2, 0.8], [0.2, 0.8], [0.2, 0.2], [0.2, 0.2])
    assert float(compute_overlap(lay2)[0]) == pytest.approx(0.0, abs=1e-6)


def test_validity_filters_tiny():
    lay = make_layout(
        ["text", "text"], [0.5, 0.5], [0.5, 0.5], [0.2, 0.01], [0.2, 0.01]
    )
    filtered, ratio = compute_validity(lay)
    assert float(ratio) == pytest.approx(0.5)
    assert bool(filtered.mask[0, 0]) and not bool(filtered.mask[0, 1])


def test_saliency_aware_metrics():
    lay = make_layout(["text", "underlay"], [0.25, 0.75], [0.25, 0.75], [0.5, 0.5], [0.5, 0.5])
    H = W = 32
    img = np.zeros((1, H, W, 4), np.float32)
    img[..., :3] = 0.5
    img[0, :16, :16, 3] = 1.0  # saliency in top-left quadrant = text box
    out = compute_saliency_aware_metrics(
        lay, jnp.asarray(img), text_id=LABELS["text"], underlay_id=LABELS["underlay"]
    )
    # boxes cover TL and BR quadrants; saliency fully inside TL box
    # utilization = inv_saliency under boxes / total inv = 256/768
    assert float(out["utilization"][0]) == pytest.approx(256 / 768, rel=1e-5)
    # occlusion = mean saliency under boxes = 256/512
    assert float(out["occlusion"][0]) == pytest.approx(0.5, rel=1e-5)
    # flat image -> unreadability 0
    assert float(out["unreadability"][0]) == pytest.approx(0.0, abs=1e-6)


def test_generative_scores_identity():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(256, 16)).astype(np.float64)
    out = compute_generative_model_scores(feats, feats.copy())
    assert out["fid"] == pytest.approx(0.0, abs=1e-6)
    assert out["precision"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)
    assert out["coverage"] == pytest.approx(1.0)

    shifted = feats + 10.0
    out2 = compute_generative_model_scores(feats, shifted)
    assert out2["fid"] == pytest.approx(16 * 100.0, rel=1e-3)
    assert out2["precision"] == 0.0 and out2["recall"] == 0.0
