"""Native C++ collator vs the pure-python transform path."""

import numpy as np
import pytest

from ralf_tpu.core.layout import random_layout
from ralf_tpu.data import native
from ralf_tpu.data.transforms import sort_label, sort_lexicographic

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def make_arrays(B=8, S=10, seed=0):
    rng = np.random.default_rng(seed)
    lay = random_layout(rng, B, S, 3)
    return {
        "label": np.asarray(lay.label, np.int64),
        "center_x": np.asarray(lay.center_x, np.float32),
        "center_y": np.asarray(lay.center_y, np.float32),
        "width": np.asarray(lay.width, np.float32),
        "height": np.asarray(lay.height, np.float32),
        "mask": np.asarray(lay.mask),
    }


def python_reference(arrays, transforms):
    out = {k: v.copy() for k, v in arrays.items()}
    fns = {"sort_label": sort_label, "sort_lexicographic": sort_lexicographic}
    B = arrays["label"].shape[0]
    for b in range(B):
        n = int(arrays["mask"][b].sum())
        if n <= 1:
            continue
        sample = {k: arrays[k][b, :n] for k in
                  ("label", "center_x", "center_y", "width", "height")}
        for t in transforms:
            sample = fns[t](sample)
        for k, v in sample.items():
            out[k][b, :n] = v
    return out


@pytest.mark.parametrize("transforms", [
    ["sort_label"], ["sort_lexicographic"], ["sort_label", "sort_lexicographic"]
])
def test_native_matches_python_sorts(transforms):
    arrays = make_arrays()
    expected = python_reference(arrays, transforms)
    got = native.collate_batch(arrays, transforms, seed=0)
    assert got is not None
    for k in ("label", "center_x", "center_y", "width", "height"):
        np.testing.assert_array_equal(got[k], expected[k], err_msg=k)
    np.testing.assert_array_equal(got["mask"], arrays["mask"])


def test_native_shuffle_is_permutation():
    arrays = make_arrays(seed=1)
    got = native.collate_batch(arrays, ["shuffle"], seed=7)
    for b in range(arrays["label"].shape[0]):
        n = int(arrays["mask"][b].sum())
        assert sorted(got["center_x"][b, :n].tolist()) == sorted(
            arrays["center_x"][b, :n].tolist()
        )
    got2 = native.collate_batch(make_arrays(seed=1), ["shuffle"], seed=7)
    np.testing.assert_array_equal(got["label"], got2["label"])  # deterministic


def test_native_gather_neighbors():
    rng = np.random.default_rng(2)
    gallery = make_arrays(B=32, seed=3)
    idx = rng.integers(0, 32, size=(4, 5))
    got = native.gather_neighbors(gallery, idx)
    assert got is not None
    for k in gallery:
        np.testing.assert_array_equal(got[k], gallery[k][idx], err_msg=k)
