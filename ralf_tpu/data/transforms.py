"""Instance-wise layout transforms.

Parity with `image2layout/train/helpers/hfds_instance_wise_transforms.py`:
  * shuffle           — random element permutation (GAN/diffusion input)
  * sort_label        — stable sort by label id
  * sort_lexicographic— top-left raster order: sort by (top, left)
AR models use [sort_label, sort_lexicographic]; GAN/diffusion use [shuffle]
(experiment yamls).  Host-side numpy on a single sample's arrays.
"""

from __future__ import annotations

import numpy as np

GEO = ("center_x", "center_y", "width", "height")


def _apply_order(sample: dict, order: np.ndarray) -> dict:
    out = dict(sample)
    for key in ("label", *GEO):
        out[key] = np.asarray(sample[key])[order]
    return out


def shuffle(sample: dict, rng: np.random.Generator) -> dict:
    n = len(sample["label"])
    return _apply_order(sample, rng.permutation(n))


def sort_label(sample: dict, rng=None) -> dict:
    order = np.argsort(np.asarray(sample["label"]), kind="stable")
    return _apply_order(sample, order)


def sort_lexicographic(sample: dict, rng=None) -> dict:
    """Raster order: top edge first, then left edge (`...transforms.py:70-90`)."""
    top = np.asarray(sample["center_y"]) - np.asarray(sample["height"]) / 2
    left = np.asarray(sample["center_x"]) - np.asarray(sample["width"]) / 2
    order = np.lexsort((left, top))
    return _apply_order(sample, order)


TRANSFORMS = {
    "shuffle": shuffle,
    "sort_label": sort_label,
    "sort_lexicographic": sort_lexicographic,
}


def compose(names: list[str]):
    fns = [TRANSFORMS[n] for n in names if n in TRANSFORMS]

    def apply(sample: dict, rng: np.random.Generator) -> dict:
        for fn in fns:
            sample = fn(sample, rng)
        return sample

    return apply
