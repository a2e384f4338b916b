"""Layout batch pytree — the core data structure of the framework.

A *layout* is a variable-length set of up to ``S`` elements on a canvas,
each with a categorical ``label`` and a normalized geometry
``(center_x, center_y, width, height)`` in [0, 1].  Variable length is
expressed with a boolean ``mask`` over a statically shaped ``[B, S]``
batch — static shapes are what lets every consumer compile to a single
XLA program.

Mirrors the dict-of-tensors convention of the reference
(`image2layout/train/data.py:42-117` builds exactly these keys via its
collate_fn) but as a typed, jit-friendly pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Canonical ordering of geometry attributes.  This ordering determines the
# per-attribute token-vocabulary offsets and must stay fixed independent of
# the tokenizer's var_order (reference: `image2layout/train/global_variables.py:1`
# and the enumerate over GEO_KEYS in `helpers/layout_tokenizer.py:322-326`).
GEO_KEYS = ("center_x", "center_y", "width", "height")


@struct.dataclass
class Layout:
    """A batch of padded layouts.

    Attributes:
      label:    int32  [B, S]  element class id; 0 where masked out.
      center_x: float32 [B, S]
      center_y: float32 [B, S]
      width:    float32 [B, S]
      height:   float32 [B, S]
      mask:     bool   [B, S]  True for valid elements.
    """

    label: jax.Array
    center_x: jax.Array
    center_y: jax.Array
    width: jax.Array
    height: jax.Array
    mask: jax.Array

    @property
    def batch_size(self) -> int:
        return self.label.shape[0]

    @property
    def max_elements(self) -> int:
        return self.label.shape[1]

    def geo(self, key: str) -> jax.Array:
        return getattr(self, key)

    def num_elements(self) -> jax.Array:
        """Per-sample count of valid elements, int32 [B]."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def asdict(self) -> dict[str, jax.Array]:
        return {
            "label": self.label,
            "center_x": self.center_x,
            "center_y": self.center_y,
            "width": self.width,
            "height": self.height,
            "mask": self.mask,
        }

    @classmethod
    def fromdict(cls, d: dict[str, Any]) -> "Layout":
        return cls(
            label=jnp.asarray(d["label"], jnp.int32),
            center_x=jnp.asarray(d["center_x"], jnp.float32),
            center_y=jnp.asarray(d["center_y"], jnp.float32),
            width=jnp.asarray(d["width"], jnp.float32),
            height=jnp.asarray(d["height"], jnp.float32),
            mask=jnp.asarray(d["mask"], bool),
        )

    def bbox_ltrb(self, clamp: bool = True) -> tuple[jax.Array, ...]:
        """(left, top, right, bottom) corners, optionally clamped to canvas."""
        l = self.center_x - self.width / 2.0
        r = self.center_x + self.width / 2.0
        t = self.center_y - self.height / 2.0
        b = self.center_y + self.height / 2.0
        if clamp:
            l = jnp.maximum(l, 0.0)
            r = jnp.minimum(r, 1.0)
            t = jnp.maximum(t, 0.0)
            b = jnp.minimum(b, 1.0)
        return l, t, r, b

    def clean_padding(self) -> "Layout":
        """Zero out all attributes at masked positions (canonical form)."""
        m = self.mask
        return Layout(
            label=jnp.where(m, self.label, 0),
            center_x=jnp.where(m, self.center_x, 0.0),
            center_y=jnp.where(m, self.center_y, 0.0),
            width=jnp.where(m, self.width, 0.0),
            height=jnp.where(m, self.height, 0.0),
            mask=m,
        )


def random_layout(
    rng: np.random.Generator,
    batch_size: int,
    max_elements: int,
    num_labels: int,
) -> Layout:
    """Synthetic layout batch for tests/benchmarks (host-side numpy)."""
    n = rng.integers(1, max_elements + 1, size=(batch_size,))
    mask = np.arange(max_elements)[None, :] < n[:, None]
    label = rng.integers(0, num_labels, size=(batch_size, max_elements))
    cx = rng.uniform(0.05, 0.95, size=(batch_size, max_elements))
    cy = rng.uniform(0.05, 0.95, size=(batch_size, max_elements))
    w = rng.uniform(0.05, 0.5, size=(batch_size, max_elements))
    h = rng.uniform(0.05, 0.5, size=(batch_size, max_elements))
    out = Layout(
        label=jnp.asarray(np.where(mask, label, 0), jnp.int32),
        center_x=jnp.asarray(np.where(mask, cx, 0.0), jnp.float32),
        center_y=jnp.asarray(np.where(mask, cy, 0.0), jnp.float32),
        width=jnp.asarray(np.where(mask, w, 0.0), jnp.float32),
        height=jnp.asarray(np.where(mask, h, 0.0), jnp.float32),
        mask=jnp.asarray(mask, bool),
    )
    return out
