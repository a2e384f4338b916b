"""Generator protocol — the contract every model family implements.

Mirrors the reference BaseModel surface
(`image2layout/train/models/common/base_model.py:118-389`): preprocess /
train_loss / sample / postprocess, adapted to pure-functional JAX: params
are explicit pytrees, sampling takes a PRNG key, `Condition` replaces the
ConditionalInputsForDiscreteLayout dataclasses (`base_model.py:56-109`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Protocol

import jax
import numpy as np

from ralf_tpu.core.conditioning import Condition
from ralf_tpu.core.layout import Layout
from ralf_tpu.core.sampling import SamplingConfig


class Generator(Protocol):
    """Duck-typed generator interface used by the trainer and inference."""

    def init(self, key: jax.Array) -> Any:
        """Create the parameter/state pytree."""

    def preprocess(self, batch: dict, rng: np.random.Generator) -> tuple[dict, dict]:
        """Host-side: batch -> (model_inputs, targets), fixed shapes."""

    def loss(self, variables, inputs: dict, targets: dict, *, train: bool,
             rngs: Optional[dict] = None) -> tuple[jax.Array, dict]:
        """Jittable scalar loss + aux metrics."""

    def sample(self, variables, cond: Condition, sampling: SamplingConfig,
               key: jax.Array) -> Layout:
        """Generate layouts for a Condition."""


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024  # 4 * d_model (`models/autoreg.py:51`)
    dropout: float = 0.1
    backbone: str = "resnet50"
    label_smoothing: float = 0.1
    dtype: Any = None  # None -> float32
