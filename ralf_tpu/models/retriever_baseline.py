"""Top-1 retrieval copy baseline as a Generator.

Parity target: `image2layout/train/models/retrieval/retriever.py:91-132`
(+ `cross_retriever.py` for the cross-dataset variant): a non-learnable
"model" that answers every query with its nearest gallery neighbor's
layout.  Cross-dataset operation = construct with a Retriever built from
the other dataset's train split.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ralf_tpu.core.layout import Layout
from ralf_tpu.retrieval.retriever import Retriever


class RetrieverGenerator:
    def __init__(self, retriever: Retriever) -> None:
        self.retriever = retriever
        self.tokenizer = None
        self.task = "uncond"

    @classmethod
    def build(cls, gallery_dataset, backbone: str = "saliency") -> "RetrieverGenerator":
        return cls(Retriever.build(gallery_dataset, backbone))

    def init(self, key, batch_size: int = 1):
        return {"params": {}}  # non-learnable

    def sample(self, variables, cond_batch: dict, rng=None, key=None) -> Layout:
        return self.retriever.predict_top1(np.asarray(cond_batch["image"]))
