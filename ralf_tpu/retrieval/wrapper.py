"""Retrieval-augmented batch loading.

Parity target: `image2layout/train/helpers/retrieval_dataset_wrapper.py`
(+ the random/cross-dataset variants).  The reference materializes k
neighbors with 16 separate HF-dataset random reads per sample inside
DataLoader workers (`:89-148`) — an input bottleneck SURVEY §3.1 calls
out.  Here the whole epoch's neighbor indices come from one on-device
top-k table and neighbors are gathered as single numpy fancy-index ops.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ralf_tpu.data.dataset import BatchLoader, LayoutDatasetBase
from ralf_tpu.retrieval.retriever import Retriever


class RetrievalAugmentedLoader:
    """Wraps a BatchLoader; adds batch['retrieved'] = {k: [B, K, S]}.

    db_dataset is the gallery (always the train split, or the *other*
    dataset for the cross-dataset generalization study —
    `helpers/retrieval_cross_dataset_wrapper.py`).
    """

    def __init__(
        self,
        loader: BatchLoader,
        retriever: Retriever,
        top_k: int = 16,
        is_train_split: bool = False,
        random_retrieval: bool = False,  # ablation `random_retrieval_dataset_wrapper.py`
        table: Optional[np.ndarray] = None,
        seed: int = 0,
        feats_table: Optional[np.ndarray] = None,  # [G, D] frozen-tower feats
    ) -> None:
        self.loader = loader
        self.retriever = retriever
        self.top_k = top_k
        self._rng = np.random.default_rng(seed)
        self.random_retrieval = random_retrieval
        self.feats_table = feats_table
        if table is None and not random_retrieval:
            table = retriever.precompute_table(
                loader.dataset, top_k, is_train_split=is_train_split
            )
        self.table = table

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def dataset(self) -> LayoutDatasetBase:
        return self.loader.dataset

    def __iter__(self) -> Iterator[dict]:
        n_gallery = self.retriever.features.shape[0]
        for batch in self.loader:
            idx = batch["indices"]
            if self.random_retrieval:
                nbrs = self._rng.integers(
                    0, n_gallery, size=(len(idx), self.top_k)
                )
            else:
                nbrs = self.table[idx][:, : self.top_k]
            batch["retrieved"] = self.retriever.gather_neighbors(nbrs)
            if self.feats_table is not None:
                # precomputed frozen-tower features (see
                # RALFGenerator.precompute_retrieved_feats): skips the
                # per-batch B*K FIDNet forward inside the model
                batch["retrieved"]["feats"] = self.feats_table[nbrs]
            batch["retrieved_indices"] = nbrs
            yield batch
