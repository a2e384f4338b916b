"""ralf_tpu — a TPU-native content-aware layout generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CyberAgentAILab/RALF (CVPR 2024): retrieval-augmented, content-aware
layout generation on e-commerce poster canvases.

Design stance (vs the PyTorch reference at /root/reference):
  * pure-functional flax models, explicit PRNG keys, static shapes
  * one `jax.sharding.Mesh` for all parallelism (data / retrieval-gallery axes)
  * KV-cached, fully-batched, on-device-constrained AR decoding
    (the reference re-forwards the full prefix 50x per sample with
    host-side logit restriction — `image2layout/train/models/autoreg.py:166-192`)
  * retrieval as an HBM-resident batched matmul top-k scan instead of a
    faiss index + precomputed lookup files
    (`image2layout/train/models/retrieval/retriever.py:79-229`)
"""

__version__ = "0.1.0"

from ralf_tpu.core.layout import Layout  # noqa: F401
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig  # noqa: F401
