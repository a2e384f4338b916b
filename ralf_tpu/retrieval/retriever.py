"""TPU-native retrieval: HBM-resident brute-force top-k over the gallery.

The reference builds a faiss inner-product index over DreamSim embeddings
and precomputes top-k lookup tables to disk
(`image2layout/train/models/retrieval/retriever.py:79-229`,
`preprocess/build_retrieval_indexes.py:42-81`).  On TPU the galleries are
tiny by MXU standards (PKU 7.7k x 512, CGL 48.5k x 512 ≈ 100 MB fp32), so
ANN machinery is replaced by one jitted matmul + `lax.top_k` scan:

    scores = q @ G.T          (MXU, bf16-able)
    idx    = top_k(scores, k) (with optional self-exclusion)

For galleries sharded across a mesh axis, `sharded_topk` computes local
top-k per shard under `shard_map` and reduces the gathered candidates —
collectives ride ICI (SURVEY §2.10's TP-like decomposition of retrieval).

Feature backbones: `coarse_saliency` (16x16 downsampled saliency,
`train/models/retrieval/image.py:35-44`) works out of the box; the deep
backbones — DreamSim (the paper's default), CLIP-ViT, VGG16
(`retrieval/image.py:29-97`) — are on-device flax towers
(models/towers.py) whose pretrained weights load through
`utils/torch_port` when a checkpoint file exists (zero-egress
environments run them randomly initialized, loudly).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ralf_tpu.core.layout import Layout


# --------------------------------------------------------------------------
# feature backbones
# --------------------------------------------------------------------------


def coarse_saliency_features(images: jax.Array, grid: int = 16) -> jax.Array:
    """[B, H, W, 4] -> L2-normalized [B, grid*grid] saliency thumbnails."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        # uint8 fast host pipeline (BatchLoader image_dtype): the scale is
        # immaterial to the L2-normalized thumbnail, cast suffices
        images = images.astype(jnp.float32) * (1.0 / 255.0)
    sal = images[..., 3:4]
    B, H, W, _ = sal.shape
    feat = jax.image.resize(sal, (B, grid, grid, 1), method="linear")
    feat = feat.reshape(B, grid * grid)
    norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-8)


BACKBONE_NAMES = ("saliency", "dreamsim", "clip", "vgg")


@functools.lru_cache(maxsize=None)
def get_backbone(kind: str, cache_dir: str = "cache") -> Callable:
    """Jitted `fn(images [B,H,W,4]) -> [B,D]` gallery/query embedder.

    `saliency` is the 16x16 downsampled saliency thumbnail
    (`train/models/retrieval/image.py:35-44`).  `dreamsim` (the paper's
    default), `clip` and `vgg` (`retrieval/image.py:29-97`) are flax
    ports of the torch towers (models/towers.py) running fully on-device;
    pretrained weights load from `{cache_dir}` through
    `utils/torch_port.load_tower_if_available` when present, otherwise
    the tower runs randomly initialized with a loud warning (this
    environment cannot download weights).
    """
    if kind == "saliency":
        return jax.jit(coarse_saliency_features)
    if kind in ("dreamsim", "clip", "vgg"):
        from ralf_tpu.models.towers import build_feature_fn

        return build_feature_fn(kind, cache_dir)
    raise ValueError(f"unknown retrieval backbone {kind!r}; "
                     f"choose from {BACKBONE_NAMES}")


# --------------------------------------------------------------------------
# top-k scans
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "exclude_self"))
def exact_topk(
    query: jax.Array,  # [B, D]
    gallery: jax.Array,  # [N, D]
    k: int,
    exclude_self: bool = False,
    query_ids: Optional[jax.Array] = None,  # [B] gallery row of each query
) -> jax.Array:
    """Inner-product top-k indices [B, k]; optionally drop the query's own
    gallery row (train-split self-retrieval, `retriever.py:149-186`)."""
    scores = jnp.dot(query, gallery.T, preferred_element_type=jnp.float32)
    if exclude_self:
        scores = jnp.where(
            jnp.arange(gallery.shape[0])[None, :] == query_ids[:, None],
            -jnp.inf,
            scores,
        )
    _, idx = jax.lax.top_k(scores, k)
    return idx


def sharded_topk(
    mesh: Mesh,
    axis: str,
    query: jax.Array,  # [B, D] replicated
    gallery: jax.Array,  # [N, D] sharded along `axis`
    k: int,
    *,
    exclude_self: bool = False,
    query_ids: Optional[jax.Array] = None,  # [B] gallery row of each query
    n_valid: Optional[int] = None,  # real rows; rest is shard padding
) -> jax.Array:
    """Mesh-sharded gallery scan: local top-k per shard, then a global
    reduce over the gathered (score, index) candidates.

    Matches `exact_topk` semantics: optional self-exclusion for
    train-split tables, and rows >= `n_valid` (added to pad N to a
    multiple of the shard count) never surface as neighbors.
    """
    n_shards = mesh.shape[axis]
    shard_n = gallery.shape[0] // n_shards
    if shard_n * n_shards != gallery.shape[0]:
        raise ValueError(
            f"gallery rows ({gallery.shape[0]}) must be a multiple of the "
            f"'{axis}' axis size ({n_shards}); pad the gallery first"
        )
    # local candidate count: clamped for tiny shards; the global reduce
    # over shards*k_local gathered candidates still recovers exact top-k
    k_local = min(k, shard_n)
    if k > n_shards * k_local:
        raise ValueError(f"k={k} exceeds gallery size {gallery.shape[0]}")
    n_real = gallery.shape[0] if n_valid is None else n_valid
    if query_ids is None:
        query_ids = jnp.zeros((query.shape[0],), jnp.int32)

    def local(q, g, qid):
        s = jnp.dot(q, g.T, preferred_element_type=jnp.float32)  # [B, N/shards]
        rows = jax.lax.axis_index(axis) * shard_n + jnp.arange(shard_n)
        dead = rows[None, :] >= n_real
        if exclude_self:
            dead = dead | (rows[None, :] == qid[:, None])
        s = jnp.where(dead, -jnp.inf, s)
        val, idx = jax.lax.top_k(s, k_local)
        idx = idx + jax.lax.axis_index(axis) * shard_n
        # gather candidates from all shards -> [B, shards*k]
        val = jax.lax.all_gather(val, axis, axis=1).reshape(val.shape[0], -1)
        idx = jax.lax.all_gather(idx, axis, axis=1).reshape(idx.shape[0], -1)
        gv, gi = jax.lax.top_k(val, k)
        return jnp.take_along_axis(idx, gi, axis=1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(query, gallery, query_ids)


# --------------------------------------------------------------------------
# Retriever
# --------------------------------------------------------------------------


class Retriever:
    """Gallery of (features, layouts) with on-device top-k lookup.

    Also serves as the non-learnable Top-1 copy baseline: `predict_top1`
    mirrors the reference `Retriever.sample` (`retriever.py:91-132`) which
    copies the nearest neighbor's layout.
    """

    def __init__(
        self,
        features: np.ndarray,  # [N, D] (will be L2-normalized)
        layouts: dict,  # padded layout arrays [N, S]
        backbone: str = "saliency",
        cache_dir: str = "cache",
    ) -> None:
        f = np.asarray(features, np.float32)
        f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
        self.features = jnp.asarray(f)
        self.layouts = {k: np.asarray(v) for k, v in layouts.items()}
        self.backbone_name = backbone
        self.backbone = get_backbone(backbone, cache_dir)
        # gallery-sharding state (see shard_gallery)
        self.mesh: Optional[Mesh] = None
        self.mesh_axis: Optional[str] = None
        self._sharded_features: Optional[jax.Array] = None

    def shard_gallery(self, mesh: Mesh, axis: str = "gallery") -> "Retriever":
        """Distribute the gallery rows over a mesh axis.

        After this, `topk` (and therefore `precompute_table` and
        `RetrievalAugmentedLoader`) runs the `sharded_topk` scan: each
        shard holds N/|axis| gallery rows in its own HBM, local top-k
        candidates are all-gathered over ICI and reduced.  This is what
        lets CGL-scale (or much larger) galleries exceed one chip's HBM
        — the reference's faiss index is host-RAM-bound instead
        (`retriever.py:79-229`).  Rows are zero-padded to a multiple of
        the axis size; padding never surfaces as a neighbor.
        """
        n_shards = mesh.shape[axis]
        pad = (-self.features.shape[0]) % n_shards
        f = jnp.pad(self.features, ((0, pad), (0, 0)))
        self._sharded_features = jax.device_put(
            f, NamedSharding(mesh, P(axis, None))
        )
        self.mesh, self.mesh_axis = mesh, axis
        return self

    @classmethod
    def build(
        cls,
        dataset,
        backbone: str = "saliency",
        batch_size: int = 256,
        cache_dir: Optional[str] = None,
        dataset_name: Optional[str] = None,
    ) -> "Retriever":
        """Extract gallery features for a LayoutDatasetBase.

        With `cache_dir`, features load from / persist to the
        `{ds}_{backbone}_gallery_features.npz` cache (ralf_tpu.cache), so
        repeated train/inference runs do zero embedding work — the
        reference's cache/ convention (`retriever.py:134-229`)."""
        n = len(dataset)
        name = dataset_name or getattr(getattr(dataset, "cfg", None), "name", None)
        if cache_dir and name:
            from ralf_tpu import cache as cache_mod

            cached = cache_mod.load_gallery_features(
                cache_dir, name, backbone, expect_rows=n
            )
            if cached is not None:
                return cls(cached, dataset.get_layouts(np.arange(n)),
                           backbone, cache_dir)
        fn = get_backbone(backbone, cache_dir or "cache")
        feats = []
        for s in range(0, n, batch_size):
            idx = np.arange(s, min(s + batch_size, n))
            feats.append(np.asarray(fn(jnp.asarray(dataset.get_images(idx)))))
        features = np.concatenate(feats, 0)
        if cache_dir and name:
            from ralf_tpu import cache as cache_mod

            cache_mod.save_gallery_features(cache_dir, name, backbone, features)
        return cls(features, dataset.get_layouts(np.arange(n)), backbone,
                   cache_dir or "cache")

    def embed(self, images: np.ndarray) -> jax.Array:
        return self.backbone(jnp.asarray(images))

    def topk(
        self,
        query_feats: jax.Array,
        k: int,
        exclude_self: bool = False,
        query_ids: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        qid = (
            jnp.asarray(query_ids)
            if query_ids is not None
            else jnp.zeros((query_feats.shape[0],), jnp.int32)
        )
        if self.mesh is not None:
            idx = sharded_topk(
                self.mesh,
                self.mesh_axis,
                query_feats,
                self._sharded_features,
                k,
                exclude_self=exclude_self,
                query_ids=qid,
                n_valid=self.features.shape[0],
            )
        else:
            idx = exact_topk(query_feats, self.features, k, exclude_self, qid)
        return np.asarray(idx)

    def gather_neighbors(self, idx: np.ndarray) -> dict:
        """[B, K] gallery indices -> {'label': [B,K,S], ..., 'mask': [B,K,S]}."""
        from ralf_tpu.data import native

        out = native.gather_neighbors(self.layouts, np.asarray(idx))
        if out is not None:
            return out
        return {key: arr[idx] for key, arr in self.layouts.items()}

    def predict_top1(self, images: np.ndarray) -> Layout:
        """Top-1 copy baseline: nearest gallery layout per query image."""
        idx = self.topk(self.embed(images), k=1)[:, 0]
        return Layout.fromdict({k: v[idx] for k, v in self.layouts.items()})

    def precompute_table(
        self, dataset, k: int, is_train_split: bool, batch_size: int = 256
    ) -> np.ndarray:
        """Top-k table [N, k] for a whole split — the file-cache equivalent
        of `cache/{ds}_{split}_..._top_k{K}.pt` (`retriever.py:188-229`)."""
        out = np.zeros((len(dataset), k), np.int64)
        for s in range(0, len(dataset), batch_size):
            idx = np.arange(s, min(s + batch_size, len(dataset)))
            q = self.embed(dataset.get_images(idx))
            out[idx] = self.topk(
                q, k, exclude_self=is_train_split, query_ids=idx
            )
        return out


def mmr_rerank(
    features: np.ndarray,  # [N, D] gallery features (normalized)
    candidates: np.ndarray,  # [B, C] candidate indices (C >= k)
    query_feats: np.ndarray,  # [B, D]
    k: int,
    lam: float = 0.5,
) -> np.ndarray:
    """Maximal-marginal-relevance diversity rerank
    (`train/models/retrieval/reranker.py:14-70`): greedily pick the
    candidate maximizing lam*sim(query) - (1-lam)*max sim(already picked)."""
    B, C = candidates.shape
    out = np.zeros((B, k), np.int64)
    for b in range(B):
        cand = list(candidates[b])
        cf = features[candidates[b]]  # [C, D]
        qsim = cf @ query_feats[b]
        picked: list[int] = []
        picked_feat = []
        for slot in range(k):
            if picked_feat:
                div = np.max(np.stack(picked_feat) @ cf.T, axis=0)
            else:
                div = np.zeros(len(cand))
            score = lam * qsim - (1 - lam) * div
            score[[i for i, c in enumerate(cand) if c in picked]] = -np.inf
            j = int(np.argmax(score))
            picked.append(cand[j])
            picked_feat.append(cf[j])
            out[b, slot] = cand[j]
    return out
