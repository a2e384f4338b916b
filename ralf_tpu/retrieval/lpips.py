"""LPIPS perceptual distance + the retrieval rerank arm.

Parity target: `preprocess/build_retrieval_indexes_LPIPS.py:1-154` — the
reference builds retrieval tables by EXACT pairwise LPIPS (`CacheLPIPS(
net="alex")`: AlexNet taps + the lpips package's learned per-channel
lins, input scaled by the lpips ScalingLayer) in an O(N^2) Python loop
that moves every cached feature dict host<->GPU per pair.

TPU redesign:
  * `net="alex"` (default, reference-exact math): the
    `models/towers.AlexNetFeatures` tap tower behind the lpips scaling
    layer; learned lins load from `{cache_dir}/lpips_alex.pth` (a full
    `lpips.LPIPS(net="alex")` state_dict) through
    `torch_port.port_lpips_lins` — absent that download, the package's
    own 'baseline' variant (uniform channel weights) with a loud warning;
  * `net="vgg"`: the in-tree VGG16 tower (LPIPS_TAPS —
    relu1_2/2_2/3_3/4_3/5_3), sharing the R_shm checkpoint — the r3
    fallback arm, kept for galleries whose VGG weights exist;
  * distances for a query against its candidate set are ONE jitted batched
    program ([B, C] pairs per call, taps computed once per image role);
  * it runs as a RERANK of the cheap backbone's top-M pool (O(N*M), not
    O(N^2)) — `build_caches --rerank lpips` writes the reordered table
    under backbone key 'lpips', mirroring the reference's
    `{ds}_{split}_lpips_wo_head_table_..._top_k{K}.pt` cache naming.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def lpips_scale(images01: jax.Array) -> jax.Array:
    """[0,1] RGB -> lpips input space: 2x-1 then the ScalingLayer
    ((x - shift) / scale), exactly `lpips/lpips.py` with normalize=True —
    the path the reference cache builder takes
    (`build_retrieval_indexes_LPIPS.py:109,128`)."""
    from ralf_tpu.models.towers import LPIPS_SCALE, LPIPS_SHIFT

    x = 2.0 * images01 - 1.0
    return (x - jnp.asarray(LPIPS_SHIFT, x.dtype)) / jnp.asarray(
        LPIPS_SCALE, x.dtype)


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    """lpips.normalize_tensor: unit L2 norm across channels per pixel."""
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def lpips_from_taps(
    taps_a: Sequence[jax.Array],
    taps_b: Sequence[jax.Array],
    channel_weights: Optional[Sequence[jax.Array]] = None,
) -> jax.Array:
    """Perceptual distance from two tap lists ([B,H,W,C] each): per layer,
    squared diff of channel-unit-normalized maps, channel-weighted sum,
    spatial mean; summed over layers (`CacheLPIPS.calculate_diffs`)."""
    total = 0.0
    for li, (fa, fb) in enumerate(zip(taps_a, taps_b)):
        d = (_unit_normalize(fa.astype(jnp.float32))
             - _unit_normalize(fb.astype(jnp.float32))) ** 2
        if channel_weights is not None:
            d = d * channel_weights[li]
        total = total + d.sum(axis=-1).mean(axis=(-2, -1))
    return total


def make_lpips_fns(cache_dir: str = "cache", size: int = 224,
                   net: str = "alex"):
    """(embed_taps, pair_distance): jitted tap extractor over images in
    [0,1] and the distance between two tap lists.

    net="alex" (default) is the reference's exact distance function when
    `{cache_dir}/lpips_alex.pth` (the lpips package's LPIPS(net="alex")
    state_dict: tower + learned lins) is present; absent weights it runs
    the same architecture randomly initialized with uniform channel
    weights (loud warning).  net="vgg" keeps the r3 VGG-baseline arm on
    the shared R_shm checkpoint."""
    import logging
    import os

    from ralf_tpu.utils.torch_port import load_tower_if_available, merge_params

    log = logging.getLogger(__name__)
    channel_weights = None

    if net == "alex":
        from ralf_tpu.models.towers import AlexNetFeatures

        module = AlexNetFeatures()
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = dict(module.init(jax.random.PRNGKey(0), dummy))
        path = os.path.join(cache_dir, "lpips_alex.pth")
        ported = load_tower_if_available(path, "lpips_alex")
        if ported is not None:
            tower, lins = ported
            variables["params"] = merge_params(
                jax.device_get(variables["params"]), tower)
            channel_weights = [jnp.asarray(w) for w in lins]
            log.info("lpips: loaded AlexNet tower + learned lins from %s",
                     path)
        else:
            log.warning(
                "lpips: no %s — AlexNet taps RANDOMLY INITIALIZED with "
                "uniform channel weights (consistent ranking, not the "
                "trained perceptual space)", path)

        @jax.jit
        def embed_taps(images: jax.Array):
            x = images[..., :3].astype(jnp.float32)
            B = x.shape[0]
            x = jax.image.resize(x, (B, size, size, 3), method="cubic",
                                 antialias=True)
            x = jnp.clip(x, 0.0, 1.0)
            return module.apply(variables, lpips_scale(x))

    elif net == "vgg":
        from ralf_tpu.models.towers import (
            TOWER_SPECS,
            VGG16Features,
            resize_normalize,
        )

        _, _, mean, std, ckpt, port_kind = TOWER_SPECS["vgg"]
        module = VGG16Features()
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = dict(module.init(jax.random.PRNGKey(0), dummy))
        ported = load_tower_if_available(os.path.join(cache_dir, ckpt),
                                         port_kind)
        if ported is not None:
            variables["params"] = merge_params(
                jax.device_get(variables["params"]), ported)
        else:
            log.warning(
                "lpips: no VGG checkpoint under %s — RANDOMLY INITIALIZED "
                "taps (consistent ranking, not the pretrained perceptual "
                "space)", cache_dir)

        @jax.jit
        def embed_taps(images: jax.Array):
            x = resize_normalize(images[..., :3].astype(jnp.float32),
                                 size, mean, std)
            return module.apply(variables, x, return_taps=True)

    else:
        raise ValueError(f"unknown lpips net {net!r}; choose alex or vgg")

    cw = channel_weights

    @jax.jit
    def dist_fn(taps_a, taps_b):
        return lpips_from_taps(taps_a, taps_b, channel_weights=cw)

    return embed_taps, dist_fn


def lpips_rerank(
    query_images_fn,  # (indices [n]) -> [n, H, W, C>=3] images in [0,1]
    candidates: np.ndarray,  # [B, C] gallery indices
    gallery_images_fn,  # (indices [n]) -> [n, H, W, C] images
    cache_dir: str = "cache",
    size: int = 224,
    chunk: int = 8,
    net: str = "alex",
) -> np.ndarray:
    """Reorder each row's candidate pool by ascending LPIPS distance to the
    query.  Query and candidate canvases are fetched `chunk` query rows at
    a time, so the builder never materializes a split's images."""
    embed_taps, dist_fn = make_lpips_fns(cache_dir, size, net=net)
    B, C = candidates.shape
    out = np.zeros_like(candidates)
    for s in range(0, B, chunk):
        idx = np.arange(s, min(s + chunk, B))
        b = idx.shape[0]
        q = np.asarray(query_images_fn(idx), np.float32)
        q_taps = embed_taps(jnp.asarray(q))
        cand = candidates[idx]  # [b, C]
        cand_imgs = gallery_images_fn(cand.reshape(-1))  # [b*C, H, W, Ch]
        c_taps = embed_taps(jnp.asarray(np.asarray(cand_imgs, np.float32)))
        # broadcast query taps over the candidate axis
        qc_taps = [jnp.repeat(t, C, axis=0) for t in q_taps]
        d = np.asarray(dist_fn(qc_taps, c_taps)).reshape(b, C)
        order = np.argsort(d, axis=1, kind="stable")
        out[idx] = np.take_along_axis(cand, order, axis=1)
    return out
