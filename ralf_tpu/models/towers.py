"""Pretrained image towers (flax, NHWC): VGG16, InceptionV3, ViT-B/16 and
the DreamSim ensemble.

These are the reference's metric / retrieval feature extractors:

  * VGG16 — timm `vgg16.tv_in1k`, `num_classes=0` -> 4096-d pre-logits
    features; used by R_shm (`train/helpers/metric.py:607-643,703-743`)
    and the `vgg` retrieval backbone
    (`train/models/retrieval/image.py:30-33`).
  * InceptionV3 — timm `inception_v3`, `num_classes=0` -> 2048-d pooled
    features of layout-masked canvases; the image-FID feature extractor
    (`train/helpers/metric.py:644-700`, `eval.py:126-181`).
  * ViT-B/16 — the backbone shared by the `clip` retrieval backbone
    (`hf_hub:timm/vit_base_patch16_clip_224.openai`,
    `retrieval/image.py:30-32`) and DreamSim.
  * DreamSim — the paper's default retrieval feature
    (`retrieval/image.py:72-93`): an ensemble of three ViT-B/16 towers
    (DINO / CLIP / OpenCLIP, LoRA-merged in the released checkpoint);
    per-tower CLS embeddings are L2-normalized and concatenated.

TPU-first notes: NHWC convs, bf16-able compute dtype, everything jittable
(the torch originals run per-image on host with PIL transforms; here the
resize+normalize is a traced `jax.image.resize`, so the whole feature
pass fuses into one XLA program and batches onto the MXU).  Weight import
from released torch checkpoints is `utils/torch_port.py`
(`port_vgg16` / `port_inception_v3` / `port_vit_b16` / `port_dreamsim`);
random-weight parity vs torch twins is tests/test_towers.py.

This environment has no downloads, so consumers (cli.evaluate
--image-metrics, retrieval backbones) fall back to randomly-initialized
towers with a loud warning — runnable end to end, with converters standing
ready for real weights.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)  # timm IMAGENET_INCEPTION_MEAN
INCEPTION_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)  # OPENAI_CLIP_MEAN
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_normalize(
    img: jax.Array,
    size: int,
    mean: Sequence[float],
    std: Sequence[float],
) -> jax.Array:
    """[B,H,W,3] in [0,1] -> resized+normalized [B,size,size,3].

    The torch originals use PIL/antialiased bicubic
    (`metric.py:625-631,662-668`); `jax.image.resize(method='cubic',
    antialias=True)` is the Keys-kernel equivalent (sub-1e-2 pixel
    differences — the parity tests therefore feed same-sized inputs and
    pin the network math bit-tight, not the resampler).
    """
    B = img.shape[0]
    img = jax.image.resize(img, (B, size, size, 3), method="cubic",
                           antialias=True)
    img = jnp.clip(img, 0.0, 1.0)
    return (img - jnp.asarray(mean, img.dtype)) / jnp.asarray(std, img.dtype)


# --------------------------------------------------------------------------
# VGG16 (timm vgg16 layout: features + ConvMlp pre_logits)
# --------------------------------------------------------------------------

_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Features(nn.Module):
    """timm `vgg16` with `num_classes=0`: conv stack -> 7x7 ConvMlp
    pre-logits -> global pool -> [B, 4096].

    Layer names mirror the timm state_dict (`features_{i}` / `pre_logits`)
    so `port_vgg16` is a pure rename.
    """

    dtype: Any = jnp.float32

    # last conv of each block: relu1_2/2_2/3_3/4_3/5_3 — the standard
    # LPIPS-VGG tap set (lpips lib `pretrained_networks.vgg16`)
    LPIPS_TAPS = (1, 4, 8, 12, 16)

    @nn.compact
    def __call__(self, img: jax.Array, return_taps: bool = False):
        """img: [B, H, W, 3], already resized+normalized (224 for parity
        with the torch transform — any H,W >= 7 works; pooling is global).

        return_taps: return the 5 LPIPS tap activations instead of the
        pooled feature (pre_logits params exist but go unused — same
        checkpoint serves both paths)."""
        h = img.astype(self.dtype)
        taps = []
        for i, spec in enumerate(_VGG16_PLAN):
            if spec == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.relu(
                    nn.Conv(spec, (3, 3), padding=1, dtype=self.dtype,
                            name=f"features_{i}")(h)
                )
                if i in self.LPIPS_TAPS:
                    taps.append(h)
        if return_taps:
            return taps
        # ConvMlp pre_logits: 7x7 VALID conv -> relu -> 1x1 conv -> relu
        h = nn.relu(
            nn.Conv(4096, (7, 7), padding="VALID", dtype=self.dtype,
                    name="pre_logits_fc1")(h)
        )
        h = nn.relu(
            nn.Conv(4096, (1, 1), dtype=self.dtype, name="pre_logits_fc2")(h)
        )
        return h.mean(axis=(1, 2))  # global average pool -> [B, 4096]


# --------------------------------------------------------------------------
# AlexNet LPIPS tap tower (lpips package `pretrained_networks.alexnet`)
# --------------------------------------------------------------------------

# lpips.ScalingLayer constants (`lpips/lpips.py`): applied to [-1, 1] input
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)

# torchvision alexnet `features` plan: (out_ch, kernel, stride, padding);
# "M" = MaxPool(3, 2).  Indices mirror the torchvision state_dict
# (`features.{i}.weight`), so the converter is a pure rename.  The final
# MaxPool (features.12) is NOT here: the lpips slices end at relu5
# (`lpips/pretrained_networks.py alexnet`: slice5 = modules 10-11).
_ALEXNET_PLAN = ((64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
                 (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1))


class AlexNetFeatures(nn.Module):
    """torchvision `alexnet.features` as the 5-tap LPIPS tower — the net
    the reference's exact LPIPS tables use
    (`preprocess/build_retrieval_indexes_LPIPS.py:99`: `CacheLPIPS(
    net="alex")`; slices per `lpips/pretrained_networks.py alexnet`).

    Input: [B, H, W, 3] ALREADY passed through 2x-1 and the lpips scaling
    layer (see `retrieval.lpips.lpips_scale`).  Returns the 5 post-ReLU
    taps (channels 64/192/384/256/256).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        h = x.astype(self.dtype)
        taps = []
        i = 0
        for spec in _ALEXNET_PLAN:
            if spec == "M":
                h = nn.max_pool(h, (3, 3), strides=(2, 2))
                i += 1
            else:
                ch, k, s, p = spec
                h = nn.relu(
                    nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                            dtype=self.dtype, name=f"features_{i}")(h)
                )
                taps.append(h)
                i += 2  # conv + relu occupy two torchvision indices
        return taps


# --------------------------------------------------------------------------
# InceptionV3 (timm inception_v3 layout)
# --------------------------------------------------------------------------


class BasicConv(nn.Module):
    """Conv + BatchNorm(eps=1e-3, no affine bias per torch default affine
    BN with bias — torch BasicConv2d uses BN with affine) + ReLU."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool, count_include_pad=True (torch default)."""
    return nn.pool(x, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1))) / 9.0


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv(64, (5, 5), padding=2, dtype=d, name="branch5x5_2")(b5, train)
        b3 = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_3")(b3, train)
        bp = BasicConv(self.pool_features, (1, 1), dtype=d,
                       name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3")(x, train)
        bd = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d, c7 = self.dtype, self.c7
        p17, p71 = ((0, 0), (3, 3)), ((3, 3), (0, 0))
        b1 = BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(b7, train)
        b7 = BasicConv(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(b7, train)
        bd = BasicConv(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(bd, train)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        p17, p71 = ((0, 0), (3, 3)), ((3, 3), (0, 0))
        b3 = BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3_2")(b3, train)
        b7 = BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv(192, (1, 7), padding=p17, dtype=d, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv(192, (7, 1), padding=p71, dtype=d, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=d,
                       name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        p13, p31 = ((0, 0), (1, 1)), ((1, 1), (0, 0))
        b1 = BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3_2a")(b3, train),
            BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3_2b")(b3, train),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv(384, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3dbl_3a")(bd, train),
            BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3dbl_3b")(bd, train),
        ], axis=-1)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """timm `inception_v3` with `num_classes=0` -> [B, 2048] pooled
    features.  Module names mirror the torch state_dict so
    `port_inception_v3` is a rename + transpose pass."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        """img: [B, H, W, 3] resized+normalized (299 canonical)."""
        d = self.dtype
        h = img.astype(d)
        h = BasicConv(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(h, train)
        h = BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(h, train)
        h = BasicConv(64, (3, 3), padding=1, dtype=d, name="Conv2d_2b_3x3")(h, train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(h, train)
        h = BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(h, train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, dtype=d, name="Mixed_5b")(h, train)
        h = InceptionA(64, dtype=d, name="Mixed_5c")(h, train)
        h = InceptionA(64, dtype=d, name="Mixed_5d")(h, train)
        h = InceptionB(dtype=d, name="Mixed_6a")(h, train)
        h = InceptionC(128, dtype=d, name="Mixed_6b")(h, train)
        h = InceptionC(160, dtype=d, name="Mixed_6c")(h, train)
        h = InceptionC(160, dtype=d, name="Mixed_6d")(h, train)
        h = InceptionC(192, dtype=d, name="Mixed_6e")(h, train)
        h = InceptionD(dtype=d, name="Mixed_7a")(h, train)
        h = InceptionE(dtype=d, name="Mixed_7b")(h, train)
        h = InceptionE(dtype=d, name="Mixed_7c")(h, train)
        return h.mean(axis=(1, 2))  # [B, 2048]


# --------------------------------------------------------------------------
# ViT-B/16 (timm vision_transformer layout) + DreamSim ensemble
# --------------------------------------------------------------------------


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        H = self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # timm fused qkv projection ([3D, D] weight) — ported as one Dense
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, D // H), 3, axis=2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)) * (D // H) ** -0.5, axis=-1
        )
        h = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="proj")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(D * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.Dense(D, dtype=self.dtype, name="mlp_fc2")(nn.gelu(h, approximate=False))
        return x + h


class ViTB16(nn.Module):
    """timm-layout ViT-B/16 feature extractor -> [B, dim] CLS embedding.

    Shared by the `clip` retrieval backbone
    (`vit_base_patch16_clip_224.openai`, pre-norm variant) and the three
    DreamSim towers.  `pre_norm` adds the CLIP-style LayerNorm before the
    blocks; names mirror timm so `port_vit_b16` is a rename pass.
    """

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch: int = 16
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        """img: [B, S, S, 3] resized+normalized, S divisible by `patch`."""
        B = img.shape[0]
        h = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch),
                    use_bias=not self.pre_norm,  # CLIP patch embed is bias-free
                    dtype=self.dtype, name="patch_embed")(img.astype(self.dtype))
        h = h.reshape(B, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)).astype(h.dtype), h], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h.shape[1], self.dim))
        h = h + pos.astype(h.dtype)
        if self.pre_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_pre")(h)
        for i in range(self.depth):
            h = ViTBlock(self.dim, self.num_heads, dtype=self.dtype,
                         name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        return h[:, 0]  # CLS token -> [B, dim]


class DreamSimEnsemble(nn.Module):
    """DreamSim's default ensemble feature (`retrieval/image.py:72-93`):
    three ViT-B/16 towers (DINO / CLIP / OpenCLIP, LoRA already merged in
    the released checkpoint), per-tower CLS embeddings L2-normalized and
    concatenated -> [B, 3*768].

    The released checkpoint's per-tower weights load via `port_dreamsim`;
    the torch original computes cosine distances between these embeddings
    (`model.embed`, `retrieval/image.py:93`), which is exactly the
    retriever's normalized inner-product scan here.
    """

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        feats = []
        for name, pre_norm in (("dino", False), ("clip", True),
                               ("open_clip", True)):
            f = ViTB16(dim=self.dim, depth=self.depth,
                       num_heads=self.num_heads, pre_norm=pre_norm,
                       dtype=self.dtype, name=name)(img)
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6
            )
            feats.append(f)
        return jnp.concatenate(feats, axis=-1)  # [B, 2304]


# --------------------------------------------------------------------------
# feature-function factory (retrieval backbones + image metrics)
# --------------------------------------------------------------------------

# kind -> (module factory, input size, mean, std, checkpoint file, port kind)
# DreamSim's torch transform is resize-only — no normalization
# (`retrieval/image.py:85-91`); the others follow their timm data configs.
TOWER_SPECS = {
    "dreamsim": (lambda dt: DreamSimEnsemble(dtype=dt), 224,
                 (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                 "dreamsim_ensemble.pt", "dreamsim"),
    "clip": (lambda dt: ViTB16(pre_norm=True, dtype=dt), 224,
             CLIP_MEAN, CLIP_STD, "clip_vit_b16.pt", "clip"),
    "vgg": (lambda dt: VGG16Features(dtype=dt), 224,
            IMAGENET_MEAN, IMAGENET_STD, "vgg16.pt", "vgg16"),
    "inception": (lambda dt: InceptionV3Features(dtype=dt), 299,
                  INCEPTION_MEAN, INCEPTION_STD,
                  "inception_v3.pt", "inception_v3"),
}


def build_feature_fn(kind: str, cache_dir: str = "cache",
                     dtype: Any = jnp.float32):
    """Jitted `fn(images [B,H,W,C>=3] in [0,1]) -> [B,D]` feature extractor.

    Weights load from `{cache_dir}/{ckpt}` (a torch state_dict, converted
    through `utils/torch_port`) when present; otherwise the tower runs
    RANDOMLY INITIALIZED with a loud warning — deterministic and runnable
    end to end (random projections still rank by image similarity), but
    not the pretrained feature space.  Drop the released checkpoints into
    the cache dir for parity-grade features.
    """
    import logging
    import os

    make, size, mean, std, ckpt, port_kind = TOWER_SPECS[kind]
    module = make(dtype)

    from ralf_tpu.utils.torch_port import load_tower_if_available

    path = os.path.join(cache_dir, ckpt)
    ported = load_tower_if_available(path, port_kind)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = dict(module.init(jax.random.PRNGKey(0), dummy))
    if ported is not None:
        from ralf_tpu.utils.torch_port import merge_params

        if port_kind == "inception_v3":
            params, stats = ported
            variables["params"] = merge_params(
                jax.device_get(variables["params"]), params)
            variables["batch_stats"] = merge_params(
                jax.device_get(variables["batch_stats"]), stats)
        else:
            variables["params"] = merge_params(
                jax.device_get(variables["params"]), ported)
        logging.getLogger(__name__).info("%s tower: loaded %s", kind, path)
    else:
        logging.getLogger(__name__).warning(
            "%s tower: no checkpoint at %s — running RANDOMLY INITIALIZED "
            "(features are deterministic but not the pretrained space)",
            kind, path,
        )

    @jax.jit
    def feature_fn(images: jax.Array) -> jax.Array:
        x = resize_normalize(images[..., :3].astype(jnp.float32),
                             size, mean, std)
        return module.apply(variables, x).astype(jnp.float32)

    return feature_fn
