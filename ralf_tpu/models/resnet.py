"""ResNet image backbones (NHWC, flax) with the reference's mini-FPN head.

Parity target: `image2layout/train/models/common/image.py:27-129`
(ResnetBackbone/ResnetFeatureExtractor): a torchvision/timm ResNet-50/18
with a 4-channel stem (RGB + saliency), feature taps at layer3 (stride 16)
and layer4 (stride 32), then

    f4p = 1x1(layer3); f5p = 1x1(layer4); f5up = upsample(f5p, size=f4p)
    fused = concat[f5up, 3x3(f5up + f4p)]   # 2*256 channels
    out   = 1x1(fused) -> d_model           # [B, h/16, w/16, d_model]

Redesigned TPU-first: NHWC layout (XLA-preferred), bottleneck-v1.5
blocks, BatchNorm with running stats, bf16-able compute dtype.  Weight
import from a torchvision/timm checkpoint (when a file is provided —
zero-egress environments have no downloads) is handled by
`ralf_tpu/utils/torch_port.py`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet statistics used by the torchvision-path extractor
# (`common/image.py:18-20`); the timm-path extractor skips normalization.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Bottleneck(nn.Module):
    features: int  # internal width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="down_conv",
            )(residual)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="down_conv",
            )(residual)
            residual = norm("down_bn")(residual)
        return nn.relu(y + residual)


_STAGES = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), (64, 128, 256, 512), (256, 512)),
    "resnet50": (Bottleneck, (3, 4, 6, 3), (64, 128, 256, 512), (1024, 2048)),
}


class ResNetTrunk(nn.Module):
    """4-channel-stem ResNet returning (layer3, layer4) feature maps."""

    backbone: str = "resnet50"
    in_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        block, depths, widths, _ = _STAGES[self.backbone]
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1"
            )(y)
        )
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        taps = {}
        for stage, (n_blocks, width) in enumerate(zip(depths, widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = block(width, stride, self.dtype, name=f"layer{stage + 1}_{b}")(
                    y, train
                )
            if stage in (2, 3):
                taps[f"layer{stage + 1}"] = y
        return taps["layer3"], taps["layer4"]


class ResNetFPNEncoder(nn.Module):
    """Trunk + mini-FPN projecting to a [B, H/16, W/16, d_model] map.

    Two reference variants share this module:
      * fpn_style='ralf' — ResnetBackbone's transformer head
        (`common/image.py:79-120`): 256-ch laterals, nearest upsample,
        concat(512) -> 1x1 proj to d_model; no input normalization.
      * fpn_style='cgl' — ImageFeatureExtractor (`common/image.py:182-231`,
        used by CGL-GAN / MaskGIT / LayoutDM / ICVT): d/2-ch laterals,
        bilinear upsample, concat -> d channels directly; ImageNet
        normalization on the RGB channels.
    """

    backbone: str = "resnet50"
    d_model: int = 256
    normalize_rgb: bool = False
    fpn_style: str = "ralf"  # "ralf" | "cgl"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        """img: [B, H, W, 4] in [0, 1] (RGB + saliency) — or uint8 0..255
        from the fast host pipeline (BatchLoader image_dtype='uint8'),
        normalized here ON DEVICE: the cast fuses into the first conv's
        input read, frees the host of the f32 convert (~0.45s per 128
        canvases on one core) and cuts host->device transfer 4x."""
        if jnp.issubdtype(img.dtype, jnp.integer):
            img = img.astype(self.dtype) * jnp.asarray(1.0 / 255.0, self.dtype)
        if self.normalize_rgb or self.fpn_style == "cgl":
            mean = jnp.asarray(IMAGENET_MEAN + (0.0,), img.dtype)
            std = jnp.asarray(IMAGENET_STD + (1.0,), img.dtype)
            img = (img - mean) / std
        f3, f4 = ResNetTrunk(self.backbone, dtype=self.dtype, name="trunk")(img, train)
        if self.fpn_style == "cgl":
            half = self.d_model // 2
            f_up = jax.image.resize(
                nn.Conv(half, (1, 1), dtype=self.dtype, name="conv11")(f4),
                (f4.shape[0],) + f3.shape[1:3] + (half,),
                method="bilinear",
            )
            lateral = nn.Conv(half, (1, 1), dtype=self.dtype, name="conv22")(f3)
            fused = nn.Conv(half, (1, 1), dtype=self.dtype, name="conv33")(
                f_up + lateral
            )
            return jnp.concatenate([f_up, fused], axis=-1)  # [.., d_model]
        f4p = nn.Conv(256, (1, 1), dtype=self.dtype, name="fpn_conv11_4")(f3)
        f5p = nn.Conv(256, (1, 1), dtype=self.dtype, name="fpn_conv11_5")(f4)
        f5up = jax.image.resize(
            f5p, (f5p.shape[0],) + f4p.shape[1:3] + (f5p.shape[-1],), method="nearest"
        )
        fused = jnp.concatenate(
            [f5up, nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="fpn_conv33")(f5up + f4p)],
            axis=-1,
        )
        return nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name="proj")(fused)


class ImageEncoder(nn.Module):
    """extractor -> 2-d sine PE -> 6-layer pre-LN TransformerEncoder memory.

    Parity with `models/autoreg.py:54-70` + `common/image.py:132-179`:
    the content path every generator shares.  Output [B, H'W', d_model].
    """

    backbone: str = "resnet50"
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    normalize_rgb: bool = False
    fpn_style: str = "ralf"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        # setup-style (not @nn.compact) so the pre-encoder RALF fusion
        # ablation can split the pipeline: fuse retrieved tokens into the
        # sequence BEFORE the shared transformer
        # (`retrieval_augmented_autoreg.py:1140-1196`).  Attribute names
        # keep the historical param paths (extractor / pos_2d / transformer).
        from ralf_tpu.models.nn import TransformerEncoder
        from ralf_tpu.models.positional import PositionEmbeddingSine2D

        self.extractor = ResNetFPNEncoder(
            self.backbone, self.d_model, self.normalize_rgb, self.fpn_style,
            self.dtype,
        )
        self.pos_2d = PositionEmbeddingSine2D(self.d_model)
        self.transformer = TransformerEncoder(
            self.d_model,
            self.nhead,
            self.num_layers,
            self.dim_feedforward,
            self.dropout,
            dtype=self.dtype,
        )

    def features(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Backbone + 2-d sine PE, BEFORE the transformer.  [B, H'W', D]."""
        return self.pos_2d(self.extractor(img, train))

    def encode_seq(self, h: jax.Array, train: bool = False) -> jax.Array:
        """The shared transformer over an arbitrary token sequence."""
        return self.transformer(h, deterministic=not train)

    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        return self.encode_seq(self.features(img, train), train)
