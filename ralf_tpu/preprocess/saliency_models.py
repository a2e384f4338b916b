"""Saliency detection networks for the offline dataset builder.

Parity targets: `image2layout/hfds_builder/models/saliency/isnet.py`
(ISNet/DIS, U^2-Net RSU blocks, run at 1024^2) and `basnet.py` (BASNet,
ResNet34-style encoder + dilated bridge + decoder + residual refinement,
run at 256^2).  The dataset builder combines the two maps by pixel-max
(`hfds_builder/dump_dataset.py:150-153`).

Flax/NHWC re-implementations with the same stage/channel plans, run
deterministically for inference (no BN state updates).  The released .pth
weights are download-only (zero-egress environments can't fetch them) and
no converter is wired yet — BASNet in particular is a simplified twin
(no per-stage side outputs), so loading real weights needs a dedicated
port pass, not a file-copy.  The synthetic data path does not need them.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_to(x: jax.Array, ref: jax.Array) -> jax.Array:
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear"
    )


class REBNConv(nn.Module):
    out_ch: int
    dirate: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dirate, self.dirate),
                    padding=self.dirate, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class RSUBlock(nn.Module):
    """Residual U-block (explicit encoder/decoder walk)."""

    height: int
    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x, train)
        encs = []
        h = REBNConv(self.mid_ch, dtype=self.dtype, name="enc_0")(hxin, train)
        encs.append(h)
        for i in range(1, self.height - 1):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = REBNConv(self.mid_ch, dtype=self.dtype, name=f"enc_{i}")(h, train)
            encs.append(h)
        h = REBNConv(self.mid_ch, dirate=2, dtype=self.dtype, name="bottom")(h, train)
        for i in range(self.height - 2, 0, -1):
            h = REBNConv(
                self.mid_ch if i > 0 else self.out_ch, dtype=self.dtype,
                name=f"dec_{i}",
            )(jnp.concatenate([h, encs[i]], -1), train)
            h = _upsample_to(h, encs[i - 1])
        h = REBNConv(self.out_ch, dtype=self.dtype, name="dec_0")(
            jnp.concatenate([h, encs[0]], -1), train
        )
        return hxin + h


class RSU4F(nn.Module):
    """Dilation-only residual block (`isnet.py:352-386`)."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x, train)
        h1 = REBNConv(self.mid_ch, 1, dtype=self.dtype, name="c1")(hxin, train)
        h2 = REBNConv(self.mid_ch, 2, dtype=self.dtype, name="c2")(h1, train)
        h3 = REBNConv(self.mid_ch, 4, dtype=self.dtype, name="c3")(h2, train)
        h4 = REBNConv(self.mid_ch, 8, dtype=self.dtype, name="c4")(h3, train)
        d3 = REBNConv(self.mid_ch, 4, dtype=self.dtype, name="d3")(
            jnp.concatenate([h4, h3], -1), train)
        d2 = REBNConv(self.mid_ch, 2, dtype=self.dtype, name="d2")(
            jnp.concatenate([d3, h2], -1), train)
        d1 = REBNConv(self.out_ch, 1, dtype=self.dtype, name="d1")(
            jnp.concatenate([d2, h1], -1), train)
        return hxin + d1


class ISNetDIS(nn.Module):
    """ISNet (DIS) saliency net (`isnet.py:514-638`): stride-2 stem, six
    RSU stages with pooling, mirrored decoder, sigmoid side outputs."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        stem = REBNConv(64, stride=2, dtype=self.dtype, name="conv_in")(x, train)
        s1 = RSUBlock(7, 32, 64, self.dtype, name="stage1")(stem, train)
        h = nn.max_pool(s1, (2, 2), strides=(2, 2))
        s2 = RSUBlock(6, 32, 128, self.dtype, name="stage2")(h, train)
        h = nn.max_pool(s2, (2, 2), strides=(2, 2))
        s3 = RSUBlock(5, 64, 256, self.dtype, name="stage3")(h, train)
        h = nn.max_pool(s3, (2, 2), strides=(2, 2))
        s4 = RSUBlock(4, 128, 512, self.dtype, name="stage4")(h, train)
        h = nn.max_pool(s4, (2, 2), strides=(2, 2))
        s5 = RSU4F(256, 512, self.dtype, name="stage5")(h, train)
        h = nn.max_pool(s5, (2, 2), strides=(2, 2))
        s6 = RSU4F(256, 512, self.dtype, name="stage6")(h, train)

        d5 = RSU4F(256, 512, self.dtype, name="stage5d")(
            jnp.concatenate([_upsample_to(s6, s5), s5], -1), train)
        d4 = RSUBlock(4, 128, 256, self.dtype, name="stage4d")(
            jnp.concatenate([_upsample_to(d5, s4), s4], -1), train)
        d3 = RSUBlock(5, 64, 128, self.dtype, name="stage3d")(
            jnp.concatenate([_upsample_to(d4, s3), s3], -1), train)
        d2 = RSUBlock(6, 32, 64, self.dtype, name="stage2d")(
            jnp.concatenate([_upsample_to(d3, s2), s2], -1), train)
        d1 = RSUBlock(7, 16, 64, self.dtype, name="stage1d")(
            jnp.concatenate([_upsample_to(d2, s1), s1], -1), train)

        side = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side1")(d1)
        side = _upsample_to(side, x)
        return nn.sigmoid(side)[..., 0]  # [B, H, W]


class BasicBlock34(nn.Module):
    ch: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        if res.shape != h.shape:
            res = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, dtype=self.dtype)(res)
            res = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(res)
        return nn.relu(h + res)


class RefUnet(nn.Module):
    """Residual refinement module (`basnet.py:186-283`)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(h, ch, name):
            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"{name}_c")(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"{name}_b")(h)
            return nn.relu(h)

        h0 = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="conv0")(x)
        encs = []
        h = h0
        for i in range(1, 5):
            h = cbr(h, 64, f"e{i}")
            encs.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = cbr(h, 64, "bridge")
        for i in range(4, 0, -1):
            h = _upsample_to(h, encs[i - 1])
            h = cbr(jnp.concatenate([h, encs[i - 1]], -1), 64, f"d{i}")
        residual = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="conv_d0")(h)
        return x + residual


class BASNet(nn.Module):
    """BASNet saliency net (`basnet.py:286-470`-ish): conv stem + ResNet34
    stages + 2 extra 512 stages, dilated bridge, 6-level decoder with a
    sigmoid output refined by RefUnet."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        norm = lambda h: nn.BatchNorm(use_running_average=not train,
                                      dtype=self.dtype)(h)
        h = nn.relu(norm(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)(x)))
        encs = []
        stage_plan = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
        for n, ch, stride in stage_plan:
            for b in range(n):
                h = BasicBlock34(ch, stride if b == 0 else 1, self.dtype)(h, train)
            encs.append(h)
        # two extra 512 stages with pooling (`basnet.py` conv5/conv6)
        for _ in range(2):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for _ in range(3):
                h = BasicBlock34(512, 1, self.dtype)(h, train)
            encs.append(h)
        # dilated bridge
        b = h
        for _ in range(3):
            b = nn.relu(norm(nn.Conv(512, (3, 3), kernel_dilation=(2, 2),
                                     padding=2, dtype=self.dtype)(b)))
        # decoder
        d = b
        for enc in reversed(encs):
            d = _upsample_to(d, enc)
            d = nn.relu(norm(nn.Conv(enc.shape[-1], (3, 3), padding=1,
                                     dtype=self.dtype)(
                jnp.concatenate([d, enc], -1))))
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(d)
        out = _upsample_to(out, x)
        refined = RefUnet(self.dtype)(out, train)
        return nn.sigmoid(refined)[..., 0]
