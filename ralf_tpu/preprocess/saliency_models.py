"""Saliency detection networks for the offline dataset builder.

Parity targets: `image2layout/hfds_builder/models/saliency/isnet.py`
(ISNet/DIS, U^2-Net RSU blocks, run at 1024^2 after a (x-0.5) normalize,
`saliency_detection.py:105-128`) and `basnet.py` (BASNet: conv stem +
resnet34 encoder + two extra 512 stages, dilated bridge, 6-stage decoder,
7 side outputs and a residual refinement UNet, run at 256^2 after
INTER_AREA resize + ImageNet normalize, `saliency_detection.py:131-157`).
The dataset dump combines the two maps by pixel max
(`hfds_builder/dump_dataset.py:150-153`).

These are WEIGHT-PORT-READY twins: every torch module in the reference
forward pass has a same-named flax module here, and
`convert_isnet_state_dict` / `convert_basnet_state_dict` map the released
.pth state dicts (isnet-general-use.pth / gdi-basnet.pth) to flax
variables — random-weight parity vs the reference classes is pinned by
tests/test_saliency_parity.py.

Faithfully replicated quirks:

  * ISNet's stem `conv_in` is a PLAIN stride-2 conv — no BN/relu
    (`isnet.py:518`), and the ISNet output used downstream is side 1.
  * BASNet's `hd6` is normalized by **bn5d_2**, not bn6d_2
    (`basnet.py:483`, an upstream layer-sharing typo baked into the
    released weights); bn6d_2 exists in the checkpoint but is unused, and
    the converter drops it.
  * BASNet's `conv6d_m` / `conv6d_2` use dilation 2 (`basnet.py:341-346`);
    all other decoder mids are dense.
  * BASNet's downstream output is the refined `dout` (tester takes
    `pred[0]`, `saliency_detection.py:152`).

Known deviation: torch pools use ceil_mode=True; flax max_pool floors.
Identical on the production input sizes (1024^2 / 256^2 — every stage is
even), divergent only on odd intermediate sizes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _upsample_to(x: jax.Array, ref: jax.Array) -> jax.Array:
    # torch F.upsample(mode="bilinear") / nn.Upsample(align_corners=False):
    # half-pixel centers == jax.image.resize "bilinear"
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear"
    )


def _pool2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class REBNConv(nn.Module):
    """conv3x3(dilation=dirate) + BN + relu (`isnet.py:70-85` REBNCONV)."""

    out_ch: int
    dirate: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dirate, self.dirate),
                    padding=self.dirate, dtype=self.dtype, name="conv_s1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_s1")(x)
        return nn.relu(x)


class RSUBlock(nn.Module):
    """Residual U-block RSU{height} (`isnet.py:97-349` RSU7/6/5/4).

    Submodule names match the torch attributes: rebnconvin,
    rebnconv1..{height} (encoder + dirate-2 bottom), rebnconv{k}d decoder.
    """

    height: int
    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x, train)
        encs = []
        h = REBNConv(self.mid_ch, dtype=self.dtype, name="rebnconv1")(hxin, train)
        encs.append(h)
        for i in range(2, self.height):
            h = _pool2(h)
            h = REBNConv(self.mid_ch, dtype=self.dtype, name=f"rebnconv{i}")(h, train)
            encs.append(h)
        h = REBNConv(self.mid_ch, dirate=2, dtype=self.dtype,
                     name=f"rebnconv{self.height}")(h, train)
        for i in range(self.height - 1, 1, -1):
            h = REBNConv(self.mid_ch, dtype=self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([h, encs[i - 1]], -1), train
            )
            h = _upsample_to(h, encs[i - 2])
        h = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([h, encs[0]], -1), train
        )
        return hxin + h


class RSU4F(nn.Module):
    """Dilation-only residual block (`isnet.py:353-385`)."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x, train)
        h1 = REBNConv(self.mid_ch, 1, dtype=self.dtype, name="rebnconv1")(hxin, train)
        h2 = REBNConv(self.mid_ch, 2, dtype=self.dtype, name="rebnconv2")(h1, train)
        h3 = REBNConv(self.mid_ch, 4, dtype=self.dtype, name="rebnconv3")(h2, train)
        h4 = REBNConv(self.mid_ch, 8, dtype=self.dtype, name="rebnconv4")(h3, train)
        d3 = REBNConv(self.mid_ch, 4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1), train)
        d2 = REBNConv(self.mid_ch, 2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([d3, h2], -1), train)
        d1 = REBNConv(self.out_ch, 1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([d2, h1], -1), train)
        return hxin + d1


class ISNetDIS(nn.Module):
    """ISNet (DIS) saliency net, exact twin of `isnet.py:514-638`.

    forward: plain stride-2 conv stem -> six RSU stages with 2x pools ->
    mirrored RSU decoder -> six 3x3 side convs upsampled to the input.
    The reference tester consumes side 1 (`saliency_detection.py:124`);
    `__call__` returns it as a [B, H, W] sigmoid map, or all six sides +
    decoder features with full=True (the training-loss contract,
    `isnet.py:631-638`).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, full: bool = False):
        hxin = nn.Conv(64, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv_in")(x)
        s1 = RSUBlock(7, 32, 64, self.dtype, name="stage1")(hxin, train)
        s2 = RSUBlock(6, 32, 128, self.dtype, name="stage2")(_pool2(s1), train)
        s3 = RSUBlock(5, 64, 256, self.dtype, name="stage3")(_pool2(s2), train)
        s4 = RSUBlock(4, 128, 512, self.dtype, name="stage4")(_pool2(s3), train)
        s5 = RSU4F(256, 512, self.dtype, name="stage5")(_pool2(s4), train)
        s6 = RSU4F(256, 512, self.dtype, name="stage6")(_pool2(s5), train)

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

        side = lambda h, n: nn.sigmoid(_upsample_to(  # noqa: E731
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name=n)(h), x))
        sides = [side(d1, "side1"), side(d2, "side2"), side(d3, "side3"),
                 side(d4, "side4"), side(d5, "side5"), side(s6, "side6")]
        if full:
            return sides, [d1, d2, d3, d4, d5, s6]
        return sides[0][..., 0]  # [B, H, W]


class TorchBasicBlock(nn.Module):
    """resnet34 BasicBlock (`basnet.py:559-589`), torch attribute names."""

    ch: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=n)
        res = x
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        if self.downsample:
            res = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, dtype=self.dtype,
                          name="downsample_conv")(res)
            res = bn("downsample_bn")(res)
        return nn.relu(h + res)


class RefUnet(nn.Module):
    """Residual refinement module, exact twin of `basnet.py:186-283`."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(h, cname, bname):
            h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name=cname)(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=bname)(h)
            return nn.relu(h)

        hx = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="conv0")(x)
        encs = []
        for i in range(1, 5):
            hx = cbr(hx, f"conv{i}", f"bn{i}")
            encs.append(hx)
            hx = _pool2(hx)
        hx = cbr(hx, "conv5", "bn5")
        for i in range(4, 0, -1):
            hx = _upsample_to(hx, encs[i - 1])
            hx = cbr(jnp.concatenate([hx, encs[i - 1]], -1),
                     f"conv_d{i}", f"bn_d{i}")
        residual = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           name="conv_d0")(hx)
        return x + residual


class BASNet(nn.Module):
    """BASNet saliency net, exact twin of `basnet.py:284-556`.

    Encoder: 3x3 conv stem (stride 1, with BN) -> resnet34 layer1..4 ->
    two pooled 512 BasicBlock stages.  Dilated 512 bridge.  Decoder: six
    (conv_1 cat-in, conv_m, conv_2) + BN + relu stages with x2 bilinear
    upsampling between; `hd6`'s last BN is the shared **bn5d_2** (upstream
    quirk, see module docstring) and conv6d_m/_2 are dilation-2.  Side
    convs off the bridge and every decoder stage; RefUnet refines side 1.
    Returns the refined map [B, H, W] (the tester's `pred[0]`), or all 8
    sigmoid maps with full=True.
    """

    dtype: Any = jnp.float32

    def setup(self) -> None:
        conv = lambda ch, name, dil=1: nn.Conv(  # noqa: E731
            ch, (3, 3), kernel_dilation=(dil, dil), padding=dil,
            dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(dtype=self.dtype, name=name)  # noqa: E731

        self.inconv = conv(64, "inconv")
        self.inbn = bn("inbn")
        # resnet34 layers; first block of layer2..4 carries the downsample
        plan = {"encoder1": (3, 64, 1), "encoder2": (4, 128, 2),
                "encoder3": (6, 256, 2), "encoder4": (3, 512, 2)}
        for lname, (n, ch, stride) in plan.items():
            for b in range(n):
                setattr(self, f"{lname}_{b}", TorchBasicBlock(
                    ch, stride if b == 0 else 1,
                    downsample=(b == 0 and stride != 1), dtype=self.dtype,
                    name=f"{lname}_{b}"))
        for s in (5, 6):
            for b in (1, 2, 3):
                setattr(self, f"resb{s}_{b}", TorchBasicBlock(
                    512, dtype=self.dtype, name=f"resb{s}_{b}"))
        self.convbg_1, self.bnbg_1 = conv(512, "convbg_1", 2), bn("bnbg_1")
        self.convbg_m, self.bnbg_m = conv(512, "convbg_m", 2), bn("bnbg_m")
        self.convbg_2, self.bnbg_2 = conv(512, "convbg_2", 2), bn("bnbg_2")

        # decoder channel plan (`basnet.py:336-410`)
        dec = {6: (512, 512, 512, 2), 5: (512, 512, 512, 1),
               4: (512, 512, 256, 1), 3: (256, 256, 128, 1),
               2: (128, 128, 64, 1), 1: (64, 64, 64, 1)}
        for k, (c1, cm, c2, dil) in dec.items():
            setattr(self, f"conv{k}d_1", conv(c1, f"conv{k}d_1"))
            setattr(self, f"bn{k}d_1", bn(f"bn{k}d_1"))
            setattr(self, f"conv{k}d_m", conv(cm, f"conv{k}d_m", dil))
            setattr(self, f"bn{k}d_m", bn(f"bn{k}d_m"))
            setattr(self, f"conv{k}d_2", conv(c2, f"conv{k}d_2", dil))
            if k != 6:  # hd6 reuses bn5d_2 (upstream quirk); no bn6d_2
                setattr(self, f"bn{k}d_2", bn(f"bn{k}d_2"))

        self.outconvb = conv(1, "outconvb")
        for k in range(1, 7):
            setattr(self, f"outconv{k}", conv(1, f"outconv{k}"))
        self.refunet = RefUnet(self.dtype, name="refunet")

    def __call__(self, x, train: bool = False, full: bool = False):
        ra = not train
        h = nn.relu(self.inbn(self.inconv(x), use_running_average=ra))
        for b in range(3):
            h = getattr(self, f"encoder1_{b}")(h, train)
        h1 = h
        for b in range(4):
            h = getattr(self, f"encoder2_{b}")(h, train)
        h2 = h
        for b in range(6):
            h = getattr(self, f"encoder3_{b}")(h, train)
        h3 = h
        for b in range(3):
            h = getattr(self, f"encoder4_{b}")(h, train)
        h4 = h
        h = _pool2(h4)
        for b in (1, 2, 3):
            h = getattr(self, f"resb5_{b}")(h, train)
        h5 = h
        h = _pool2(h5)
        for b in (1, 2, 3):
            h = getattr(self, f"resb6_{b}")(h, train)
        h6 = h

        h = nn.relu(self.bnbg_1(self.convbg_1(h6), use_running_average=ra))
        h = nn.relu(self.bnbg_m(self.convbg_m(h), use_running_average=ra))
        hbg = nn.relu(self.bnbg_2(self.convbg_2(h), use_running_average=ra))

        def dstage(k, skip, prev, bn2):
            h = jnp.concatenate([prev, skip], -1)
            h = nn.relu(getattr(self, f"bn{k}d_1")(
                getattr(self, f"conv{k}d_1")(h), use_running_average=ra))
            h = nn.relu(getattr(self, f"bn{k}d_m")(
                getattr(self, f"conv{k}d_m")(h), use_running_average=ra))
            return nn.relu(bn2(getattr(self, f"conv{k}d_2")(h),
                               use_running_average=ra))

        hd6 = dstage(6, h6, hbg, self.bn5d_2)  # bn5d_2 shared: upstream quirk
        hd5 = dstage(5, h5, _upsample_to(hd6, h5), self.bn5d_2)
        hd4 = dstage(4, h4, _upsample_to(hd5, h4), self.bn4d_2)
        hd3 = dstage(3, h3, _upsample_to(hd4, h3), self.bn3d_2)
        hd2 = dstage(2, h2, _upsample_to(hd3, h2), self.bn2d_2)
        hd1 = dstage(1, h1, _upsample_to(hd2, h1), self.bn1d_2)

        side = lambda conv, h: nn.sigmoid(_upsample_to(conv(h), x))  # noqa: E731
        d1 = self.outconv1(hd1)  # already at input resolution
        dout = nn.sigmoid(self.refunet(d1, train))
        if full:
            return (dout, nn.sigmoid(d1), side(self.outconv2, hd2),
                    side(self.outconv3, hd3), side(self.outconv4, hd4),
                    side(self.outconv5, hd5), side(self.outconv6, hd6),
                    side(self.outconvb, hbg))
        return dout[..., 0]  # [B, H, W]


# ---------------------------------------------------------------------------
# preprocessing contracts (`saliency_detection.py:114-119, 141-148`)
# ---------------------------------------------------------------------------

def isnet_preprocess(img01: np.ndarray) -> np.ndarray:
    """[B, 1024, 1024, 3] float in [0,1] -> normalized net input.
    The ISNet tester normalizes with mean 0.5, std 1.0."""
    return np.asarray(img01, np.float32) - 0.5


def basnet_preprocess(img01: np.ndarray) -> np.ndarray:
    """[B, 256, 256, 3] float in [0,1] -> normalized net input.
    ToTensorLab(flag=0): /max then ImageNet mean/std."""
    img = np.asarray(img01, np.float32)
    img = img / max(float(img.max()), 1e-6)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return (img - mean) / std


# ---------------------------------------------------------------------------
# torch -> flax state-dict converters
# ---------------------------------------------------------------------------

def _set(tree: dict, path: list, leaf) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = leaf


def _torch_to_flax(sd: dict, translate, skip=()) -> dict:
    """Generic torch state-dict -> flax {params, batch_stats} mapping.

    `translate` maps a torch module path (list of segments) to a flax
    module path.  BN modules are detected by their running_mean key.
    """
    import numpy as onp

    bn_prefixes = {
        k[: -len(".running_mean")] for k in sd if k.endswith(".running_mean")
    }
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if any(key.startswith(s) for s in skip):
            continue
        mod, leaf = key.rsplit(".", 1)
        path = translate(mod.split("."))
        if path is None:
            continue
        v = onp.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if mod in bn_prefixes:
            if leaf == "weight":
                _set(params, path + ["scale"], v)
            elif leaf == "bias":
                _set(params, path + ["bias"], v)
            elif leaf == "running_mean":
                _set(stats, path + ["mean"], v)
            elif leaf == "running_var":
                _set(stats, path + ["var"], v)
        else:  # conv
            if leaf == "weight":
                _set(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
            else:
                _set(params, path + ["bias"], v)
    return {"params": params, "batch_stats": stats}


def convert_isnet_state_dict(sd: dict) -> dict:
    """isnet-general-use.pth (torch ISNetDIS) -> flax ISNetDIS variables.
    Torch names match the flax module names one-to-one."""
    return _torch_to_flax(sd, lambda segs: list(segs))


def convert_basnet_state_dict(sd: dict) -> dict:
    """gdi-basnet.pth (torch BASNet) -> flax BASNet variables.

    encoderN.B -> encoderN_B; resbX_Y/decoder/bridge/side names map 1:1;
    downsample.0/.1 -> downsample_conv/_bn; bn6d_2 is dropped (unused in
    the reference forward — hd6 runs through bn5d_2)."""

    def translate(segs):
        if segs[0] == "bn6d_2":
            return None  # created upstream, never used in forward
        out = []
        i = 0
        while i < len(segs):
            s = segs[i]
            if s.startswith("encoder") and i + 1 < len(segs) and segs[i + 1].isdigit():
                out.append(f"{s}_{segs[i + 1]}")
                i += 2
                continue
            if s == "downsample":
                out.append("downsample_conv" if segs[i + 1] == "0"
                           else "downsample_bn")
                i += 2
                continue
            out.append(s)
            i += 1
        return out

    return _torch_to_flax(sd, translate)
