"""LaMa (big-lama) inpainting generator, TPU-native.

Parity target: the FFC-ResNet generator inside the `big-lama.pt`
TorchScript binary the reference downloads and runs on CPU/GPU
(`image2layout/hfds_builder/models/inpainting.py:15-58`, which wraps
https://github.com/advimman/lama 's `FFCResNetGenerator` with
input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
ratio_gin/gout=0.75 in the bottleneck, enable_lfu=False, sigmoid out).

This is a functional jax re-implementation (NHWC, eval-mode BN) plus a
state_dict converter, so the one-time offline inpainting stage runs on
the TPU instead of requiring host torch.  The Fourier Unit's global
branch maps to `jnp.fft.rfft2/irfft2` (norm='ortho'), which XLA lowers
natively.

Weights: `convert_lama_state_dict(torch.jit.load(path).state_dict())`.
Architecture + converter correctness is pinned by a random-weight torch
twin parity test (tests/test_lama.py) that replicates the upstream
module tree name-for-name.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LamaConfig:
    input_nc: int = 4  # masked RGB + mask
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    max_features: int = 1024


BIG_LAMA = LamaConfig()
_EPS = 1e-5  # torch BatchNorm2d default


def _bn(x, p, prefix):
    g = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    m = p[f"{prefix}.running_mean"]
    v = p[f"{prefix}.running_var"]
    return (x - m) * jax.lax.rsqrt(v + _EPS) * g + b


def _conv(x, w, b=None, stride: int = 1, padding: int = 0):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def _conv_transpose(x, w, b):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1).

    `w` arrives via the converter as the torch (Cin, Cout, kh, kw) tensor
    permuted (2,3,1,0) -> (kh, kw, Cout, Cin): exactly the HWIO kernel of
    the FORWARD conv whose transpose this op is, so transpose_kernel=True
    (which flips spatial dims and swaps I/O) reproduces torch bit-for-bit.
    jax pad = (k-1-p, k-1-p+output_padding) = (1, 2).
    """
    out = jax.lax.conv_transpose(
        x, w, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    return out + b


def _fourier_unit(x, p, prefix):
    """FourierUnit: rfft2 -> 1x1 conv on stacked re/im -> irfft2 (ortho)."""
    B, H, W, C = x.shape
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    # channel-major [c0_re, c0_im, c1_re, ...] == torch's permute+view
    ff = jnp.stack([f.real, f.imag], axis=-1).reshape(B, H, W // 2 + 1, 2 * C)
    ff = ff.astype(x.dtype)
    ff = _conv(ff, p[f"{prefix}.conv_layer.weight"])
    ff = jax.nn.relu(_bn(ff, p, f"{prefix}.bn"))
    Cout = ff.shape[-1] // 2
    ff = ff.astype(jnp.float32).reshape(B, H, W // 2 + 1, Cout, 2)
    f = jax.lax.complex(ff[..., 0], ff[..., 1])
    return jnp.fft.irfft2(f, s=(H, W), axes=(1, 2), norm="ortho").astype(x.dtype)


def _spectral_transform(x, p, prefix):
    """SpectralTransform (stride 1, enable_lfu=False)."""
    x = _conv(x, p[f"{prefix}.conv1.0.weight"])
    x = jax.nn.relu(_bn(x, p, f"{prefix}.conv1.1"))
    out = _fourier_unit(x, p, f"{prefix}.fu")
    return _conv(x + out, p[f"{prefix}.conv2.weight"])


def _ffc_bn_act(x_l, x_g, p, prefix, stride: int = 1, padding: int = 1):
    """FFC_BN_ACT: four-path FFC -> per-branch BN -> ReLU.

    Branch existence follows key presence (upstream replaces absent paths
    with nn.Identity when a ratio is 0).  Inputs/outputs may be None for
    the all-local stages.
    """
    f = f"{prefix}.ffc"
    out_l = None
    out_g = None
    # upstream FFC Conv2ds use padding_mode='reflect': pad once, conv valid
    if padding and x_l is not None:
        x_l = _reflect_pad(x_l, padding)
    if padding and x_g is not None:
        x_g_p = _reflect_pad(x_g, padding)
    else:
        x_g_p = x_g
    if f"{f}.convl2l.weight" in p and x_l is not None:
        out_l = _conv(x_l, p[f"{f}.convl2l.weight"], stride=stride)
    if f"{f}.convg2l.weight" in p and x_g is not None:
        y = _conv(x_g_p, p[f"{f}.convg2l.weight"], stride=stride)
        out_l = y if out_l is None else out_l + y
    if f"{f}.convl2g.weight" in p and x_l is not None:
        out_g = _conv(x_l, p[f"{f}.convl2g.weight"], stride=stride)
    if f"{f}.convg2g.conv1.0.weight" in p and x_g is not None:
        y = _spectral_transform(x_g, p, f"{f}.convg2g")
        out_g = y if out_g is None else out_g + y
    if out_l is not None:
        out_l = jax.nn.relu(_bn(out_l, p, f"{prefix}.bn_l"))
    if out_g is not None:
        out_g = jax.nn.relu(_bn(out_g, p, f"{prefix}.bn_g"))
    return out_l, out_g


def _reflect_pad(x, n: int = 3):
    return jnp.pad(x, ((0, 0), (n, n), (n, n), (0, 0)), mode="reflect")


@functools.partial(jax.jit, static_argnames=("cfg",))
def lama_forward(params: dict, image: jax.Array, mask: jax.Array,
                 cfg: LamaConfig = BIG_LAMA) -> jax.Array:
    """image [B,H,W,3] in [0,1], mask [B,H,W,1] in {0,1} -> inpainted
    [B,H,W,3] (mask-blended, like the scripted simple-lama wrapper).
    H and W must be multiples of 8 (pad via `pad_to_modulo`)."""
    x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
    x = _reflect_pad(x)
    idx = 1  # model.0 is the ReflectionPad
    x_l, x_g = _ffc_bn_act(x, None, params, f"model.{idx}", padding=0)
    idx += 1
    for _ in range(cfg.n_downsampling):
        x_l, x_g = _ffc_bn_act(x_l, x_g, params, f"model.{idx}", stride=2,
                               padding=1)
        idx += 1
    for _ in range(cfg.n_blocks):
        l, g = _ffc_bn_act(x_l, x_g, params, f"model.{idx}.conv1")
        l, g = _ffc_bn_act(l, g, params, f"model.{idx}.conv2")
        x_l = x_l + l
        x_g = x_g + g
        idx += 1
    idx += 1  # ConcatTupleLayer
    x = jnp.concatenate([x_l, x_g], axis=-1)
    for _ in range(cfg.n_downsampling):
        x = _conv_transpose(x, params[f"model.{idx}.weight"],
                            params[f"model.{idx}.bias"])
        x = jax.nn.relu(_bn(x, params, f"model.{idx + 1}"))
        idx += 3  # ConvTranspose, BN, ReLU
    idx += 1  # ReflectionPad
    x = _reflect_pad(x)
    pred = jax.nn.sigmoid(
        _conv(x, params[f"model.{idx}.weight"], params[f"model.{idx}.bias"])
    )
    return mask * pred + (1.0 - mask) * image


def convert_lama_state_dict(sd: dict) -> dict:
    """torch (TorchScript or module) state_dict -> jax params.

    Every 4-D `.weight` — plain convs (Co,Ci,kh,kw) AND transpose convs
    (Ci,Co,kh,kw) — takes the same (2,3,1,0) permutation: plain convs land
    in HWIO, transpose convs land in the forward-conv HWIO layout that
    `_conv_transpose`'s transpose_kernel=True expects.  Wrapper prefixes
    (e.g. 'generator.' / 'model.model.') are stripped down to 'model.N...'.
    """
    out = {}
    for k, v in sd.items():
        m = re.search(r"(?:^|\.)(model\.\d+\..+)$", k)
        if not m or k.endswith("num_batches_tracked"):
            continue  # discriminator / loss towers / BN step counters
        k = m.group(1)
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                       np.float32)
        if k.endswith(".weight") and v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        out[k] = jnp.asarray(v)
    return out


def infer_config(params: dict) -> LamaConfig:
    """Recover (input_nc, output_nc, ngf, n_downsampling, n_blocks) from a
    converted param tree — the TorchScript container carries no config."""
    block_idxs = sorted(
        {int(m.group(1)) for k in params
         if (m := re.match(r"model\.(\d+)\.conv1\.", k))}
    )
    n_blocks = len(block_idxs)
    n_downsampling = block_idxs[0] - 2  # model.0 pad, model.1 init FFC
    w_init = params["model.1.ffc.convl2l.weight"]  # HWIO
    final_idx = max(int(m.group(1)) for k in params
                    if (m := re.match(r"model\.(\d+)\.weight$", k)))
    return LamaConfig(
        input_nc=w_init.shape[2],
        output_nc=params[f"model.{final_idx}.weight"].shape[3],
        ngf=w_init.shape[3],
        n_downsampling=n_downsampling,
        n_blocks=n_blocks,
    )


def pad_to_modulo(arr: np.ndarray, mod: int = 8) -> tuple[np.ndarray, tuple]:
    """Symmetric-pad H and W (axis 1,2) up to a multiple of `mod`
    (`models/inpainting.py:100-108`); returns (padded, original (H, W))."""
    _, H, W = arr.shape[0], arr.shape[1], arr.shape[2]
    Hp = -(-H // mod) * mod
    Wp = -(-W // mod) * mod
    pad = [(0, 0), (0, Hp - H), (0, Wp - W)] + [(0, 0)] * (arr.ndim - 3)
    return np.pad(arr, pad, mode="symmetric"), (H, W)


def load_lama_params(path: str) -> Optional[dict]:
    """Load + convert a big-lama TorchScript (or .pth state_dict) file."""
    import torch

    try:
        module = torch.jit.load(path, map_location="cpu")
        sd = module.state_dict()
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return convert_lama_state_dict(sd)
