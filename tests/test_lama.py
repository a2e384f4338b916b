"""LaMa FFC generator: random-weight parity vs a torch twin.

The twin replicates the upstream saicinpainting `FFCResNetGenerator`
module tree name-for-name (ffc.py in https://github.com/advimman/lama —
the network inside the reference's big-lama.pt TorchScript,
`image2layout/hfds_builder/models/inpainting.py`), so the converter
validated here applies unchanged to the real released weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from ralf_tpu.preprocess.lama import (  # noqa: E402
    LamaConfig,
    convert_lama_state_dict,
    lama_forward,
    pad_to_modulo,
)


# ---- torch twin (upstream module tree, eval-mode) ----

class FourierUnit(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv_layer = nn.Conv2d(in_c * 2, out_c * 2, 1, bias=False)
        self.bn = nn.BatchNorm2d(out_c * 2)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        b, c, h, w = x.shape
        f = torch.fft.rfftn(x, dim=(-2, -1), norm="ortho")
        f = torch.stack((f.real, f.imag), dim=-1)          # (B,C,H,W',2)
        f = f.permute(0, 1, 4, 2, 3).contiguous().view(b, -1, h, w // 2 + 1)
        f = self.relu(self.bn(self.conv_layer(f)))
        f = f.view(b, -1, 2, h, w // 2 + 1).permute(0, 1, 3, 4, 2).contiguous()
        f = torch.complex(f[..., 0], f[..., 1])
        return torch.fft.irfftn(f, s=(h, w), dim=(-2, -1), norm="ortho")


class SpectralTransform(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_c, out_c // 2, 1, bias=False),
            nn.BatchNorm2d(out_c // 2),
            nn.ReLU(inplace=True),
        )
        self.fu = FourierUnit(out_c // 2, out_c // 2)
        self.conv2 = nn.Conv2d(out_c // 2, out_c, 1, bias=False)

    def forward(self, x):
        x = self.conv1(x)
        return self.conv2(x + self.fu(x))


class FFC(nn.Module):
    def __init__(self, in_c, out_c, k, ratio_gin, ratio_gout, stride=1, pad=0):
        super().__init__()
        in_cg = int(in_c * ratio_gin)
        in_cl = in_c - in_cg
        out_cg = int(out_c * ratio_gout)
        out_cl = out_c - out_cg
        self.ratio_gout = ratio_gout

        def conv(i, o):
            if i == 0 or o == 0:
                return nn.Identity()
            return nn.Conv2d(i, o, k, stride, pad, bias=False,
                             padding_mode="reflect")

        self.convl2l = conv(in_cl, out_cl)
        self.convl2g = conv(in_cl, out_cg)
        self.convg2l = conv(in_cg, out_cl)
        self.convg2g = (
            SpectralTransform(in_cg, out_cg)
            if in_cg and out_cg else nn.Identity()
        )

    def forward(self, x):
        x_l, x_g = x if isinstance(x, tuple) else (x, 0)
        out_l, out_g = 0, 0
        if self.ratio_gout != 1:
            out_l = self.convl2l(x_l) + self.convg2l(x_g)
        if self.ratio_gout != 0:
            out_g = self.convl2g(x_l) + self.convg2g(x_g)
        return out_l, out_g


class FFC_BN_ACT(nn.Module):
    def __init__(self, in_c, out_c, k, ratio_gin, ratio_gout, stride=1, pad=0):
        super().__init__()
        self.ffc = FFC(in_c, out_c, k, ratio_gin, ratio_gout, stride, pad)
        out_cg = int(out_c * ratio_gout)
        self.bn_l = nn.Identity() if out_cg == out_c else nn.BatchNorm2d(out_c - out_cg)
        self.bn_g = nn.Identity() if out_cg == 0 else nn.BatchNorm2d(out_cg)
        self.act_l = nn.ReLU(inplace=True)
        self.act_g = nn.ReLU(inplace=True)

    def forward(self, x):
        x_l, x_g = self.ffc(x)
        if not isinstance(x_l, int):
            x_l = self.act_l(self.bn_l(x_l))
        if not isinstance(x_g, int):
            x_g = self.act_g(self.bn_g(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        self.conv1 = FFC_BN_ACT(dim, dim, 3, ratio, ratio, pad=1)
        self.conv2 = FFC_BN_ACT(dim, dim, 3, ratio, ratio, pad=1)

    def forward(self, x):
        id_l, id_g = x
        x_l, x_g = self.conv2(self.conv1(x))
        return id_l + x_l, id_g + x_g


class ConcatTupleLayer(nn.Module):
    def forward(self, x):
        return torch.cat(x, dim=1)


class TupleSeq(nn.Sequential):
    pass


def build_torch_lama(cfg: LamaConfig, ratio: float = 0.75) -> nn.Module:
    layers = [nn.ReflectionPad2d(3),
              FFC_BN_ACT(cfg.input_nc, cfg.ngf, 7, 0, 0)]
    for i in range(cfg.n_downsampling):
        mult = 2 ** i
        gout = ratio if i == cfg.n_downsampling - 1 else 0
        layers.append(FFC_BN_ACT(min(cfg.max_features, cfg.ngf * mult),
                                 min(cfg.max_features, cfg.ngf * mult * 2),
                                 3, 0, gout, stride=2, pad=1))
    dim = min(cfg.max_features, cfg.ngf * 2 ** cfg.n_downsampling)
    for _ in range(cfg.n_blocks):
        layers.append(FFCResnetBlock(dim, ratio))
    layers.append(ConcatTupleLayer())
    for i in range(cfg.n_downsampling):
        mult = 2 ** (cfg.n_downsampling - i)
        layers += [
            nn.ConvTranspose2d(min(cfg.max_features, cfg.ngf * mult),
                               min(cfg.max_features, cfg.ngf * mult // 2),
                               3, stride=2, padding=1, output_padding=1),
            nn.BatchNorm2d(min(cfg.max_features, cfg.ngf * mult // 2)),
            nn.ReLU(True),
        ]
    layers += [nn.ReflectionPad2d(3),
               nn.Conv2d(cfg.ngf, cfg.output_nc, 7),
               nn.Sigmoid()]

    class Wrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*layers)

        def forward(self, image, mask):
            x = torch.cat([image * (1 - mask), mask], dim=1)
            pred = self.model(x)
            return mask * pred + (1 - mask) * image

    return Wrapper()


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


TINY = LamaConfig(ngf=8, n_blocks=2)


def test_lama_parity_random_weights():
    torch.manual_seed(0)
    twin = build_torch_lama(TINY).eval()
    _randomize_bn(twin)
    params = convert_lama_state_dict(twin.state_dict())

    rng = np.random.default_rng(0)
    img = rng.random((2, 40, 32, 3), np.float32)
    mask = (rng.random((2, 40, 32, 1)) > 0.8).astype(np.float32)

    with torch.inference_mode():
        ref = twin(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                   torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    out = lama_forward(params, img, mask, TINY)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=0
    )


def test_big_lama_structure_converts():
    """The converter keys line up with the full big-lama tree (param-count
    check only; the full net is too heavy to run per-test on CPU)."""
    torch.manual_seed(0)
    twin = build_torch_lama(LamaConfig(ngf=16, n_blocks=18))
    params = convert_lama_state_dict(twin.state_dict())
    want = {k for k, v in twin.state_dict().items()
            if "num_batches_tracked" not in k}
    assert set(params) == want
    # bottleneck blocks span model.5 .. model.22; upsample starts at 24
    assert "model.22.conv2.ffc.convg2g.fu.conv_layer.weight" in params
    assert params["model.24.weight"].shape[2:] == (64, 128)  # (kh,kw,Cout,Cin)


def test_pad_to_modulo():
    arr = np.zeros((1, 37, 50, 3), np.float32)
    padded, (h, w) = pad_to_modulo(arr)
    assert padded.shape == (1, 40, 56, 3) and (h, w) == (37, 50)


def test_inpaint_end_to_end(tmp_path):
    """`inpaint()` loads a TorchScript container, converts, infers the
    config, and matches the scripted twin through pad/crop plumbing."""
    from ralf_tpu.preprocess.inpainting import inpaint

    torch.manual_seed(1)
    twin = build_torch_lama(TINY).eval()
    _randomize_bn(twin)
    img = torch.rand(1, 3, 37, 30)
    msk = (torch.rand(1, 1, 37, 30) > 0.8).float()
    path = str(tmp_path / "big-lama.pt")
    # trace needs a mod-8 example (the net itself requires it)
    torch.jit.trace(twin, (torch.rand(1, 3, 40, 32),
                           torch.zeros(1, 1, 40, 32))).save(path)

    images = (img.numpy().transpose(0, 2, 3, 1) * 255).astype(np.uint8)
    masks = (msk.numpy()[:, 0] * 255).astype(np.uint8)
    out = inpaint(images, masks, lama_path=path)

    # reference path: same %8 symmetric padding, then crop (the net needs
    # mod-8 spatial dims; this mirrors `prepare_img_and_mask`)
    imgs_f = images.astype(np.float32) / 255.0
    imgs_p, (H, W) = pad_to_modulo(imgs_f)
    msk_p, _ = pad_to_modulo((masks > 127).astype(np.float32)[..., None])
    with torch.inference_mode():
        ref = twin(torch.from_numpy(imgs_p.transpose(0, 3, 1, 2)),
                   torch.from_numpy(msk_p.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)[:, :H, :W]
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=0)
