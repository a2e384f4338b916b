"""Import shims so the REFERENCE torch model classes can be instantiated
in this environment for parity testing.

The image lacks `timm` and `torchvision`; the reference's image towers
(`image2layout/train/models/common/image.py`) need both.  For parity we
only need *randomly initialized* twins with torchvision-compatible module
naming, so this file provides:

  * a plain-torch ResNet (standard He-et-al architecture, v1.5 stride
    placement, torchvision attribute names) — NOT a copy of torchvision,
    just the public architecture, so `load_state_dict` round-trips and
    `port_resnet_trunk` sees the expected key names;
  * `create_feature_extractor(model, return_nodes)` returning layer3/4
    taps with the submodules re-exposed (the reference mutates
    `.body.conv1` for the 4-channel stem);
  * module objects injected as `timm` / `torchvision` into sys.modules.

Call `install()` BEFORE importing any `image2layout` module.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import torch
import torch.nn as nn


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() on the shim works
    # (datasets probes find_spec("torchvision") at import time)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False),
                nn.BatchNorm2d(width),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _ResNet(nn.Module):
    def __init__(self, block, depths, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (d, w) in enumerate(zip(depths, (64, 128, 256, 512))):
            blocks = []
            for b in range(d):
                stride = 2 if (b == 0 and i > 0) else 1
                blocks.append(block(cin, w, stride))
                cin = w * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def resnet18(**kwargs):
    return _ResNet(_BasicBlock, (2, 2, 2, 2))


def resnet34(**kwargs):
    return _ResNet(_BasicBlock, (3, 4, 6, 3))


def resnet50(**kwargs):
    return _ResNet(_Bottleneck, (3, 4, 6, 3))


class _FeatureTaps(nn.Module):
    """create_feature_extractor equivalent for the two taps the reference
    uses; re-exposes the stem/stage submodules so `.body.conv1` mutation
    and state_dict key names behave like torchvision's."""

    def __init__(self, model, return_nodes):
        super().__init__()
        self.return_nodes = dict(return_nodes)
        for name in ("conv1", "bn1", "relu", "maxpool",
                     "layer1", "layer2", "layer3", "layer4"):
            setattr(self, name, getattr(model, name))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        l3 = self.layer3(x)
        l4 = self.layer4(l3)
        taps = {"layer3": l3, "layer4": l4}
        return {out: taps[node] for node, out in self.return_nodes.items()}


def install() -> None:
    """Inject timm/torchvision shims; idempotent."""
    if "timm" in sys.modules and getattr(sys.modules["timm"], "_ralf_shim", False):
        return

    timm = _module("timm")
    timm._ralf_shim = True
    timm.create_model = lambda name, **kw: {"resnet18": resnet18,
                                            "resnet50": resnet50}[name]()

    tv = _module("torchvision")
    tv._ralf_shim = True
    models = _module("torchvision.models")
    models.resnet18 = resnet18
    models.resnet34 = resnet34
    models.resnet50 = resnet50

    class _W:  # weight-enum lookalikes; only attribute access happens
        IMAGENET1K_V1 = "IMAGENET1K_V1"
        IMAGENET1K_V2 = "IMAGENET1K_V2"

    models.ResNet18_Weights = _W
    models.ResNet34_Weights = _W
    models.ResNet50_Weights = _W
    fe = _module("torchvision.models.feature_extraction")
    fe.create_feature_extractor = _FeatureTaps
    models.feature_extraction = fe

    transforms = _module("torchvision.transforms")

    class _Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = torch.tensor(mean), torch.tensor(std)

        def __call__(self, x):
            shape = (1, -1, 1, 1) if x.dim() == 4 else (-1, 1, 1)
            return (x - self.mean.view(shape)) / self.std.view(shape)

    transforms.Normalize = _Normalize

    # torchvision.ops.boxes.box_area (used by common_gan/rec_loss.py:13)
    ops = _module("torchvision.ops")
    boxes_mod = _module("torchvision.ops.boxes")
    boxes_mod.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    ops.boxes = boxes_mod

    tv.models = models
    tv.transforms = transforms
    tv.ops = ops

    if "omegaconf" not in sys.modules:
        omegaconf = _module("omegaconf")

        class DictConfig(dict):  # attribute-style access, enough for refs
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        import contextlib

        omegaconf.DictConfig = DictConfig
        omegaconf.OmegaConf = types.SimpleNamespace(
            create=DictConfig, set_struct=lambda cfg, flag: None
        )
        omegaconf.open_dict = contextlib.nullcontext
        sys.modules["omegaconf"] = omegaconf

    sys.modules["timm"] = timm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.feature_extraction"] = fe
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
