"""Numerical parity of ported towers against the REFERENCE torch models.

FID parity is hypersensitive to the feature extractor (SURVEY §7 hard
part #1); these tests load the reference implementations from
/root/reference (never copied into the repo), port randomly initialized
weights through utils/torch_port, and assert the flax rebuild reproduces
the torch forward within fp32 tolerance.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from ralf_tpu.core.layout import Layout, random_layout
from ralf_tpu.models.fidnet import FIDNetV3 as FlaxFIDNet
from ralf_tpu.models.nn import TokenDecoder
from ralf_tpu.utils.torch_port import (
    numpy_state_dict,
    port_fidnet,
    port_resnet_trunk,
    port_token_decoder,
)


def test_fidnet_feature_parity():
    from image2layout.train.fid.model import FIDNetV3 as TorchFIDNet

    torch.manual_seed(0)
    tm = TorchFIDNet(num_label=3, d_model=64, nhead=4, num_layers=2, max_bbox=10)
    tm.eval()

    rng = np.random.default_rng(0)
    lay = random_layout(rng, 4, 10, 3)
    batch_t = {
        "label": torch.tensor(np.asarray(lay.label)),
        "center_x": torch.tensor(np.asarray(lay.center_x)),
        "center_y": torch.tensor(np.asarray(lay.center_y)),
        "width": torch.tensor(np.asarray(lay.width)),
        "height": torch.tensor(np.asarray(lay.height)),
        "mask": torch.tensor(np.asarray(lay.mask)),
    }
    with torch.no_grad():
        feats_t = tm.extract_features(batch_t).numpy()
        disc_t, cls_t, bbox_t = (x.detach().numpy() for x in tm(batch_t))

    fm = FlaxFIDNet(num_labels=3, d_model=64, nhead=4, num_layers=2, max_bbox=10)
    params = port_fidnet(numpy_state_dict(tm), num_layers=2)
    feats_f = np.asarray(
        fm.apply({"params": params}, lay, method=FlaxFIDNet.extract_features)
    )
    np.testing.assert_allclose(feats_f, feats_t, atol=2e-4, rtol=1e-3)

    disc_f, cls_f, bbox_f = fm.apply({"params": params}, lay)
    np.testing.assert_allclose(np.asarray(disc_f), disc_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(bbox_f), bbox_t, atol=2e-4, rtol=1e-3)


def test_base_decoder_parity():
    from image2layout.train.models.common.common import BaseDecoder

    torch.manual_seed(1)
    # d_model must be 256: other widths trigger the reference's
    # memory_dim_converter ablation path (`common/common.py:50-54`)
    tm = BaseDecoder(d_label=20, d_model=256, num_layers=2, nhead=4,
                     dim_feedforward=64)
    tm.eval()

    B, S, M = 2, 6, 5
    seq = torch.randint(0, 20, (B, S))
    memory = torch.randn(B, M, 256)
    with torch.no_grad():
        logits_t = tm(tgt=seq, memory=memory, is_causal=True).numpy()

    fm = TokenDecoder(vocab_size=20, d_model=256, nhead=4, num_layers=2,
                      dim_feedforward=64)
    params = {
        **port_token_decoder(numpy_state_dict(tm), num_layers=2),
    }
    logits_f = np.asarray(
        fm.apply({"params": params}, jnp.asarray(seq.numpy()),
                 jnp.asarray(memory.numpy()))
    )
    np.testing.assert_allclose(logits_f, logits_t, atol=3e-4, rtol=1e-3)


def test_resnet_trunk_port_shapes():
    """Shape-level check of the torchvision-name converter + 4-ch stem
    (full numerical parity needs the pretrained file, absent offline)."""
    from ralf_tpu.models.resnet import ResNetTrunk

    trunk = ResNetTrunk("resnet18", in_channels=4)
    variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 4)))

    # synth a torchvision-style state dict with matching shapes
    sd = {}
    sd["conv1.weight"] = np.random.randn(64, 3, 7, 7).astype(np.float32)
    sd["bn1.weight"] = np.ones(64, np.float32)
    sd["bn1.bias"] = np.zeros(64, np.float32)
    sd["bn1.running_mean"] = np.zeros(64, np.float32)
    sd["bn1.running_var"] = np.ones(64, np.float32)
    widths = [64, 128, 256, 512]
    in_w = 64
    for s, (depth, w) in enumerate(zip((2, 2, 2, 2), widths)):
        for b in range(depth):
            t = f"layer{s + 1}.{b}"
            w_in = in_w if b == 0 else w
            sd[f"{t}.conv1.weight"] = np.random.randn(w, w_in, 3, 3).astype(np.float32)
            sd[f"{t}.conv2.weight"] = np.random.randn(w, w, 3, 3).astype(np.float32)
            for bi in (1, 2):
                sd[f"{t}.bn{bi}.weight"] = np.ones(w, np.float32)
                sd[f"{t}.bn{bi}.bias"] = np.zeros(w, np.float32)
                sd[f"{t}.bn{bi}.running_mean"] = np.zeros(w, np.float32)
                sd[f"{t}.bn{bi}.running_var"] = np.ones(w, np.float32)
            if b == 0 and s > 0:
                sd[f"{t}.downsample.0.weight"] = np.random.randn(w, w_in, 1, 1).astype(np.float32)
                sd[f"{t}.downsample.1.weight"] = np.ones(w, np.float32)
                sd[f"{t}.downsample.1.bias"] = np.zeros(w, np.float32)
                sd[f"{t}.downsample.1.running_mean"] = np.zeros(w, np.float32)
                sd[f"{t}.downsample.1.running_var"] = np.ones(w, np.float32)
        in_w = w
    params, stats = port_resnet_trunk(sd, "resnet18", in_channels=4)

    ref_p = jax.tree.map(lambda x: x.shape, variables["params"])
    got_p = jax.tree.map(lambda x: x.shape, params)
    assert ref_p == got_p
    ref_s = jax.tree.map(lambda x: x.shape, variables["batch_stats"])
    got_s = jax.tree.map(lambda x: np.asarray(x).shape, stats)
    assert ref_s == got_s
    # and the ported trunk actually runs
    out3, out4 = trunk.apply({"params": params, "batch_stats": stats},
                             jnp.zeros((1, 64, 48, 4)))
    assert out3.shape[-1] == 256 and out4.shape[-1] == 512
