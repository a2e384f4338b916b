"""Random-weight parity of the ISNet/BASNet flax twins vs the REFERENCE
torch classes (`image2layout/hfds_builder/models/saliency/{isnet,basnet}.py`,
loaded from /root/reference, never copied).

The converters under test are the ones that map the released
isnet-general-use.pth / gdi-basnet.pth weights, so passing here means
dropping real weights in is a state-dict load away.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# whole-module slow: multi-minute torch-twin builds + jit on CPU (r3 re-tier)
pytestmark = pytest.mark.slow

import ref_shims

ref_shims.install()  # torchvision shim: basnet.py needs models.resnet34

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ralf_tpu.preprocess.saliency_models import (  # noqa: E402
    BASNet,
    ISNetDIS,
    convert_basnet_state_dict,
    convert_isnet_state_dict,
)


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def test_isnet_parity_random_weights():
    from image2layout.hfds_builder.models.saliency.isnet import (
        ISNetDIS as TorchISNet,
    )

    torch.manual_seed(0)
    tm = TorchISNet().eval()
    _randomize_bn(tm)
    variables = convert_isnet_state_dict(tm.state_dict())

    rng = np.random.default_rng(0)
    x = rng.random((2, 128, 128, 3), np.float32) - 0.5
    with torch.inference_mode():
        sides_t, feats_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    fm = ISNetDIS()
    out = fm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), sides_t[0].numpy()[:, 0], atol=2e-4, rtol=0
    )

    sides_f, feats_f = fm.apply(variables, jnp.asarray(x), full=True)
    for i, (sf, st) in enumerate(zip(sides_f, sides_t)):
        np.testing.assert_allclose(
            np.asarray(sf)[..., 0], st.numpy()[:, 0], atol=2e-4, rtol=0,
            err_msg=f"side {i + 1}",
        )
    # decoder features too (the KL-distillation contract, isnet.py:638)
    for i, (ff, ft) in enumerate(zip(feats_f, feats_t)):
        np.testing.assert_allclose(
            np.asarray(ff), ft.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=0,
            err_msg=f"feature {i + 1}",
        )


def test_basnet_parity_random_weights():
    from image2layout.hfds_builder.models.saliency.basnet import (
        BASNet as TorchBASNet,
    )

    torch.manual_seed(0)
    tm = TorchBASNet(3, 1).eval()
    _randomize_bn(tm)
    variables = convert_basnet_state_dict(tm.state_dict())

    rng = np.random.default_rng(1)
    x = rng.random((2, 64, 64, 3), np.float32)
    with torch.inference_mode():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    fm = BASNet()
    out = fm.apply(variables, jnp.asarray(x))
    # tester consumes pred[0] == refined dout (saliency_detection.py:152)
    np.testing.assert_allclose(
        np.asarray(out), outs_t[0].numpy()[:, 0], atol=2e-4, rtol=0
    )

    full_f = fm.apply(variables, jnp.asarray(x), full=True)
    names = ["dout", "d1", "d2", "d3", "d4", "d5", "d6", "db"]
    for name, ff, ft in zip(names, full_f, outs_t):
        np.testing.assert_allclose(
            np.asarray(ff)[..., 0], ft.numpy()[:, 0], atol=2e-4, rtol=0,
            err_msg=name,
        )


def test_basnet_bn6d_2_is_unused_quirk():
    """The released checkpoint contains bn6d_2 params; the reference
    forward never applies them (hd6 runs through bn5d_2, basnet.py:483).
    The converter must drop them and the twin must not expect them."""
    from image2layout.hfds_builder.models.saliency.basnet import (
        BASNet as TorchBASNet,
    )

    tm = TorchBASNet(3, 1)
    sd = tm.state_dict()
    assert any(k.startswith("bn6d_2") for k in sd)
    variables = convert_basnet_state_dict(sd)
    assert "bn6d_2" not in variables["params"]
    assert "bn5d_2" in variables["params"]
    # converted tree must match the flax init tree exactly (full=True so
    # every side conv is traced and gets params)
    fm = BASNet()
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), full=True)
    t1 = jax.tree_util.tree_structure(jax.device_get(init))
    t2 = jax.tree_util.tree_structure(variables)
    assert t1 == t2, f"{t1}\n!=\n{t2}"
