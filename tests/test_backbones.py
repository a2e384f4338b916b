import jax
import jax.numpy as jnp
import numpy as np

from ralf_tpu.core.layout import random_layout
from ralf_tpu.models.fidnet import FIDNetV3
from ralf_tpu.models.resnet import ImageEncoder, ResNetFPNEncoder


def test_resnet_fpn_output_shape():
    # reference canvas: H=350, W=240 -> stride-16 map 22x15 = 330 tokens
    # (`models/common/image.py:88` hard-codes 330 for the lstm head)
    enc = ResNetFPNEncoder(backbone="resnet18", d_model=64)
    img = jnp.zeros((1, 350, 240, 4))
    vars_ = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(vars_, img)
    assert out.shape == (1, 22, 15, 64)


def test_image_encoder_memory():
    enc = ImageEncoder(backbone="resnet18", d_model=64, num_layers=1, dim_feedforward=128)
    img = jnp.zeros((2, 96, 64, 4))
    vars_ = enc.init(jax.random.PRNGKey(0), img)
    mem = enc.apply(vars_, img)
    assert mem.shape == (2, 6 * 4, 64)


def test_fidnet_features_permutation_invariant():
    rng = np.random.default_rng(0)
    layout = random_layout(rng, 4, 10, 3)
    net = FIDNetV3(num_labels=3, d_model=32, nhead=4, num_layers=2, max_bbox=10)
    vars_ = net.init(jax.random.PRNGKey(0), layout)
    feat = net.apply(vars_, layout, method=FIDNetV3.extract_features)
    assert feat.shape == (4, 32)

    # permute valid elements of sample 0 -> identical CLS feature
    n = int(layout.num_elements()[0])
    if n > 1:
        perm = np.concatenate([np.arange(n)[::-1], np.arange(n, 10)])
        def permute(x):
            return x.at[0].set(x[0][perm])
        layout2 = jax.tree.map(permute, layout)
        feat2 = net.apply(vars_, layout2, method=FIDNetV3.extract_features)
        np.testing.assert_allclose(np.asarray(feat[0]), np.asarray(feat2[0]), atol=1e-4)

    disc, cls, bbox = net.apply(vars_, layout)
    assert disc.shape == (4,) and cls.shape == (4, 10, 3) and bbox.shape == (4, 10, 4)
    assert float(bbox.min()) >= 0.0 and float(bbox.max()) <= 1.0
