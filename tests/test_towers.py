"""Random-weight numerical parity for the image towers (VERDICT r1 #3):
flax VGG16 / InceptionV3 / ViT-B/16 / DreamSim vs torch twins with
timm-compatible state_dicts, through the `utils/torch_port` converters.

Pretrained weights cannot be downloaded here, so every tensor is re-drawn
randomly (including BN running stats) — a converter that drops, transposes
wrongly, or mis-maps any leaf fails these asserts; real checkpoints then
load through the identical code path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# whole-module slow: multi-minute torch-twin builds + jit on CPU (r3 re-tier)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import tower_twins
from ralf_tpu.models.towers import (
    DreamSimEnsemble,
    InceptionV3Features,
    ViTB16,
    VGG16Features,
    resize_normalize,
)
from ralf_tpu.utils.torch_port import (
    merge_params,
    numpy_state_dict,
    port_dreamsim,
    port_inception_v3,
    port_vgg16,
    port_vit_b16,
)


def _img(rng, B, S):
    return rng.random((B, S, S, 3), dtype=np.float64).astype(np.float32)


def _rel_err(a, b):
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


def test_vgg16_parity():
    twin = tower_twins.randomize_(tower_twins.VGG16Twin(), seed=0)
    params = port_vgg16(numpy_state_dict(twin))
    x = _img(np.random.default_rng(0), 2, 224)
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(
        VGG16Features().apply({"params": params}, jnp.asarray(x))
    )
    assert out.shape == (2, 4096)
    assert _rel_err(out, ref) < 1e-4


def test_inception_v3_parity():
    twin = tower_twins.randomize_(tower_twins.InceptionV3Twin(), seed=1)
    params, stats = port_inception_v3(numpy_state_dict(twin))
    model = InceptionV3Features()
    x = _img(np.random.default_rng(1), 2, 128)
    # init supplies the tree shapes; merge_params asserts the converter
    # covered every BasicConv leaf with the right shapes
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_params(jax.device_get(variables["params"]), params)
    stats = merge_params(jax.device_get(variables["batch_stats"]), stats)
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    assert out.shape == (2, 2048)
    assert _rel_err(out, ref) < 1e-4


@pytest.mark.parametrize("pre_norm", [False, True])
def test_vit_b16_parity(pre_norm):
    # small ViT: the architecture/converter logic is depth-independent
    twin = tower_twins.randomize_(
        tower_twins.ViTTwin(dim=96, depth=3, num_heads=4, img_size=64,
                            pre_norm=pre_norm),
        seed=2 + pre_norm,
    )
    params = port_vit_b16(numpy_state_dict(twin), depth=3)
    x = _img(np.random.default_rng(2), 2, 64)
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(
        ViTB16(dim=96, depth=3, num_heads=4, pre_norm=pre_norm).apply(
            {"params": params}, jnp.asarray(x)
        )
    )
    assert out.shape == (2, 96)
    assert _rel_err(out, ref) < 1e-4


def test_dreamsim_ensemble_parity():
    towers = {}
    sd = {}
    for i, (name, pre_norm) in enumerate(
        (("dino", False), ("clip", True), ("open_clip", True))
    ):
        twin = tower_twins.randomize_(
            tower_twins.ViTTwin(dim=96, depth=2, num_heads=4, img_size=64,
                                pre_norm=pre_norm),
            seed=10 + i,
        )
        towers[name] = twin
        sd.update({f"{name}.{k}": v
                   for k, v in numpy_state_dict(twin).items()})
    params = port_dreamsim(sd)  # depth inferred from the state_dict

    x = _img(np.random.default_rng(3), 2, 64)
    refs = []
    with torch.no_grad():
        for name in ("dino", "clip", "open_clip"):
            f = towers[name](torch.tensor(x.transpose(0, 3, 1, 2)))
            f = f / f.norm(dim=-1, keepdim=True).clamp_min(1e-6)
            refs.append(f.numpy())
    ref = np.concatenate(refs, -1)
    out = np.asarray(
        DreamSimEnsemble(dim=96, depth=2, num_heads=4).apply(
            {"params": params}, jnp.asarray(x)
        )
    )
    assert out.shape == (2, 3 * 96)
    assert _rel_err(out, ref) < 1e-4


def test_resize_normalize_contract():
    x = _img(np.random.default_rng(4), 2, 97)  # odd size -> real resample
    out = resize_normalize(jnp.asarray(x), 64, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert out.shape == (2, 64, 64, 3)
    # [0,1] input maps into [-1,1] under mean/std 0.5
    assert float(jnp.min(out)) >= -1.0 - 1e-6
    assert float(jnp.max(out)) <= 1.0 + 1e-6
    # identity size + zero mean / unit std is a clip-only no-op
    same = resize_normalize(jnp.asarray(x), 97, (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(same), np.clip(x, 0, 1), atol=1e-5)


def test_deep_backbone_drives_retriever():
    """The paper's default dreamsim backbone is runnable end to end (random
    init here — no downloads), producing deterministic, sane neighbor
    tables through the standard Retriever path."""
    from ralf_tpu.data.dataset import DatasetConfig, SyntheticPosterDataset
    from ralf_tpu.retrieval.retriever import Retriever, get_backbone

    get_backbone.cache_clear()  # towers are lru-cached by (kind, cache_dir)
    ds = SyntheticPosterDataset(
        DatasetConfig(name="synthetic"), size=9, seed=5, image_hw=(64, 48)
    )
    # tiny ensemble via monkeypatched spec would leak; full-size towers on
    # 9 images are affordable once (ViT-B at 224: ~0.2 TFLOP total)
    r = Retriever.build(ds, backbone="dreamsim")
    assert r.features.shape == (9, 3 * 768)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r.features), axis=-1), 1.0, rtol=1e-4
    )
    table = r.topk(r.features, 3, exclude_self=True,
                   query_ids=np.arange(9))
    assert table.shape == (9, 3)
    assert (table != np.arange(9)[:, None]).all(), "self-retrieval leaked"
    # determinism: a rebuilt tower with the same seed reproduces features
    get_backbone.cache_clear()
    r2 = Retriever.build(ds, backbone="dreamsim")
    np.testing.assert_allclose(np.asarray(r.features), np.asarray(r2.features),
                               rtol=2e-5, atol=2e-6)
