"""Torch A/B parity for ICVT (VERDICT r2 next-round #3).

Instantiates the reference `image2layout/train/models/icvt.py` ICVTGenerator
(d_model=200, ga_type=concat — the shipped config,
`config/generator/icvt.yaml`) with random weights, ports every tensor through
`utils.torch_port.port_icvt`, and asserts on shared inputs:

  * train-path parity with the VAE latent pinned to z=mu (reparameterize
    noise removed on both sides): per-attribute recon logits, mu, logvar
    (`icvt.py:257-343`),
  * loss parity: per-attribute CE + KL with the reference's weight dict
    (`icvt.py:216-222,316-343`),
  * FULL 10-step sample parity with a pinned z ~ N(0,I): the reference's
    duplicated-prefix argmax loop (`icvt.py:345-410` — it re-appends the
    re-encoded whole prefix each step, `icvt.py:405`) vs our
    `ref_duplicated_prefix=True` mode must produce bit-identical token
    grids.  The production sample path is the train-consistent AR loop
    and intentionally deviates (ICVTGenerator.sample docstring).

This also locks the two reference quirks the flax twin matches deliberately:
the concat-GA cross-attention's zero-extended values + truncated out_proj
(`icvt.py:537-556`) and the train/sample asymmetry of ga_input_query
(with-PE at train, raw target at sample — `icvt.py:291-303` vs `:380-386`).
"""

import os
import sys
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
import ref_shims

ref_shims.install()

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import datasets as ds_lib
import jax
import jax.numpy as jnp

from ralf_tpu.core.layout import GEO_KEYS
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.models.icvt import ICVTCore, ICVTGenerator
from ralf_tpu.models.nn import keep_to_bias
from ralf_tpu.utils.torch_port import merge_params, numpy_state_dict, port_icvt

pytestmark = pytest.mark.slow

B, S, D, NB = 2, 10, 200, 128
H, W = 350, 240  # the reference asserts this canvas (`icvt.py:249`)


def _features():
    label = ds_lib.ClassLabel(names=["text", "logo", "underlay"])
    return ds_lib.Features({"label": ds_lib.Sequence(label)})


def _ids(rng):
    """Tokenized layout with realistic padding (reference Tokenizer.encode
    semantics: padded label -> bg class 3, padded geo -> 0)."""
    mask = np.zeros((B, S), bool)
    mask[0, :7] = True
    mask[1, :3] = True
    label = rng.integers(0, 3, (B, S))
    geo = {k: rng.integers(0, NB, (B, S)) for k in GEO_KEYS}
    label = np.where(mask, label, 3)
    geo = {k: np.where(mask, v, 0) for k, v in geo.items()}
    return {"label": label.astype(np.int64), "mask": mask,
            **{k: v.astype(np.int64) for k, v in geo.items()}}


def _rel_err(a, b):
    return np.abs(np.asarray(a) - b).max() / max(np.abs(b).max(), 1e-8)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    from image2layout.train.models.icvt import ICVTGenerator as RefICVT

    ref = RefICVT(features=_features(), d_model=D, ga_type="concat")
    ref.eval()

    gen = ICVTGenerator(
        num_labels=3,
        cfg=GeneratorConfig(d_model=D, nhead=8, num_encoder_layers=6,
                            num_decoder_layers=6, dropout=0.1,
                            backbone="resnet50"),
        ga_type="concat", max_seq_length=S, image_hw=(H, W),
    )
    variables = gen.init(jax.random.PRNGKey(0), batch_size=1)
    p, bs = port_icvt(numpy_state_dict(ref), d_model=D, num_layers=6)
    variables = {
        "params": merge_params(jax.device_get(variables["params"]), p),
        "batch_stats": merge_params(jax.device_get(variables["batch_stats"]), bs),
    }
    rng = np.random.default_rng(7)
    image = rng.random((B, H, W, 4), dtype=np.float64).astype(np.float32)
    return ref, gen, variables, image, _ids(rng)


def _fwd_mu(module: ICVTCore, ids, image):
    """ICVTCore.__call__ with the reparameterize noise pinned to zero
    (z = mu), mirroring the patched reference `VAEModule.reparameterize`."""
    img_memory = module.encoder(image, train=False)
    ga_k = module.ga_key_grid(image.shape[0])
    layout_feature = module.layout_encoder(ids)
    h = module.vae_encoder(layout_feature, img_memory, layout_feature, ga_k,
                           tgt_keep=ids["mask"], deterministic=True)
    tok = jnp.tile(module.learnable_token, (h.shape[0], 1, 1)).astype(h.dtype)
    pooled = module.aap(tok, h, keep_to_bias(ids["mask"])[:, None, None, :],
                        deterministic=True)
    mu, logvar = module.fc_mu(pooled), module.fc_var(pooled)
    shifted = jnp.concatenate([mu, layout_feature[:, :-1]], axis=1)
    shifted = module.pos_emb_1d(shifted, deterministic=True)
    h = module.vae_decoder(shifted, img_memory, shifted, ga_k, causal=True,
                           deterministic=True)
    return module.layout_decoder(h), mu, logvar


def test_train_path_parity(pair):
    ref, gen, variables, image, ids = pair

    inputs_t = {
        "image": torch.tensor(image.transpose(0, 3, 1, 2)),
        "mask": torch.tensor(ids["mask"]),
        "label": torch.tensor(ids["label"]),
        **{k: torch.tensor(ids[k]) for k in GEO_KEYS},
    }
    targets_t = {"label": inputs_t["label"],
                 **{k: inputs_t[k] for k in GEO_KEYS}}
    with torch.no_grad(), mock.patch.object(
        type(ref.vae_head), "reparameterize", lambda self, mu, logvar: mu
    ):
        out_t, losses_t = ref.train_loss(inputs_t, targets_t)

    ids_j = {k: jnp.asarray(v) for k, v in ids.items()}
    (out_f, mu_f, logvar_f) = gen.core.apply(
        variables, ids_j, jnp.asarray(image), method=_fwd_mu
    )

    for k in ("label", *GEO_KEYS):
        assert _rel_err(out_f[k], out_t[k].numpy()) < 1e-3, k
    assert _rel_err(mu_f, out_t["pred_mu"].numpy()) < 1e-3
    assert _rel_err(logvar_f, out_t["pred_logvar"].numpy()) < 1e-3

    # loss math parity (same formula as ICVTGenerator.loss, on the pinned-z
    # logits; reference scales kl by kl_mult*1e-3 in its weight dict)
    def ce(logits, tgt):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return float(-jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1)))

    for k in ("label", *GEO_KEYS):
        f = ce(out_f[k], ids_j[k])
        t = float(losses_t[f"loss_recon_{k}"])
        assert abs(f - t) < 1e-4 * max(1.0, abs(t)), (k, f, t)
    kl_f = float(-0.5 * jnp.mean(1 + logvar_f - mu_f**2 - jnp.exp(logvar_f)))
    assert abs(1e-3 * kl_f - float(losses_t["loss_kl"])) < 1e-6


def test_sample_parity(pair):
    """Pinned z -> our `ref_duplicated_prefix` loop must emit tokens
    identical to the reference's sample.

    The reference loop re-appends the re-encoded FULL prefix every step
    (`icvt.py:405`), producing a duplicated-prefix target inconsistent
    with its own training target — see ICVTGenerator.sample's docstring.
    The default (train-consistent) loop intentionally diverges from it;
    parity is asserted against the quirk-exact mode."""
    ref, gen, variables, image, _ = pair
    rng = np.random.default_rng(11)
    z = rng.normal(size=(B, 1, D)).astype(np.float32)

    cond_t = {
        "image": torch.tensor(image[..., :3].transpose(0, 3, 1, 2)),
        "saliency": torch.tensor(image[..., 3:].transpose(0, 3, 1, 2)),
        "mask": torch.ones((B, S), dtype=torch.bool),
        "label": torch.zeros((B, S), dtype=torch.long),
        **{k: torch.rand((B, S)) for k in GEO_KEYS},
    }
    z_t = torch.tensor(z)
    with torch.no_grad(), mock.patch.object(
        torch, "randn", lambda *a, **k: z_t.to(k.get("device", "cpu"))
    ):
        out_t = ref.sample(cond={k: v for k, v in cond_t.items()})

    layout_f = gen.sample(variables, {"image": image},
                          np.random.default_rng(0), z=jnp.asarray(z),
                          ref_duplicated_prefix=True)

    mask_t = out_t["label"].numpy() != 3
    mask_f = np.asarray(layout_f.mask)
    assert (mask_f == mask_t).all()
    label_t = np.where(mask_t, out_t["label"].numpy(), 0)
    assert (np.asarray(layout_f.label) == label_t).all()
    for k in GEO_KEYS:
        gf = np.where(mask_f, np.asarray(layout_f.geo(k)), 0.0)
        gt = np.where(mask_t, out_t[k].numpy(), 0.0)
        assert np.abs(gf - gt).max() < 1e-6, k
