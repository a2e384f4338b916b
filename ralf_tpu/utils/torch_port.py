"""Torch state_dict -> flax parameter-tree converters.

The reference's frozen towers are pretrained torch models (torchvision/
timm ResNet50 IMAGENET1K_V2, trained FIDNetV3 checkpoints, DreamSim —
SURVEY §2.9).  FID parity is hypersensitive to these weights (SURVEY §7
"hard parts" #1), so the rebuild ports them tensor-by-tensor instead of
retraining.  This module converts:

  * torch nn.MultiheadAttention / TransformerEncoder(Decoder)Layer stacks
    -> ralf_tpu.models.nn trees (in_proj split into q/k/v, transposes)
  * the reference FIDNetV3 (`train/fid/model.py`) -> models.fidnet.FIDNetV3
  * torchvision/timm ResNet state_dicts -> models.resnet.ResNetTrunk
    (incl. the 4-channel stem extension: mean of RGB kernels appended,
    `common/image.py:69-77`)
  * the reference BaseDecoder (`common/common.py:13-135`) -> TokenDecoder

All inputs are {name: np.ndarray}; call `numpy_state_dict(torch_module)`
to detach a live torch module.  Numerical parity is asserted by
tests/test_torch_parity.py against the reference implementations.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def numpy_state_dict(torch_module) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in torch_module.state_dict().items()}


def _dense(sd: dict, prefix: str) -> dict:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def port_mha(sd: dict, prefix: str) -> dict:
    """torch nn.MultiheadAttention -> models.nn.MultiHeadAttention."""
    w = sd[f"{prefix}.in_proj_weight"]  # [3D, D]
    b = sd[f"{prefix}.in_proj_bias"]
    D = w.shape[1]
    q_w, k_w, v_w = w[:D], w[D : 2 * D], w[2 * D :]
    q_b, k_b, v_b = b[:D], b[D : 2 * D], b[2 * D :]
    return {
        "q_proj": {"kernel": q_w.T, "bias": q_b},
        "k_proj": {"kernel": k_w.T, "bias": k_b},
        "v_proj": {"kernel": v_w.T, "bias": v_b},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def port_encoder_layer(sd: dict, prefix: str) -> dict:
    """torch nn.TransformerEncoderLayer -> models.nn.TransformerEncoderLayer."""
    return {
        "self_attn": port_mha(sd, f"{prefix}.self_attn"),
        "ffn": {
            "Dense_0": _dense(sd, f"{prefix}.linear1"),
            "Dense_1": _dense(sd, f"{prefix}.linear2"),
        },
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def port_decoder_layer(sd: dict, prefix: str) -> dict:
    """torch nn.TransformerDecoderLayer -> models.nn.TransformerDecoderLayer."""
    return {
        "self_attn": port_mha(sd, f"{prefix}.self_attn"),
        "cross_attn": port_mha(sd, f"{prefix}.multihead_attn"),
        "ffn": {
            "Dense_0": _dense(sd, f"{prefix}.linear1"),
            "Dense_1": _dense(sd, f"{prefix}.linear2"),
        },
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
    }


def port_encoder_stack(sd: dict, prefix: str, num_layers: int) -> dict:
    return {
        f"layer_{i}": port_encoder_layer(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }


def port_fidnet(sd: dict, num_layers: int = 4) -> dict:
    """Reference FIDNetV3 state_dict -> models.fidnet.FIDNetV3 params."""
    return {
        "emb_label": {"embedding": sd["emb_label.weight"]},
        "fc_bbox": _dense(sd, "fc_bbox"),
        "enc_fc_in": _dense(sd, "enc_fc_in"),
        "cls_token": sd["enc_transformer.token"].transpose(1, 0, 2),
        "enc_transformer": port_encoder_stack(
            sd, "enc_transformer.core", num_layers
        ),
        "fc_out_disc": _dense(sd, "fc_out_disc"),
        "pos_token": sd["pos_token"],
        "dec_fc_in": _dense(sd, "dec_fc_in"),
        "dec_transformer": port_encoder_stack(sd, "dec_transformer", num_layers),
        "fc_out_cls": _dense(sd, "fc_out_cls"),
        "fc_out_bbox": _dense(sd, "fc_out_bbox"),
    }


def port_token_decoder(sd: dict, num_layers: int) -> dict:
    """Reference BaseDecoder state_dict -> models.nn.TokenDecoder params."""
    return {
        "emb": {"embedding": sd["emb.weight"]},
        "stack": {
            f"layer_{i}": port_decoder_layer(sd, f"transformer.layers.{i}")
            for i in range(num_layers)
        },
        "head_norm": _layernorm(sd, "head.0"),
        "head_out": {"kernel": sd["head.1.weight"].T},
    }


# --------------------------------------------------------------------------
# ResNet trunks (torchvision / timm names)
# --------------------------------------------------------------------------

_BLOCK_DEPTHS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}


def _conv(sd: dict, name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}


def _bn(sd: dict, name: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def port_resnet_trunk(sd: dict, backbone: str = "resnet50",
                      in_channels: int = 4) -> tuple[dict, dict]:
    """torchvision/timm ResNet state_dict -> (params, batch_stats) for
    models.resnet.ResNetTrunk.  The 3-channel stem is widened to
    `in_channels` by appending the mean RGB kernel (`common/image.py:74-76`).
    """
    params: dict = {}
    stats: dict = {}

    w = sd["conv1.weight"]  # [64, 3, 7, 7]
    if in_channels > w.shape[1]:
        extra = w.mean(axis=1, keepdims=True)
        extra = np.repeat(extra, in_channels - w.shape[1], axis=1)
        w = np.concatenate([w, extra], axis=1)
    params["conv1"] = {"kernel": w.transpose(2, 3, 1, 0)}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    is_bottleneck = backbone == "resnet50"
    for stage, depth in enumerate(_BLOCK_DEPTHS[backbone]):
        for b in range(depth):
            t = f"layer{stage + 1}.{b}"
            m = f"layer{stage + 1}_{b}"
            blk_p: dict = {}
            blk_s: dict = {}
            n_convs = 3 if is_bottleneck else 2
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = _conv(sd, f"{t}.conv{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                blk_p["down_conv"] = _conv(sd, f"{t}.downsample.0")
                blk_p["down_bn"], blk_s["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[m] = blk_p
            stats[m] = blk_s
    return params, stats


# --------------------------------------------------------------------------
# Full RALF assembly (the flagship quality-parity path)
# --------------------------------------------------------------------------


def _conv_bias(sd: dict, name: str) -> dict:
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{name}.bias"],
    }


def _sub(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def port_vit_ffn(sd: dict, prefix: str) -> dict:
    """Reference ViT FeedForward (`common/attention.py:15-30`:
    LN -> Linear -> GELU -> Linear) -> models.ralf.ViTFeedForward."""
    return {
        "LayerNorm_0": _layernorm(sd, f"{prefix}.net.0"),
        "Dense_0": _dense(sd, f"{prefix}.net.1"),
        "Dense_1": _dense(sd, f"{prefix}.net.4"),
    }


def port_vit_attention(sd: dict, prefix: str) -> dict:
    """Reference ViT Attention (`common/attention.py:33-71`) ->
    models.ralf.ViTCrossAttention (bias-free q/kv, Sequential to_out)."""
    return {
        "LayerNorm_0": _layernorm(sd, f"{prefix}.norm"),
        "to_q": {"kernel": sd[f"{prefix}.to_q.weight"].T},
        "to_kv": {"kernel": sd[f"{prefix}.to_kv.weight"].T},
        "to_out": {
            "kernel": sd[f"{prefix}.to_out.0.weight"].T,
            "bias": sd[f"{prefix}.to_out.0.bias"],
        },
    }


def port_fidnet_encoder(sd: dict, num_layers: int = 4) -> dict:
    """The feature-extractor half of FIDNetV3 (`fid/model.py:150-175`
    load_fidnet_feature_extractor deletes the decoder head) — ports only
    the keys that survive, for merging over a randomly-initialized tree."""
    return {
        "emb_label": {"embedding": sd["emb_label.weight"]},
        "fc_bbox": _dense(sd, "fc_bbox"),
        "enc_fc_in": _dense(sd, "enc_fc_in"),
        "cls_token": sd["enc_transformer.token"].transpose(1, 0, 2),
        "enc_transformer": port_encoder_stack(sd, "enc_transformer.core", num_layers),
    }


def port_fpn_encoder(sd: dict, prefix: str, backbone: str = "resnet50"):
    """Reference ResnetBackbone w/ transformer head (`common/image.py:27-120`)
    -> models.resnet.ResNetFPNEncoder(fpn_style='ralf') params+batch_stats."""
    trunk_p, trunk_s = port_resnet_trunk(
        _sub(sd, f"{prefix}.body."), backbone, in_channels=4
    )
    params = {
        "trunk": trunk_p,
        "fpn_conv11_4": _conv_bias(sd, f"{prefix}.fpn_conv11_4"),
        "fpn_conv11_5": _conv_bias(sd, f"{prefix}.fpn_conv11_5"),
        "fpn_conv33": _conv_bias(sd, f"{prefix}.fpn_conv33"),
        "proj": _conv_bias(sd, f"{prefix}.proj"),
    }
    return params, {"trunk": trunk_s}


def port_ralf_core(
    sd: dict,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
    fid_layers: int = 4,
    backbone: str = "resnet50",
) -> tuple[dict, dict]:
    """Complete reference flagship
    `ConcateAuxilaryTaskConcateCrossAttnRetrievalAugmentedAutoreg`
    (`retrieval_augmented_autoreg.py:997-1033`) state_dict ->
    (params, batch_stats) subtrees for models.ralf.RALFCore.

    The FIDNet subtree is partial (the reference deletes its decoder head);
    merge the result over a randomly-initialized tree with
    `merge_params` so the unused leaves keep their shapes.
    """
    fpn_p, fpn_s = port_fpn_encoder(sd, "encoder.extractor", backbone)
    params = {
        "encoder": {
            "extractor": fpn_p,
            "transformer": port_encoder_stack(
                sd, "transformer_encoder", num_encoder_layers
            ),
        },
        "layout_encoder": port_fidnet_encoder(_sub(sd, "layout_encoer."), fid_layers),
        "layout_adapter": port_vit_ffn(sd, "layout_adapter"),
        "attn": port_vit_attention(sd, "attn"),
        "fusion_head": port_vit_ffn(sd, "head"),
        "const_encoder": {
            "Embed_0": {"embedding": sd["user_const_encoder.emb.weight"]},
            "TransformerEncoder_0": port_encoder_stack(
                sd, "user_const_encoder.encoder", num_encoder_layers
            ),
        },
        "flag_emb": sd["task_emb.weight"],
        "decoder": port_token_decoder(_sub(sd, "decoder."), num_decoder_layers),
    }
    batch_stats = {"encoder": {"extractor": fpn_s}}
    return params, batch_stats


def merge_params(base: dict, ported: dict, path: str = "") -> dict:
    """Overlay `ported` onto an initialized tree, asserting every ported
    leaf exists in `base` with the same shape — a mapping error fails
    loudly instead of silently keeping random weights."""
    out = dict(base)
    for k, v in ported.items():
        assert k in base, f"ported key {path}/{k} not in initialized tree"
        if isinstance(v, dict):
            out[k] = merge_params(base[k], v, f"{path}/{k}")
        else:
            assert tuple(base[k].shape) == tuple(np.shape(v)), (
                f"{path}/{k}: init {base[k].shape} vs ported {np.shape(v)}"
            )
            out[k] = np.asarray(v, dtype=base[k].dtype)
    return out


def port_autoreg_core(
    sd: dict,
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
    backbone: str = "resnet50",
) -> tuple[dict, dict]:
    """Reference `ConcateAuxilaryTaskAutoreg` (`models/autoreg.py:432-622`:
    ResNet50-FPN + 6L encoder + UserConstraintTransformerEncoder + flag
    embeddings + BaseDecoder, no retrieval) state_dict ->
    (params, batch_stats) subtrees for models.autoreg.AutoregCore."""
    fpn_p, fpn_s = port_fpn_encoder(sd, "encoder.extractor", backbone)
    params = {
        "encoder": {
            "extractor": fpn_p,
            "transformer": port_encoder_stack(
                sd, "transformer_encoder", num_encoder_layers
            ),
        },
        "const_encoder": {
            "Embed_0": {"embedding": sd["user_const_encoder.emb.weight"]},
            "TransformerEncoder_0": port_encoder_stack(
                sd, "user_const_encoder.encoder", num_encoder_layers
            ),
        },
        "flag_emb": sd["task_emb.weight"],
        "decoder": port_token_decoder(_sub(sd, "decoder."), num_decoder_layers),
    }
    return params, {"encoder": {"extractor": fpn_s}}


# --------------------------------------------------------------------------
# Other generator families (MaskGIT / CGL-GAN / DS-GAN / ICVT) — torch A/B
# --------------------------------------------------------------------------


def port_conv1d(sd: dict, prefix: str) -> dict:
    """torch nn.Conv1d [Cout, Cin, k] -> flax nn.Conv kernel [k, Cin, Cout]."""
    out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def port_image_encoder(sd: dict, prefix: str, backbone: str = "resnet50",
                       num_layers: int = 6) -> tuple[dict, dict]:
    """Reference cgl-style ImageEncoder (`common/image.py:132-231`:
    ImageFeatureExtractor + sine 2D PE + pre-LN TransformerEncoder) ->
    models.resnet.ImageEncoder(fpn_style='cgl') (params, batch_stats)."""
    trunk_p, trunk_s = port_resnet_trunk(
        _sub(sd, f"{prefix}extractor.body."), backbone, in_channels=4
    )
    params = {
        "extractor": {
            "trunk": trunk_p,
            "conv11": _conv_bias(sd, f"{prefix}extractor.conv11"),
            "conv22": _conv_bias(sd, f"{prefix}extractor.conv22"),
            "conv33": _conv_bias(sd, f"{prefix}extractor.conv33"),
        },
        "transformer": port_encoder_stack(
            sd, f"{prefix}transformer_encoder", num_layers
        ),
    }
    return params, {"extractor": {"trunk": trunk_s}}


def port_maskgit(sd: dict, num_encoder_layers: int = 6,
                 num_decoder_layers: int = 6,
                 backbone: str = "resnet50") -> tuple[dict, dict]:
    """Reference MaskGIT (`models/maskgit.py:63-121`) -> MaskGITCore."""
    enc_p, enc_s = port_image_encoder(sd, "encoder.", backbone, num_encoder_layers)
    params = {
        "encoder": enc_p,
        "decoder": port_token_decoder(_sub(sd, "decoder."), num_decoder_layers),
    }
    return params, {"encoder": enc_s}


def _decoder_stack(sd: dict, prefix: str, num_layers: int) -> dict:
    return {
        f"layer_{i}": port_decoder_layer(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }


def port_cgl_generator(sd: dict, num_encoder_layers: int = 6,
                       num_decoder_layers: int = 6,
                       backbone: str = "resnet50") -> tuple[dict, dict]:
    """Reference CGLGenerator (`models/cgl.py:19-119`) -> CGLGeneratorCore.
    The reference's `head` Sequential is constructed but never applied in
    `decode` (`cgl.py:79-83` vs `:108-119`) — fc1/fc2 read the decoder
    output directly, so no head keys are ported."""
    enc_p, enc_s = port_image_encoder(sd, "encoder.", backbone, num_encoder_layers)
    params = {
        "encoder": enc_p,
        "layout_encoder": {"Conv_0": port_conv1d(sd, "layout_encoder.0")},
        "decoder": _decoder_stack(sd, "transformer_decoder", num_decoder_layers),
        "fc_cls": {"kernel": sd["fc1.weight"].T},
        "fc_box": {"kernel": sd["fc2.weight"].T},
    }
    return params, {"encoder": enc_s}


def port_cgl_discriminator(sd: dict, num_layers: int = 4,
                           backbone: str = "resnet18") -> tuple[dict, dict]:
    """Reference CGLDiscriminator (`models/cgl.py:185-271`)."""
    enc_p, enc_s = port_image_encoder(sd, "encoder.", backbone, num_layers)
    params = {
        "encoder": enc_p,
        "layout_encoder": {"Conv_0": port_conv1d(sd, "layout_encoder.0")},
        "decoder": _decoder_stack(sd, "transformer_decoder", num_layers),
        "head_norm": _layernorm(sd, "head.0"),
        "head": {"kernel": sd["head.1.weight"].T},
    }
    return params, {"encoder": enc_s}


def port_lstm_cells(sd: dict, prefix: str, num_layers: int) -> dict:
    """torch nn.LSTM(bidirectional) -> models.dsgan.BiLSTM cell params.
    torch packs gates (i, f, g, o) along rows of weight_ih/weight_hh; flax
    LSTMCell keeps one Dense per gate, with bias only on the hidden path —
    so the two torch biases fold into one (the gate pre-activations add)."""
    out: dict = {}
    for layer in range(num_layers):
        for d, suf in enumerate(("", "_reverse")):
            w_ih = sd[f"{prefix}.weight_ih_l{layer}{suf}"]  # [4H, C]
            w_hh = sd[f"{prefix}.weight_hh_l{layer}{suf}"]  # [4H, H]
            b = (sd[f"{prefix}.bias_ih_l{layer}{suf}"]
                 + sd[f"{prefix}.bias_hh_l{layer}{suf}"])
            H = w_hh.shape[1]
            cell: dict = {}
            for gi, g in enumerate("ifgo"):
                sl = slice(gi * H, (gi + 1) * H)
                cell[f"i{g}"] = {"kernel": w_ih[sl].T}
                cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
            out[f"l{layer}_d{d}"] = cell
    return out


def _port_ds_tower(sd: dict, num_lstm_layers: int,
                   backbone: str) -> tuple[dict, dict]:
    """Shared DSGenerator/DSDiscriminator topology (`models/dsgan.py`):
    ResnetBackbone lstm head (`common/image.py:27-117`) + CNN_LSTM."""
    fpn_p, fpn_s = port_fpn_encoder(sd, "encoder.extractor", backbone)
    params = {
        "encoder": {
            "ResNetFPNEncoder_0": fpn_p,
            "Dense_0": _dense(sd, "encoder.extractor.fc_h0"),
        },
        "cnnlstm": {
            "Conv_0": port_conv1d(sd, "cnnlstm.conv.0"),
            "BiLSTM_0": port_lstm_cells(sd, "cnnlstm.lstm", num_lstm_layers),
        },
    }
    return params, {"encoder": {"ResNetFPNEncoder_0": fpn_s}}


def port_ds_generator(sd: dict, num_lstm_layers: int = 4,
                      backbone: str = "resnet50") -> tuple[dict, dict]:
    """Reference DSGenerator (`models/dsgan.py:70-135`) -> DSGeneratorCore."""
    params, stats = _port_ds_tower(sd, num_lstm_layers, backbone)
    params["fc_cls"] = _dense(sd, "fc1")
    params["fc_box"] = _dense(sd, "fc2")
    return params, stats


def port_ds_discriminator(sd: dict, num_lstm_layers: int = 2,
                          backbone: str = "resnet18") -> tuple[dict, dict]:
    """Reference DSDiscriminator (`models/dsgan.py:201-247`)."""
    params, stats = _port_ds_tower(sd, num_lstm_layers, backbone)
    params["fc_tf"] = _dense(sd, "fc_tf")
    return params, stats


def port_ga_decoder(sd: dict, prefix: str, num_layers: int,
                    d_model: int) -> dict:
    """Reference GeometryAlignedTransformerDecoder (`icvt.py:443-599`,
    ga_type=concat) -> models.icvt.GADecoder.  The torch cross-attention
    runs at width 2d and truncates out_proj's output to the first d
    channels (`icvt.py:554-556`); the flax twin's `cross_out` IS that
    truncated out_proj, so only its first-d rows are ported."""
    out: dict = {}
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        # the concat path never applies cross_attn.out_proj (its role is
        # taken by the truncated `cross_out`), so the flax tree has no such
        # leaf — drop it from the generic MHA port
        cross = port_mha(sd, f"{p}.multihead_attn")
        cross.pop("out_proj", None)
        out[f"layer_{i}"] = {
            "self_attn": port_mha(sd, f"{p}.self_attn"),
            "cross_attn": cross,
            "cross_out": {
                "kernel": sd[f"{p}.multihead_attn.out_proj.weight"][:d_model].T,
                "bias": sd[f"{p}.multihead_attn.out_proj.bias"][:d_model],
            },
            "ffn": {
                "Dense_0": _dense(sd, f"{p}.linear1"),
                "Dense_1": _dense(sd, f"{p}.linear2"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
        }
    return out


def port_icvt(sd: dict, d_model: int = 200, num_layers: int = 6,
              backbone: str = "resnet50") -> tuple[dict, dict]:
    """Reference ICVTGenerator (`models/icvt.py:122-236`) -> ICVTCore."""
    from ralf_tpu.core.layout import GEO_KEYS

    enc_p, enc_s = port_image_encoder(sd, "encoder.", backbone, num_layers)

    def dict_embed(prefix: str, with_label: bool) -> dict:
        keys = (("label",) if with_label else ()) + tuple(GEO_KEYS)
        return {
            f"embed_{k}": {"embedding": sd[f"{prefix}.embed_{k}.weight"]}
            for k in keys
        }

    params = {
        "encoder": enc_p,
        "layout_encoder": dict_embed("layout_encoder", True),
        "ga_layout_encoder": dict_embed("ga_layout_encoder", False),
        "layout_decoder": {
            "fc_label": _dense(sd, "layout_decoder.fc_label"),
            **{f"fc_{k}": _dense(sd, f"layout_decoder.fc_{k}")
               for k in GEO_KEYS},
        },
        "vae_encoder": port_ga_decoder(sd, "vae_encoder", num_layers, d_model),
        "vae_decoder": port_ga_decoder(sd, "vae_decoder", num_layers, d_model),
        "aap": port_mha(sd, "aap"),
        "learnable_token": sd["_learnable_token.weight"][None],  # [1, 1, d]
        "fc_mu": _dense(sd, "vae_head.fc_mu"),
        "fc_var": _dense(sd, "vae_head.fc_var"),
    }
    return params, {"encoder": enc_s}


def load_pretrained_trunk_if_available(
    path: str, backbone: str = "resnet50", in_channels: int = 4
) -> Optional[tuple[dict, dict]]:
    """Load a torch ResNet checkpoint file (e.g. the reference cache's
    `resnet50_a1_0-14fe96d1.pth`) when present on disk; None otherwise —
    zero-egress environments cannot download weights."""
    import os

    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return port_resnet_trunk(sd, backbone, in_channels)


# --------------------------------------------------------------------------
# Image towers: VGG16 / InceptionV3 / ViT-B/16 / DreamSim (models/towers.py)
# --------------------------------------------------------------------------

# timm vgg16 `features.{i}` conv indices -> models.towers.VGG16Features
# `features_{j}` plan indices (ReLU/MaxPool entries hold no parameters)
_VGG16_IDX = ((0, 0), (2, 1), (5, 3), (7, 4), (10, 6), (12, 7), (14, 8),
              (17, 10), (19, 11), (21, 12), (24, 14), (26, 15), (28, 16))


def port_vgg16(sd: dict) -> dict:
    """timm `vgg16` state_dict -> models.towers.VGG16Features params.
    (`train/helpers/metric.py:607-643` _TimmVGGWrapper's tower.)"""
    params = {
        f"features_{j}": {
            "kernel": sd[f"features.{i}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"features.{i}.bias"],
        }
        for i, j in _VGG16_IDX
    }
    for fc in ("fc1", "fc2"):
        params[f"pre_logits_{fc}"] = {
            "kernel": sd[f"pre_logits.{fc}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"pre_logits.{fc}.bias"],
        }
    return params


def port_alexnet(sd: dict) -> dict:
    """torchvision `alexnet` (or the lpips package's wrapped copy) ->
    models.towers.AlexNetFeatures params.  Accepts either bare
    `features.{i}.*` keys or the lpips LPIPS-state_dict prefix
    `net.slice{k}.{i}.*` (`lpips/pretrained_networks.py alexnet`: slice1
    holds features 0-1, slice2 2-4, slice3 5-7, slice4 8-9, slice5 10-11)."""
    if not any(k.startswith("features.") for k in sd):
        # lpips saves the tower re-sliced; rebuild the flat index space
        slice_base = {"net.slice1.": 0, "net.slice2.": 2, "net.slice3.": 5,
                      "net.slice4.": 8, "net.slice5.": 10}
        flat = {}
        for k, v in sd.items():
            for pref, base in slice_base.items():
                if k.startswith(pref):
                    rest = k[len(pref):]
                    i, leaf = rest.split(".", 1)
                    flat[f"features.{base + int(i)}.{leaf}"] = v
        sd = flat
    return {
        f"features_{i}": {
            "kernel": sd[f"features.{i}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"features.{i}.bias"],
        }
        for i in (0, 3, 6, 8, 10)
    }


def port_lpips_lins(sd: dict, num_taps: int = 5) -> list:
    """The lpips package's learned per-channel linear heads -> a list of
    [C] weight vectors for `retrieval.lpips.lpips_from_taps`'s
    `channel_weights` hook.

    NetLinLayer is Dropout + Conv2d(C, 1, 1, bias=False)
    (`lpips/lpips.py NetLinLayer`), so each head is exactly a per-channel
    weight [1, C, 1, 1].  Accepts both historical key spellings
    (`lin{k}.model.1.weight` and `lins.{k}.model.1.weight`)."""
    out = []
    for k in range(num_taps):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                w = np.asarray(sd[key])
                assert w.ndim == 4 and w.shape[0] == 1, w.shape
                out.append(w.reshape(-1))
                break
        else:
            raise KeyError(f"lpips lins head {k} not found in state_dict")
    return out


def _basic_conv(sd: dict, prefix: str) -> tuple[dict, dict]:
    """timm BasicConv2d (conv + BN eps=1e-3) -> towers.BasicConv."""
    params = {
        "conv": {"kernel": sd[f"{prefix}.conv.weight"].transpose(2, 3, 1, 0)},
        "bn": {"scale": sd[f"{prefix}.bn.weight"], "bias": sd[f"{prefix}.bn.bias"]},
    }
    stats = {"bn": {"mean": sd[f"{prefix}.bn.running_mean"],
                    "var": sd[f"{prefix}.bn.running_var"]}}
    return params, stats


def port_inception_v3(sd: dict) -> tuple[dict, dict]:
    """timm `inception_v3` state_dict -> (params, batch_stats) for
    models.towers.InceptionV3Features (`metric.py:644-700`'s image-FID
    tower).  Names mirror torch, so this walks the BasicConv2d leaves."""
    convs = sorted({k.rsplit(".conv.weight", 1)[0]
                    for k in sd if k.endswith(".conv.weight")})
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        for p in path[:-1]:
            tree = tree.setdefault(p, {})
        tree[path[-1]] = leaf

    for name in convs:
        if name.startswith("AuxLogits"):  # deleted in eval towers
            continue
        p, s = _basic_conv(sd, name)
        put(params, name.split("."), p)
        put(stats, name.split("."), s)
    return params, stats


def port_vit_b16(sd: dict, prefix: str = "", depth: Optional[int] = None) -> dict:
    """timm vision_transformer (ViT-B/16) state_dict -> models.towers.ViTB16
    params.  `prefix` selects a tower inside a larger checkpoint (e.g. one
    DreamSim ensemble member); LoRA deltas must already be merged.  `depth`
    defaults to the block count present in the state_dict."""
    g = lambda k: sd[f"{prefix}{k}"]
    if depth is None:
        depth = 1 + max(
            int(k[len(prefix) + 7:].split(".", 1)[0])
            for k in sd
            if k.startswith(f"{prefix}blocks.")
        )
    params: dict = {
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "patch_embed": {"kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0)},
        "norm": _layernorm(sd, f"{prefix}norm"),
    }
    if f"{prefix}patch_embed.proj.bias" in sd:
        params["patch_embed"]["bias"] = g("patch_embed.proj.bias")
    if f"{prefix}norm_pre.weight" in sd:
        params["norm_pre"] = _layernorm(sd, f"{prefix}norm_pre")
    for i in range(depth):
        b = f"{prefix}blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "qkv": _dense(sd, f"{b}.attn.qkv"),
            "proj": _dense(sd, f"{b}.attn.proj"),
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    return params


def port_dreamsim(sd: dict, tower_prefixes: Optional[dict] = None) -> dict:
    """DreamSim ensemble checkpoint (three LoRA-merged ViT-B/16 extractors,
    `train/models/retrieval/image.py:72-93`) ->
    models.towers.DreamSimEnsemble params.

    `tower_prefixes` maps our tower names (dino/clip/open_clip) to the
    checkpoint's per-tower key prefixes; the default matches a state_dict
    saved as `{dino|clip|open_clip}.<timm vit keys>`.
    """
    tower_prefixes = tower_prefixes or {
        "dino": "dino.", "clip": "clip.", "open_clip": "open_clip."
    }
    return {
        name: port_vit_b16(sd, prefix)
        for name, prefix in tower_prefixes.items()
    }


def load_tower_if_available(path: str, kind: str):
    """Port a torch state_dict checkpoint at `path` into the matching
    models.towers module params; None when the file is absent (zero-egress
    environments cannot download pretrained towers).

    kind: 'vgg16' -> params; 'inception_v3' -> (params, batch_stats);
    'clip' / 'dino' -> ViTB16 params; 'dreamsim' -> ensemble params.
    """
    import os

    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if kind == "vgg16":
        return port_vgg16(sd)
    if kind == "inception_v3":
        return port_inception_v3(sd)
    if kind in ("clip", "dino"):
        return port_vit_b16(sd)
    if kind == "dreamsim":
        return port_dreamsim(sd)
    if kind == "alexnet":
        return port_alexnet(sd)
    if kind == "lpips_alex":
        # a full `lpips.LPIPS(net="alex")` state_dict: tower + learned lins
        return port_alexnet(sd), port_lpips_lins(sd)
    raise ValueError(kind)
