"""Optimizer construction with reference-parity parameter grouping.

Mirrors `BaseModel.optim_groups`
(`image2layout/train/models/common/base_model.py:207-347`) + the train
loop's custom-LR hook (`train.py:217-223`):

  * weight decay only on matmul/conv kernels;
  * no decay on biases, norm scales, embeddings, learned tokens;
  * the pretrained ResNet trunk trains at 0.1x the base LR.

Built as optax.multi_transform over {trunk, rest} with
inject_hyperparams'd AdamW, so the host scheduler can rewrite the
learning rate between epochs without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

TRUNK_KEY = "trunk"  # substring of the image-backbone param path
FROZEN_KEY = "layout_encoder"  # frozen FIDNet tower in RALF (+RA variants)
NO_DECAY_LEAVES = ("bias", "scale", "embedding", "cls_token", "pos_token", "flag_emb")


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def decay_mask(params) -> Any:
    """True where weight decay applies (kernels only)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: _path_str(p).endswith("kernel"), params
    )


def lr_group_labels(params) -> Any:
    """'frozen' for the FIDNet tower (no updates at all — stop_gradient
    alone would still leak AdamW weight decay into it), 'trunk' for the
    image backbone body (0.1x LR), 'rest' elsewhere."""

    def label(p, _):
        s = f"/{_path_str(p)}/"
        if f"/{FROZEN_KEY}/" in s:
            return "frozen"
        return "trunk" if f"/{TRUNK_KEY}/" in s else "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.01,
    clip_max_norm: float = 1.0,  # `config/__init__.py:31`
    trunk_lr_scale: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    def adamw(lr: float):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            mask=decay_mask,
        )

    tx = optax.multi_transform(
        {
            "trunk": adamw(base_lr * trunk_lr_scale),
            "rest": adamw(base_lr),
            "frozen": optax.set_to_zero(),
        },
        lr_group_labels(params),
    )
    if clip_max_norm and clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx


def set_learning_rate(opt_state, base_lr: float, trunk_lr_scale: float = 0.1):
    """Rewrite the injected LRs in-place in the optimizer state pytree."""

    def visit(state):
        if hasattr(state, "inner_states"):  # multi_transform
            new_inner = {}
            for label, s in state.inner_states.items():
                lr = base_lr * (trunk_lr_scale if label == "trunk" else 1.0)
                inner = s.inner_state
                if hasattr(inner, "hyperparams"):
                    hp = dict(inner.hyperparams)
                    hp["learning_rate"] = jax.numpy.asarray(
                        lr, hp["learning_rate"].dtype
                    )
                    inner = inner._replace(hyperparams=hp)
                new_inner[label] = s._replace(inner_state=inner)
            return state._replace(inner_states=new_inner)
        return state

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(visit(s) for s in opt_state)
    return visit(opt_state)
