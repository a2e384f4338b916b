"""FIDNetV3 trainer — builds the per-dataset layout feature extractor that
layout-FID and RALF's retrieval fusion depend on.

Parity target: `image2layout/train/fid/train.py:117-165` +
`fid/data.py:7-20`: half the batch gets N(0, 0.05) geometry noise
("fake"); loss = BCE(real/fake head) + CE(labels over valid elements)
+ 10 * MSE(bbox over valid elements, summed over coords).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ralf_tpu.core.layout import Layout
from ralf_tpu.models.fidnet import FIDNetV3

logger = logging.getLogger(__name__)


def generate_fake_and_real(layout: Layout, rng: np.random.Generator,
                           std: float = 0.05) -> tuple[Layout, np.ndarray]:
    """Perturb a random half of the batch; returns (layout, is_real)."""
    B, S = layout.label.shape
    is_fake = rng.integers(0, 2, size=B).astype(bool)
    mask = np.asarray(layout.mask)

    def noisy(v):
        v = np.asarray(v)
        out = v + rng.normal(0, std, v.shape)
        out = np.where(mask, out, 0.0)
        return np.where(is_fake[:, None], out, v).astype(np.float32)

    lay = Layout(
        label=layout.label,
        center_x=noisy(layout.center_x),
        center_y=noisy(layout.center_y),
        width=noisy(layout.width),
        height=noisy(layout.height),
        mask=layout.mask,
    )
    return lay, (~is_fake).astype(np.float32)


class FIDNetTrainer:
    def __init__(self, num_labels: int, max_seq_length: int = 10,
                 lr: float = 3e-4, weight_decay: float = 0.01,
                 job_dir: str = "tmp/fidnet") -> None:
        self.model = FIDNetV3(num_labels=num_labels, max_bbox=max_seq_length)
        self.num_labels = num_labels
        self.tx = optax.adamw(lr, weight_decay=weight_decay)
        self.job_dir = job_dir
        self._step = None

    def init(self, key: jax.Array, batch_size: int = 2, S: int = 10):
        from ralf_tpu.core.layout import random_layout

        lay = random_layout(np.random.default_rng(0), batch_size, S, self.num_labels)
        variables = self.model.init(key, lay)
        return variables["params"], self.tx.init(variables["params"])

    def loss_fn(self, params, layout: Layout, is_real: jax.Array):
        disc, cls_logits, bbox_pred = self.model.apply({"params": params}, layout)
        bce = optax.sigmoid_binary_cross_entropy(disc, is_real).mean()
        logp = jax.nn.log_softmax(cls_logits, -1)
        ce_tok = -jnp.take_along_axis(logp, layout.label[..., None], -1)[..., 0]
        m = layout.mask.astype(jnp.float32)
        ce = jnp.sum(ce_tok * m) / jnp.maximum(m.sum(), 1)
        bbox = jnp.stack([layout.center_x, layout.center_y, layout.width,
                          layout.height], -1)
        mse = jnp.sum(jnp.sum((bbox_pred - bbox) ** 2, -1) * m) / jnp.maximum(m.sum(), 1)
        total = bce + ce + 10.0 * mse
        return total, {"bce": bce, "label": ce, "bbox": mse}

    def _build_step(self):
        tx = self.tx

        def step(params, opt_state, layout, is_real):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, layout, is_real
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, aux

        self._step = jax.jit(step)

    def fit(self, train_loader, epochs: int = 10, seed: int = 0,
            num_steps_cap: Optional[int] = None):
        rng = np.random.default_rng(seed)
        params, opt_state = self.init(jax.random.PRNGKey(seed))
        self._build_step()
        for epoch in range(epochs):
            losses = []
            for i, batch in enumerate(train_loader):
                if num_steps_cap and i >= num_steps_cap:
                    break
                lay, is_real = generate_fake_and_real(batch["layout"], rng)
                params, opt_state, loss, aux = self._step(
                    params, opt_state, lay, jnp.asarray(is_real)
                )
                losses.append(float(loss))
            logger.info("fidnet epoch %d loss %.4f", epoch, np.mean(losses))
        self.save(params)
        return params

    def save(self, params) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.job_dir, "fidnet_ckpt"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(params), force=True)
        ckptr.wait_until_finished()

    def load(self, job_dir: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(job_dir or self.job_dir, "fidnet_ckpt"))
        params, _ = self.init(jax.random.PRNGKey(0))
        return ocp.StandardCheckpointer().restore(path, jax.device_get(params))
