"""Adversarial training loop: generator + discriminator alternation.

Parity with the reference train loop's GAN branch (`train.py:409-489`):
per batch, a generator step (matched reconstruction + adv_weight * hinge)
followed by a discriminator step on detached fakes + reals; the
discriminator gets 10x the LR (`cgl.py:186`, `train.py:236-243`) and both
get the per-epoch `update_per_epoch` ramp called before each epoch.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ralf_tpu.parallel.mesh import replicate, shard_batch
from ralf_tpu.train.optim import build_optimizer
from ralf_tpu.train.trainer import TrainConfig, Trainer, TrainState

logger = logging.getLogger(__name__)


class GANTrainer(Trainer):
    def __init__(self, generator, cfg: TrainConfig, mesh=None,
                 warmup_dis_epoch: int = 10) -> None:
        super().__init__(generator, cfg, mesh)
        self.warmup_dis_epoch = warmup_dis_epoch
        self.tx_dis: Optional[optax.GradientTransformation] = None
        self._dis_step = None
        # the reference builds a SECOND scheduler instance for the
        # discriminator with network="discriminator" (`train.py:236-248`,
        # `schedulers/dsgan.py:21-25`: 25-epoch stair vs the generator's 50)
        from ralf_tpu.train.schedulers import build_scheduler

        self.scheduler_dis = build_scheduler(
            cfg.scheduler, cfg.epochs,
            **{**cfg.scheduler_kwargs, "network": "discriminator"},
        )

    def init_states(self, key: jax.Array) -> tuple[TrainState, TrainState]:
        kg, kd = jax.random.split(key)
        gen_state = self.init_state(kg)
        disc_vars = self.gen.init_disc(kd)
        d_params = disc_vars["params"]
        self.tx_dis = build_optimizer(
            d_params,
            base_lr=self.cfg.lr * getattr(self.gen, "LR_MULT_DIS", 10.0),
            weight_decay=self.cfg.weight_decay,
            clip_max_norm=self.cfg.clip_max_norm,
        )
        dis_state = TrainState(
            params=d_params,
            batch_stats=disc_vars.get("batch_stats", {}),
            opt_state=self.tx_dis.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )
        return gen_state, replicate(self.mesh, dis_state)

    def _build_gan_steps(self):
        gen, tx, tx_dis = self.gen, self.tx, self.tx_dis

        def gen_step(state: TrainState, dis_state: TrainState, inputs, targets, key):
            def loss_fn(params):
                loss, aux = gen.loss(
                    {"params": params, "batch_stats": state.batch_stats},
                    inputs, targets, train=True, rngs={"dropout": key},
                    disc_variables={
                        "params": dis_state.params,
                        "batch_stats": dis_state.batch_stats,
                    },
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params,
                batch_stats=aux["state"].get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, {"loss": loss}

        def dis_step(dis_state: TrainState, state: TrainState, inputs, targets, key):
            def loss_fn(d_params):
                loss, aux = gen.disc_loss(
                    {"params": d_params, "batch_stats": dis_state.batch_stats},
                    {"params": state.params, "batch_stats": state.batch_stats},
                    inputs, targets, rngs={"dropout": key},
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                dis_state.params
            )
            updates, opt_state = tx_dis.update(grads, dis_state.opt_state,
                                               dis_state.params)
            params = optax.apply_updates(dis_state.params, updates)
            new_state = TrainState(
                params=params,
                batch_stats=aux["state"].get("batch_stats", dis_state.batch_stats),
                opt_state=opt_state,
                step=dis_state.step + 1,
            )
            return new_state, {"loss_d": loss}

        self._train_step = jax.jit(gen_step, donate_argnums=(0,))
        self._dis_step = jax.jit(dis_step, donate_argnums=(0,))

    def fit_gan(self, train_loader, state=None, dis_state=None,
                num_steps_cap: Optional[int] = None):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        if state is None:
            key, sub = jax.random.split(key)
            state, dis_state = self.init_states(sub)
        self._build_gan_steps()
        rng = np.random.default_rng(cfg.seed)
        from ralf_tpu.train.optim import set_learning_rate

        lr_dis = cfg.lr * getattr(self.gen, "LR_MULT_DIS", 10.0)
        # torch schedulers apply one step at construction: with DS-GAN's
        # milestone-0 stair both nets start BELOW base LR (scale(0)=gamma)
        if (gs := self.scheduler.scale(0)) != 1.0:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, cfg.lr * gs))
        if (ds := self.scheduler_dis.scale(0)) != 1.0:
            dis_state = dis_state.replace(
                opt_state=set_learning_rate(dis_state.opt_state, lr_dis * ds))

        for epoch in range(1, cfg.epochs + 1):
            self.gen.update_per_epoch(epoch, self.warmup_dis_epoch, cfg.epochs)
            t0 = time.time()
            g_losses, d_losses = [], []
            for i, batch in enumerate(train_loader):
                if num_steps_cap and i >= num_steps_cap:
                    break
                inputs, targets = self.gen.preprocess(batch, rng)
                inputs, targets = self._device_batch(inputs, targets)
                key, k1, k2 = jax.random.split(key, 3)
                state, gm = self._train_step(state, dis_state, inputs, targets, k1)
                dis_state, dm = self._dis_step(dis_state, state, inputs, targets, k2)
                g_losses.append(gm["loss"])
                d_losses.append(dm["loss_d"])
            # per-epoch LR schedule for BOTH nets (`train.py:284-295`);
            # scale(epoch) applies to epoch+1, matching torch's
            # step-at-end-of-epoch semantics under 1-indexed epochs
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state, cfg.lr * self.scheduler.scale(epoch)))
            dis_state = dis_state.replace(opt_state=set_learning_rate(
                dis_state.opt_state,
                lr_dis * self.scheduler_dis.scale(epoch)))
            g_loss = float(jnp.mean(jnp.stack(g_losses)))
            d_loss = float(jnp.mean(jnp.stack(d_losses)))
            logger.info(
                "epoch %d: g_loss %.4f d_loss %.4f (%.1fs)",
                epoch, g_loss, d_loss, time.time() - t0,
            )
            with open(self._metrics_path, "a") as f:
                f.write(json.dumps({
                    "epoch": epoch, "g_loss": g_loss, "d_loss": d_loss,
                    "sec": round(time.time() - t0, 2),
                }) + "\n")
            if cfg.save_every_epochs and epoch % cfg.save_every_epochs == 0:
                self.save(state, tag=f"epoch{epoch}")
        # generator under the standard tag (inference restores "final");
        # discriminator alongside for adversarial fine-tuning resume
        self.save(state, tag="final")
        self.save(dis_state, tag="final_dis")
        return state, dis_state
