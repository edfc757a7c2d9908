"""Train state: student + EMA teacher params/batch-stats + optax state.

The optimizer mirrors train.py:364-374: AdamW(wd 5e-4) with two LR groups —
params whose top-level module name contains 'decoder' get the decoder LR
(1e-4), everything else the base LR (2e-3); a single global-norm grad clip
(0.1) spans both groups like torch clip_grad_norm_ over all parameters
(train.py:565-566); optional optax.MultiSteps emulates --step_freq gradient
accumulation (train.py:493-494,562).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .schedule import warmup_cosine


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def ema_update(self, decay: float):
        """update_ema_variables (train.py:435-439): alpha ramps with step."""
        alpha = jnp.minimum(1.0 - 1.0 / (self.step.astype(jnp.float32) + 1.0),
                            decay)
        ema = jax.tree_util.tree_map(
            lambda e, p: alpha * e + (1.0 - alpha) * p, self.ema_params,
            self.params)
        return self.replace(ema_params=ema)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-3
    decoder_learning_rate: float = 1e-4
    weight_decay: float = 5e-4
    clip_norm: float = 0.1
    total_steps: int = 100000
    warmup_steps: int = 0
    warmup_multiplier: float = 100.0
    step_freq: int = 1


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    base_sched = warmup_cosine(cfg.learning_rate, cfg.total_steps,
                               cfg.warmup_steps, cfg.warmup_multiplier)
    dec_sched = warmup_cosine(cfg.decoder_learning_rate, cfg.total_steps,
                              cfg.warmup_steps, cfg.warmup_multiplier)

    def label_fn(params):
        return {k: ("decoder" if "decoder" in k else "base") for k in params}

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.multi_transform(
            {"base": optax.adamw(base_sched, weight_decay=cfg.weight_decay),
             "decoder": optax.adamw(dec_sched, weight_decay=cfg.weight_decay)},
            label_fn),
    )
    if cfg.step_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.step_freq)
    return tx


def create_train_state(variables, opt_cfg: OptimizerConfig,
                       ema: bool = True) -> TrainState:
    tx = make_optimizer(opt_cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else params,
        ema_batch_stats=(jax.tree_util.tree_map(jnp.copy, batch_stats)
                         if ema else batch_stats),
        opt_state=tx.init(params),
        tx=tx,
    )
