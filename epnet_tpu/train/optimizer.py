"""Optimizers (optax) matching the reference's training recipes.

``adam_onecycle`` (the published EPNet recipe, ``tools/train_rcnn.py:
101-123`` + ``fastai_optim.py:132-149``): Adam betas=(b1_sched, 0.99) with
*true* (decoupled, multiplicative) weight decay applied to every parameter
(bn_wd=True) and per-iteration OneCycle lr/beta1 schedules. That is exactly
AdamW with scheduled lr and b1, so it is expressed here as
``optax.inject_hyperparams(adamw)``.

``adam`` / ``sgd``: plain optimizers with torch-style coupled weight decay
(L2 added to the gradient) and the epoch-step decay schedule of
``train_rcnn.py:127-134`` (plus optional cosine warmup,
``train_utils.py:46-55``) evaluated per step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax

from ..config import Config
from .schedules import one_cycle_lr, one_cycle_mom


def epoch_decay_lr(cfg: Config, steps_per_epoch: int):
    t = cfg.TRAIN
    milestones = jnp.asarray(t.DECAY_STEP_LIST, jnp.float32)

    def sched(step):
        epoch = jnp.asarray(step, jnp.float32) / max(steps_per_epoch, 1)
        n = jnp.sum(epoch >= milestones)
        lr = jnp.maximum(t.LR * (t.LR_DECAY ** n), t.LR_CLIP)
        if t.LR_WARMUP:
            pct = epoch / max(t.WARMUP_EPOCH, 1e-9)
            warm = t.LR + (t.WARMUP_MIN - t.LR) * (jnp.cos(math.pi * pct) + 1) / 2
            lr = jnp.where(epoch < t.WARMUP_EPOCH, warm, lr)
        return lr

    return sched


def make_optimizer(cfg: Config, total_steps: int,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    t = cfg.TRAIN
    clip = optax.clip_by_global_norm(t.GRAD_NORM_CLIP)

    if t.OPTIMIZER == 'adam_onecycle':
        lr = one_cycle_lr(total_steps, t.LR, t.DIV_FACTOR, t.PCT_START)
        b1 = one_cycle_mom(total_steps, t.MOMS, t.PCT_START)

        def adamw(learning_rate, b1):
            return optax.adamw(learning_rate, b1=b1, b2=0.99,
                               weight_decay=t.WEIGHT_DECAY)

        return optax.chain(clip, optax.inject_hyperparams(adamw)(learning_rate=lr, b1=b1))

    lr = epoch_decay_lr(cfg, steps_per_epoch)
    if t.OPTIMIZER == 'adam':
        wd = optax.add_decayed_weights(t.WEIGHT_DECAY) if t.WEIGHT_DECAY else optax.identity()
        return optax.chain(clip, wd, optax.scale_by_adam(), optax.scale_by_learning_rate(lr))
    if t.OPTIMIZER == 'sgd':
        wd = optax.add_decayed_weights(t.WEIGHT_DECAY) if t.WEIGHT_DECAY else optax.identity()
        return optax.chain(clip, wd, optax.trace(decay=t.MOMENTUM),
                           optax.scale_by_learning_rate(lr))
    raise NotImplementedError(t.OPTIMIZER)
