"""LR / momentum / BN-momentum schedules.

Re-implements the reference's fastai OneCycle
(``/root/reference/tools/train_utils/learning_schedules_fastai.py:49-73``:
cosine anneal lr/div -> lr over PCT_START, then lr -> lr/div/1e4; beta1
0.95 -> 0.85 -> 0.95, stepped per iteration), the step-decay + cosine-warmup
path (``train_utils.py:46-55,176-196``), and the BN momentum decay
(``train_utils.py:22-43``) — as pure step -> value functions usable both as
optax schedules and as traced scalars.
"""

from __future__ import annotations

import math
from bisect import bisect_right

import jax.numpy as jnp

from ..config import Config


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(math.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr(total_steps: int, lr_max: float, div_factor: float, pct_start: float):
    low = lr_max / div_factor
    split = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(low, lr_max, step / max(split, 1))
        down = annealing_cos(lr_max, low / 1e4,
                             (step - split) / max(total_steps - split, 1))
        return jnp.where(step < split, up, down)

    return sched


def one_cycle_mom(total_steps: int, moms, pct_start: float):
    split = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(moms[0], moms[1], step / max(split, 1))
        down = annealing_cos(moms[1], moms[0],
                             (step - split) / max(total_steps - split, 1))
        return jnp.where(step < split, up, down)

    return sched


def decay_lr_by_epoch(cfg: Config, epoch: float) -> float:
    """Step decay with optional cosine warmup (train_utils.py:176-196),
    python-side (used when OPTIMIZER != adam_onecycle)."""
    t = cfg.TRAIN
    if t.LR_WARMUP and epoch < t.WARMUP_EPOCH:
        # CosineWarmupLR (train_utils.py:46-55): anneal WARMUP_MIN -> LR
        pct = epoch / max(t.WARMUP_EPOCH, 1e-9)
        return t.LR + (t.WARMUP_MIN - t.LR) * (math.cos(math.pi * pct) + 1) / 2
    n = bisect_right(list(t.DECAY_STEP_LIST), epoch)
    return max(t.LR * (t.LR_DECAY ** n), t.LR_CLIP)


def bn_momentum_at(cfg: Config, epoch: float) -> float:
    """BNMomentumScheduler (train_utils.py:22-43): torch-convention momentum
    decayed at milestones, floored at BNM_CLIP."""
    t = cfg.TRAIN
    n = bisect_right(list(t.BN_DECAY_STEP_LIST), epoch)
    return max(t.BN_MOMENTUM * (t.BN_DECAY ** n), t.BNM_CLIP)
