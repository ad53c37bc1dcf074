"""Optimizers and learning-rate schedules (optax).

Mirrors the reference optimizer zoo (src/utils/optimizers.py): Adam/AdamW and
the 'step' / 'cos' / 'exp' / 'mix' schedules. The reference steps its
schedulers once per epoch (optimizers.py:141-142, 262-263); here schedules
are per-optimizer-step functions of ``step // steps_per_epoch`` so the same
epoch-resolution trajectory falls out of a purely step-driven optax chain.

The 'mix' schedule is the reference CustomLRScheduler (optimizers.py:34-61):
linear warmup initial_lr→max_lr, cosine max_lr→min_lr, exponential
min_lr→final_lr. The warmup/cosine fractions differ between Adam (0.02/0.96)
and AdamW (0.02/0.90) in the reference — both are reproduced.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import optax

from ..core.config import OptimizerConfig


def mix_schedule(total_epochs: int, steps_per_epoch: int, initial_lr: float,
                 max_lr: float, min_lr: float, final_lr: float,
                 cosine_frac: float) -> Callable:
    warmup = int(0.02 * total_epochs)
    cosine = int(cosine_frac * total_epochs)
    exp_decay = total_epochs - warmup - cosine
    if warmup == 0:
        warmup, cosine = 1, cosine - 1
    if exp_decay == 0:
        exp_decay, cosine = 1, cosine - 1

    def schedule(step):
        epoch = step // steps_per_epoch
        # Phase 1: linear warmup over `warmup` epochs.
        warm = initial_lr + (max_lr - initial_lr) * (
            epoch / max(1, warmup - 1))
        # Phase 2: cosine from max_lr to min_lr over `cosine` epochs.
        ce = epoch - warmup
        cos_ratio = (1 + jnp.cos(jnp.pi * ce / cosine)) / 2
        cos_lr = min_lr + (max_lr - min_lr) * cos_ratio
        # Phase 3: exponential decay min_lr → final_lr.
        ee = epoch - warmup - cosine
        decay_steps = max(1, exp_decay - 1)
        exp_lr = min_lr * (final_lr / min_lr) ** (ee / decay_steps)
        return jnp.where(epoch < warmup, warm,
                         jnp.where(epoch < warmup + cosine, cos_lr, exp_lr))

    return schedule


def make_schedule(config: OptimizerConfig, steps_per_epoch: int) -> Callable:
    args = config.args
    name = args.scheduler

    if name == "mix":
        cosine_frac = 0.90 if config.name == "adamw" else 0.96
        return mix_schedule(args.epoch, steps_per_epoch, args.lr, args.max_lr,
                            args.min_lr, args.final_lr, cosine_frac)
    if name == "step":
        def step_sched(step):
            epoch = step // steps_per_epoch
            return args.lr * args.scheduler_gamma ** (epoch // args.scheduler_step_size)
        return step_sched
    if name == "cos":
        def cos_sched(step):
            epoch = jnp.minimum(step // steps_per_epoch, args.scheduler_T_max)
            ratio = (1 + jnp.cos(jnp.pi * epoch / args.scheduler_T_max)) / 2
            return args.scheduler_eta_min + (args.lr - args.scheduler_eta_min) * ratio
        return cos_sched
    if name == "exp":
        def exp_sched(step):
            epoch = step // steps_per_epoch
            return args.lr * args.scheduler_gamma ** epoch
        return exp_sched
    return lambda step: args.lr  # constant


def make_optimizer(config: OptimizerConfig,
                   steps_per_epoch: int) -> Tuple[optax.GradientTransformation, Callable]:
    """Build the optax chain + its schedule fn."""
    schedule = make_schedule(config, steps_per_epoch)
    if config.name == "adamw":
        tx = optax.adamw(learning_rate=schedule,
                         weight_decay=config.args.weight_decay)
    elif config.name == "adam":
        tx = optax.adam(learning_rate=schedule)
    else:
        raise ValueError(f"Unsupported optimizer: {config.name}")
    if config.args.loss_scale != 1.0:
        # bf16-compute / fp32-param training needs no loss scaling, and the
        # reference ignores the knob too (optimizers.py: loss_scale unused);
        # applying only a grad-side scale would distort AdamW's eps/weight-
        # decay balance rather than protect against overflow.
        import warnings

        warnings.warn("optimizer.args.loss_scale is accepted for config "
                      "compatibility but ignored (matches the reference)")
    return tx, schedule
