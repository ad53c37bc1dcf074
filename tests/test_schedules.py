"""Schedule trajectory tests against the reference CustomLRScheduler math
(src/utils/optimizers.py:34-61)."""
import numpy as np

from gaot_tpu.core.config import OptimizerArgsConfig, OptimizerConfig
from gaot_tpu.train.schedules import make_optimizer, make_schedule


def _reference_mix_lr(epoch, total, initial_lr, max_lr, min_lr, final_lr,
                      cosine_frac):
    warmup = int(0.02 * total)
    cosine = int(cosine_frac * total)
    exp_decay = total - warmup - cosine
    if warmup == 0:
        warmup, cosine = 1, cosine - 1
    if exp_decay == 0:
        exp_decay, cosine = 1, cosine - 1
    if epoch < warmup:
        return initial_lr + (max_lr - initial_lr) * (epoch / max(1, warmup - 1))
    if epoch < warmup + cosine:
        e = epoch - warmup
        ratio = (1 + np.cos(np.pi * e / cosine)) / 2
        return min_lr + (max_lr - min_lr) * ratio
    e = epoch - warmup - cosine
    return min_lr * (final_lr / min_lr) ** (e / max(1, exp_decay - 1))


def test_mix_schedule_matches_reference_trajectory():
    cfg = OptimizerConfig(name="adamw", args=OptimizerArgsConfig(
        lr=8e-4, epoch=1000, max_lr=1e-3, min_lr=1e-4, final_lr=5e-5))
    steps_per_epoch = 32
    sched = make_schedule(cfg, steps_per_epoch)
    for epoch in [0, 5, 19, 20, 100, 500, 919, 920, 950, 999]:
        got = float(sched(epoch * steps_per_epoch))
        want = _reference_mix_lr(epoch, 1000, 8e-4, 1e-3, 1e-4, 5e-5, 0.90)
        np.testing.assert_allclose(got, want, rtol=1e-6), epoch
        # constant within an epoch
        got2 = float(sched(epoch * steps_per_epoch + steps_per_epoch - 1))
        np.testing.assert_allclose(got2, got, rtol=1e-6)


def test_mix_adam_uses_096_cosine():
    cfg = OptimizerConfig(name="adam", args=OptimizerArgsConfig(
        lr=1e-3, epoch=100, max_lr=1e-2, min_lr=1e-5, final_lr=1e-5))
    sched = make_schedule(cfg, 1)
    want = _reference_mix_lr(50, 100, 1e-3, 1e-2, 1e-5, 1e-5, 0.96)
    np.testing.assert_allclose(float(sched(50)), want, rtol=1e-6)


def test_step_cos_exp_schedules():
    args = dict(lr=1e-3, epoch=100, scheduler_step_size=10, scheduler_gamma=0.5,
                scheduler_T_max=100, scheduler_eta_min=1e-5)
    step = make_schedule(OptimizerConfig(args=OptimizerArgsConfig(
        scheduler="step", **args)), 1)
    np.testing.assert_allclose(float(step(25)), 1e-3 * 0.5 ** 2, rtol=1e-6)
    exp = make_schedule(OptimizerConfig(args=OptimizerArgsConfig(
        scheduler="exp", **args)), 1)
    np.testing.assert_allclose(float(exp(3)), 1e-3 * 0.5 ** 3, rtol=1e-6)
    cos = make_schedule(OptimizerConfig(args=OptimizerArgsConfig(
        scheduler="cos", **args)), 1)
    np.testing.assert_allclose(float(cos(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(cos(100)), 1e-5, rtol=1e-4)


def test_make_optimizer_runs():
    import jax.numpy as jnp

    cfg = OptimizerConfig(name="adamw", args=OptimizerArgsConfig(epoch=10))
    tx, sched = make_optimizer(cfg, steps_per_epoch=4)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
