"""Learning-rate schedules as pure step -> value functions (optax style).

Re-implements every LR policy the reference ships as a stateful
torch scheduler (reference scheduler.py): one-cycle (`CycleScheduler`,
used via --sched cycle, reference train_faceoff_perceptual.py:194-201),
cosine, power, sine, linear, cyclical (CLR), transformer warmup, and an LR
finder sweep. Stateless functions compose directly with `optax.scale_by_*`
via `optax.inject_hyperparams` and are checkpoint-free: the step count is
the only state.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _as_f32(step) -> jnp.ndarray:
    return jnp.asarray(step, jnp.float32)


def cosine_lr(lr_min: float, lr_max: float, step_size: int) -> Schedule:
    """Cosine between lr_max and lr_min with period restart
    (reference scheduler.py:6-24)."""

    def fn(step):
        it = jnp.mod(_as_f32(step), step_size)
        return lr_min + 0.5 * (lr_max - lr_min) * (
            1 + jnp.cos(it / step_size * math.pi)
        )

    return fn


def power_lr(lr_min: float, lr_max: float, warmup: int) -> Schedule:
    """Linear warmup then inverse-sqrt decay (reference scheduler.py:27-47)."""

    def fn(step):
        it = _as_f32(step)
        warm = lr_min + (lr_max - lr_min) / warmup * it
        decay = lr_max * (it - warmup + 1) ** -0.5
        return jnp.where(it < warmup, warm, decay)

    return fn


def sine_lr(lr_min: float, lr_max: float, step_size: int) -> Schedule:
    """(reference scheduler.py:50-68)"""

    def fn(step):
        it = jnp.mod(_as_f32(step), step_size)
        return lr_min + (lr_max - lr_min) * jnp.sin(it / step_size * math.pi)

    return fn


def linear_lr(
    lr_min: float, lr_max: float, warmup: int, step_size: int
) -> Schedule:
    """Flat warmup then linear decay, repeating (reference scheduler.py:71-94)."""

    def fn(step):
        it = jnp.mod(_as_f32(step), step_size)
        decayed = lr_max + (it - warmup) * (lr_min - lr_max) / (
            step_size - warmup
        )
        return jnp.where(it < warmup, lr_max, decayed)

    return fn


def clr(lr_min: float, lr_max: float, step_size: int) -> Schedule:
    """Triangular cyclical LR (reference scheduler.py:97-115)."""

    def fn(step):
        it = _as_f32(step)
        cycle = jnp.floor(1 + it / (2 * step_size))
        x = jnp.abs(it / step_size - 2 * cycle + 1)
        return lr_min + (lr_max - lr_min) * jnp.maximum(0.0, 1 - x)

    return fn


def transformer_warmup(
    model_dim: int, factor: float = 1.0, warmup: int = 16000
) -> Schedule:
    """Noam schedule (reference scheduler.py:118-136)."""

    def fn(step):
        it = jnp.maximum(_as_f32(step), 1.0)
        return (
            factor
            * model_dim ** -0.5
            * jnp.minimum(it ** -0.5, it * warmup ** -1.5)
        )

    return fn


def _anneal_linear(start, end, proportion):
    return start + proportion * (end - start)


def _anneal_cos(start, end, proportion):
    cos_val = jnp.cos(math.pi * proportion) + 1
    return end + (start - end) / 2 * cos_val


def cycle_schedule(
    lr_max: float,
    n_iter: int,
    divider: float = 25.0,
    warmup_proportion: float = 0.3,
) -> Schedule:
    """One-cycle: linear lr_max/divider -> lr_max over the warmup phase, then
    cosine lr_max -> lr_min/1e4 (reference scheduler.py:251-320; canonical
    trainer uses warmup_proportion=0.05, train_faceoff_perceptual.py:194-201).
    """
    phase1 = int(n_iter * warmup_proportion)
    phase2 = max(n_iter - phase1, 1)
    lr_min = lr_max / divider

    def fn(step):
        it = jnp.mod(_as_f32(step), n_iter)
        p1 = jnp.clip(it / max(phase1, 1), 0.0, 1.0)
        p2 = jnp.clip((it - phase1) / phase2, 0.0, 1.0)
        warm = _anneal_linear(lr_min, lr_max, p1)
        anneal = _anneal_cos(lr_max, lr_min / 1e4, p2)
        return jnp.where(it < phase1, warm, anneal)

    return fn


def cycle_momentum_schedule(
    n_iter: int,
    momentum: Tuple[float, float] = (0.95, 0.85),
    warmup_proportion: float = 0.3,
) -> Schedule:
    """Companion momentum (Adam b1) schedule for the one-cycle policy
    (reference scheduler.py:275-283): high -> low during warmup, back up
    during the anneal."""
    phase1 = int(n_iter * warmup_proportion)
    phase2 = max(n_iter - phase1, 1)
    mom1, mom2 = momentum

    def fn(step):
        it = jnp.mod(_as_f32(step), n_iter)
        p1 = jnp.clip(it / max(phase1, 1), 0.0, 1.0)
        p2 = jnp.clip((it - phase1) / phase2, 0.0, 1.0)
        down = _anneal_linear(mom1, mom2, p1)
        up = _anneal_cos(mom2, mom1, p2)
        return jnp.where(it < phase1, down, up)

    return fn


def cycle_anneal(
    lr_max: float,
    lr_divider: float,
    cut_point: int,
    step_size: int,
) -> Schedule:
    """fastai-style cyclical anneal (reference scheduler.py:157-218
    CycleAnnealScheduler): triangular ramp up/down around lr_max with a
    final linear cut to lr_max/100/divider."""
    cycle_step = int(step_size * (1 - cut_point / 100) / 2)

    def fn(step):
        it = jnp.mod(_as_f32(step), step_size)
        # phase 3: past both cycle steps, linear decay to lr_max/100
        cut3 = (it - 2 * cycle_step) / max(step_size - 2 * cycle_step, 1)
        lr3 = lr_max * (1 + cut3 * (1 - 100) / 100) / lr_divider
        # phase 2: ramp down from lr_max
        cut2 = 1 - (it - cycle_step) / max(cycle_step, 1)
        lr2 = lr_max * (1 + cut2 * (lr_divider - 1)) / lr_divider
        # phase 1: ramp up to lr_max
        cut1 = it / max(cycle_step, 1)
        lr1 = lr_max * (1 + cut1 * (lr_divider - 1)) / lr_divider
        return jnp.where(
            it > 2 * cycle_step, lr3, jnp.where(it > cycle_step, lr2, lr1)
        )

    return fn


def lr_finder(
    lr_min: float, lr_max: float, step_size: int, linear: bool = False
) -> Schedule:
    """Exponential (or linear) LR sweep for range tests
    (reference scheduler.py:323-346)."""
    ratio = lr_max / lr_min

    def fn(step):
        it = _as_f32(step)
        if linear:
            return lr_min + (ratio / step_size) * it
        return lr_min * (ratio ** (1.0 / step_size)) ** it

    return fn


def make_schedule(
    name: str, lr: float, n_iter: int, warmup_proportion: float = 0.05
) -> Optional[Schedule]:
    """Flag-compatible factory: '' -> constant, 'cycle' -> one-cycle
    (reference train_faceoff_perceptual.py:192-201)."""
    if not name:
        return None
    if name == "cycle":
        return cycle_schedule(lr, n_iter, warmup_proportion=warmup_proportion)
    if name == "cosine":
        return cosine_lr(lr / 25.0, lr, n_iter)
    if name == "power":
        return power_lr(lr / 25.0, lr, max(int(n_iter * warmup_proportion), 1))
    if name == "sine":
        return sine_lr(lr / 25.0, lr, n_iter)
    if name == "linear":
        return linear_lr(
            lr / 25.0, lr, max(int(n_iter * warmup_proportion), 1), n_iter
        )
    if name == "clr":
        return clr(lr / 25.0, lr, max(n_iter // 4, 1))
    if name == "cycle_anneal":
        # fastai defaults (reference scheduler.py:157-218: divider 10,
        # cut_point 20%)
        return cycle_anneal(lr, 10.0, 20, n_iter)
    if name == "lr_finder":
        # exponential sweep over 3 decades for range tests
        # (reference scheduler.py:323-346)
        return lr_finder(lr / 1000.0, lr, n_iter)
    raise ValueError(f"unknown schedule '{name}'")
