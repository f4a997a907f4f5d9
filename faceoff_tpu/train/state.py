"""Training state: parameters, EMA codebooks, optimizer and step.

Unlike the reference — which checkpoints only `model.state_dict()` and loses
optimizer/scheduler/step state on resume (reference
train_faceoff_perceptual.py:140-143, SURVEY §5) — the whole `TrainState`
pytree checkpoints through orbax, so resume is exact.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from faceoff_tpu.train import schedule as schedules


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    vq: Any  # EMA codebook collection (updated in the forward pass)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_vq):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            vq=new_vq,
            opt_state=new_opt_state,
        )


def make_optimizer(
    lr: float,
    sched_name: str = "",
    n_iter: int = 1,
    warmup_proportion: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    momentum: tuple = (0.95, 0.85),
) -> optax.GradientTransformation:
    """Adam with the flag-selected LR schedule
    (reference train_faceoff_perceptual.py:190-201: optim.Adam + optional
    CycleScheduler stepped per iteration).

    The one-cycle policy also cycles Adam's b1 alongside the lr — high to
    low over the warmup, back up during the anneal (reference
    scheduler.py:275-283 writes group['betas'] = (momentum, b2) each step)
    — so `--sched cycle` injects the companion momentum schedule too."""
    sched = schedules.make_schedule(sched_name, lr, n_iter, warmup_proportion)
    learning_rate: Any = sched if sched is not None else lr
    b1_arg: Any = b1
    if sched_name == "cycle":
        b1_arg = schedules.cycle_momentum_schedule(
            n_iter, momentum, warmup_proportion
        )
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, b1=b1_arg, b2=b2
    )


def create_train_state(
    model,
    key: jax.Array,
    sample_input: jnp.ndarray,
    tx: Optional[optax.GradientTransformation] = None,
    lr: float = 3e-4,
) -> TrainState:
    variables = model.init(key, sample_input, train=False)
    params = variables["params"]
    vq = variables["vq"]
    if tx is None:
        tx = make_optimizer(lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        vq=vq,
        opt_state=tx.init(params),
        tx=tx,
    )


def current_lr(state: TrainState) -> float:
    """Read the injected learning rate for logging."""
    try:
        return float(state.opt_state.hyperparams["learning_rate"])
    except (AttributeError, KeyError, TypeError):
        return float("nan")
