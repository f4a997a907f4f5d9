"""Train step for the alignment-regression network.

Consumes the dataset's alignment items (reference
TemporalAlignment/dataset.py:377-397): input = (perturbed face ‖
background) frames, target = negated applied transform (rotation, tx, ty)
per frame. Frames fold into the batch axis; loss is MSE over the three
regressed quantities.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from faceoff_tpu.ops import video as video_ops


class AlignmentState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_alignment_state(
    model, key: jax.Array, sample: jnp.ndarray, lr: float = 3e-4
) -> AlignmentState:
    params = model.init(key, sample)["params"]
    tx = optax.adam(lr)
    return AlignmentState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_alignment_step(model, *, donate: bool = True):
    """batch: {'input': (B, T, H, W, 6), 'transforms': (B, T, 3)}."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        state: AlignmentState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[AlignmentState, Dict[str, jnp.ndarray]]:
        frames = video_ops.fold_time(batch["input"])
        targets = batch["transforms"].reshape(-1, 3)

        def loss_fn(params):
            pred = model.apply({"params": params}, frames)
            loss = jnp.mean((pred - targets) ** 2)
            mae = jnp.mean(jnp.abs(pred - targets), axis=0)
            return loss, mae

        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "mae_rotation": mae[0],
            "mae_tx": mae[1],
            "mae_ty": mae[2],
        }
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            metrics,
        )

    return train_step
