"""Jitted train/eval steps for the perceptual trainer.

One fused XLA program per optimization step: forward (including the VQ EMA
codebook update), losses, backward, optimizer — the reference splits this
across model forward, three loss modules, loss.backward() and DDP hooks
(reference train_faceoff_perceptual.py:32-48,84-133). Under a sharded mesh
the gradient and codebook-statistics reductions are inserted by XLA.

Batch contract (all float32, channels-last, values in [-1, 1]):
  input: (B, T, H, W, 6)  — source-face composite || target background
          (reference utils.py:29-38 builds this 6-channel conditioning)
  gt:    (B, T, H, W, 3)  — original frames to reconstruct
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from faceoff_tpu.ops import video as video_ops
from faceoff_tpu.losses import mse_loss
from faceoff_tpu.train.state import TrainState


def make_train_step(
    model,
    *,
    latent_loss_weight: float = 1.0,
    perceptual_loss_weight: float = 1.0,
    lpips_apply: Optional[Callable] = None,
    prepare_fn: Optional[Callable] = None,
    donate: bool = True,
):
    """Build the jitted train step.

    lpips_apply: optional `(lpips_vars, target_frames, pred_frames) -> scalar`
    callable; when given, the step takes the frozen LPIPS variables as a
    third argument (loss weights per reference config.py:4-6,
    train_faceoff_perceptual.py:98).

    prepare_fn: optional `(key, frames, landmarks) -> batch` on-device input
    pipeline (faceoff_tpu.data.device_pipeline). When given, the step
    accepts a raw {"frames", "landmarks"} batch plus a PRNG key and the
    whole input preparation fuses into the same XLA program as the
    optimization step — one dispatch per step.
    """

    def loss_fn(params, vq, batch, lpips_vars):
        (dec, latent_loss), updates = model.apply(
            {"params": params, "vq": vq},
            batch["input"],
            train=True,
            mutable=["vq"],
        )
        out = dec[..., :3]
        gt = batch["gt"]
        recon_loss = mse_loss(out, gt)

        if lpips_apply is not None:
            perceptual = lpips_apply(
                lpips_vars, video_ops.fold_time(gt), video_ops.fold_time(out)
            )
        else:
            perceptual = jnp.zeros((), jnp.float32)

        loss = (
            recon_loss
            + latent_loss_weight * latent_loss
            + perceptual_loss_weight * perceptual
        )
        metrics = {
            "loss": loss,
            "mse": recon_loss,
            "latent": latent_loss,
            "perceptual": perceptual,
        }
        return loss, (updates["vq"], metrics)

    donate_argnums = (0,) if donate else ()

    def step_inner(state, batch, lpips_vars, key):
        if prepare_fn is not None:
            # per-step randomness derives from a CONSTANT base key folded
            # with the step counter INSIDE the program: the host passes the
            # same device key every step, so no per-step key-construction
            # dispatch rides the (possibly high-latency) device link
            key = jax.random.fold_in(key, state.step)
            batch = prepare_fn(key, batch["frames"], batch["landmarks"])
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_vq, metrics)), grads = grad_fn(
            state.params, state.vq, batch, lpips_vars
        )
        new_state = state.apply_gradients(grads, new_vq)
        # lr as a step OUTPUT (fresh buffer): logging needs it, and reading
        # it from the state on the host costs an extra dispatch per step
        # (plus the use-after-donate alias hazard the +0 copy papered over)
        hp = getattr(new_state.opt_state, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            metrics["lr"] = hp["learning_rate"] + 0
        return new_state, metrics

    @partial(jax.jit, donate_argnums=donate_argnums)
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        lpips_vars: Any = None,
        key: Optional[jax.Array] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        return step_inner(state, batch, lpips_vars, key)

    return train_step


def make_multi_step(
    model,
    steps_per_call: int,
    *,
    latent_loss_weight: float = 1.0,
    perceptual_loss_weight: float = 1.0,
    lpips_apply: Optional[Callable] = None,
    prepare_fn: Optional[Callable] = None,
    donate: bool = True,
    scan_batches: bool = True,
):
    """K optimizer steps per dispatch via `lax.scan`.

    Amortizes per-step launch overhead (dominant on high-latency hosts;
    always nonzero): the batch pytree carries a leading `steps_per_call`
    axis of distinct micro-batches, and PRNG keys likewise. Returns
    (final_state, metrics of the LAST step, with a 'loss_mean' over the
    window).

    scan_batches=False: the batch is CONSTANT across the scan (no leading
    K axis) — the device-resident corpus mode, where every step receives
    the same staged arrays and prepare_fn samples fresh clips from them
    (the step folds the on-device step counter into the key, so identical
    inputs still yield distinct batches per iteration).
    """
    single = make_train_step(
        model,
        latent_loss_weight=latent_loss_weight,
        perceptual_loss_weight=perceptual_loss_weight,
        lpips_apply=lpips_apply,
        prepare_fn=prepare_fn,
        donate=False,
    )
    # reuse the traced inner logic via a fresh closure: scan body calls the
    # unjitted step path (nested jit would inline anyway, but keep it flat)
    inner = single.__wrapped__  # the undecorated step

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(
        state: TrainState,
        batches: Dict[str, jnp.ndarray],
        lpips_vars: Any = None,
        keys: Optional[jax.Array] = None,
    ):
        if keys is None:
            keys = jnp.zeros((steps_per_call,), jnp.uint32)

        if scan_batches:
            def body(carry, xs):
                batch, key = xs
                new_state, metrics = inner(carry, batch, lpips_vars, key)
                return new_state, metrics

            xs = (batches, keys)
        else:
            def body(carry, key):
                new_state, metrics = inner(carry, batches, lpips_vars, key)
                return new_state, metrics

            xs = keys

        state_out, metrics_seq = jax.lax.scan(
            body, state, xs, length=steps_per_call
        )
        metrics = {
            k: v[-1] for k, v in metrics_seq.items()
        }
        metrics["loss_mean"] = jnp.mean(metrics_seq["loss"])
        return state_out, metrics

    return multi_step


def make_eval_step(model):
    """Validation forward: returns reconstruction + metrics, no mutation
    (reference train_faceoff_perceptual.py:53-79 validation path)."""

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        dec, latent_loss = model.apply(
            {"params": state.params, "vq": state.vq},
            batch["input"],
            train=False,
        )
        out = dec[..., :3]
        metrics = {
            "mse": mse_loss(out, batch["gt"]),
            "latent": latent_loss,
        }
        return out, metrics

    return eval_step
