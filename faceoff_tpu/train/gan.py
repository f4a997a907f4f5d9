"""GAN fine-tuning stage: MoCoGAN-HD adversarial training.

Re-structures the reference's alternating generator/discriminator loop
(reference disc_trainers/train_vqvae_mocoganhd_disc_single.py:157-331) as
two jitted steps with explicit parameter partitions — no retain_graph
tricks, no per-module hidden optimizers (the reference buries Adam inside
ModelD_3d/ModelD_img, mocoganhd_video_disc.py:25-27):

  * gen_step: G_loss = recon + latent_w*latent + 0.25*RaLSGAN_2d +
    0.25*RaLSGAN_3d (reference :227-230, weights config.py:9-10); updates
    generator params + VQ codebooks only.
  * disc_step: RaLSGAN for both discriminators on a stop-gradient'd
    reconstruction (reference :245-297); updates both discriminators.

Discriminator inputs mirror the reference: the 2D content discriminator
sees channel-concatenated (frame0 ‖ frame_k) pairs (:201-205); the 3D
motion discriminator sees (frame0 ‖ frame_t) stacks over the clip window
(:215-220), with a random whole-video horizontal flip (:148-153).

All randomness (window start, pair frame, flip) is drawn inside the jitted
step from an explicit PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from faceoff_tpu.losses import mse_loss, relativistic_average_lsgan
from faceoff_tpu.train.state import TrainState


class GANTrainState(struct.PyTreeNode):
    """Generator train state + two discriminators with their own Adam
    optimizers (betas (0.5, 0.999) as in reference
    mocoganhd_video_disc.py:25-27)."""

    gen: TrainState
    d_img_params: Any
    d_img_opt: Any
    d_3d_params: Any
    d_3d_opt: Any
    tx_d_img: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d_3d: optax.GradientTransformation = struct.field(pytree_node=False)


def create_gan_state(
    gen_state: TrainState,
    d_img,
    d_3d,
    key: jax.Array,
    *,
    sample_frames: int,
    image_hw: int,
    channels: int = 3,
    disc_lr: float = 3e-4,
) -> GANTrainState:
    k1, k2 = jax.random.split(key)
    pair = jnp.zeros((1, image_hw, image_hw, channels * 2))
    stack = jnp.zeros((1, sample_frames - 1, image_hw, image_hw, channels * 2))
    d_img_vars = d_img.init(k1, pair)
    d_3d_vars = d_3d.init(k2, stack)
    tx_d = optax.adam(disc_lr, b1=0.5, b2=0.999)
    return GANTrainState(
        gen=gen_state,
        d_img_params=d_img_vars["params"],
        d_img_opt=tx_d.init(d_img_vars["params"]),
        d_3d_params=d_3d_vars["params"],
        d_3d_opt=tx_d.init(d_3d_vars["params"]),
        tx_d_img=tx_d,
        tx_d_3d=tx_d,
    )


def _sample_window(x: jnp.ndarray, start: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dynamic n-frame window from (B, T, H, W, C) (reference :181-184)."""
    return jax.lax.dynamic_slice_in_dim(x, start, n, axis=1)


def _frame_pair(x: jnp.ndarray, frame_id: jnp.ndarray) -> jnp.ndarray:
    """(frame0 ‖ frame_id) channel concat (reference :201-205)."""
    f0 = x[:, 0]
    fk = jax.lax.dynamic_index_in_dim(x, frame_id, axis=1, keepdims=False)
    return jnp.concatenate([f0, fk], axis=-1)


def _pair_stack(x: jnp.ndarray) -> jnp.ndarray:
    """(B,T,H,W,C) -> (B,T-1,H,W,2C): frame0 paired with each later frame
    (reference :215-216)."""
    t = x.shape[1]
    f0 = jnp.broadcast_to(
        x[:, :1], (x.shape[0], t - 1) + x.shape[2:]
    )
    return jnp.concatenate([f0, x[:, 1:]], axis=-1)


def _maybe_flip(x: jnp.ndarray, do_flip: jnp.ndarray) -> jnp.ndarray:
    """Random whole-clip horizontal flip (reference :148-153; width is
    axis -2 in NTHWC)."""
    return jnp.where(do_flip, jnp.flip(x, axis=-2), x)


def adv_scale_schedule(step: int, start: int = 0, ramp: int = 0) -> float:
    """Adversarial-term multiplier for a warm-started GAN fine-tune:
    0.0 through `start` warmup steps (taming-style adopt_weight gating),
    then a linear `ramp`-step ramp to 1.0 (hard switch when ramp=0).
    Host-side float fed to gen_step's traced adv_scale arg — varying
    values never retrace.

    `step` is the ABSOLUTE run step: a `--resume latest` retry continues
    the warmup/ramp exactly where it stopped. (An earlier revision
    anchored the schedule at the resumed step, which silently restarted
    the warmup + ramp on every supervisor retry — the schedule-continuity
    hazard the round-3 real-footage incident exposed for the lr cycle.)"""
    rel = step - start
    if rel < 0:
        return 0.0
    if ramp <= 0:
        return 1.0
    return min(1.0, (rel + 1) / ramp)


def make_gan_steps(
    model,
    d_img,
    d_3d,
    *,
    sample_frames: int = 16,
    latent_loss_weight: float = 1.0,
    perceptual_loss_weight: float = 0.0,
    g_2d_weight: float = 0.25,
    g_3d_weight: float = 0.25,
    lpips_apply=None,
    prepare_fn=None,
    donate: bool = True,
):
    """Build (gen_step, disc_step). Set perceptual_loss_weight>0 with
    lpips_apply for the perceptual GAN variant (reference
    disc_trainers/train_vqvae_perceptual_mocoganhd_disc.py:229-233).

    prepare_fn: optional on-device input pipeline (see
    faceoff_tpu.data.device_pipeline) — the steps then accept raw
    {"frames", "landmarks"} batches and fuse the geometry into the same
    XLA program."""

    def maybe_prepare(batch, key):
        if prepare_fn is not None and "frames" in batch:
            return prepare_fn(
                jax.random.fold_in(key, 1),
                batch["frames"],
                batch["landmarks"],
            )
        return batch

    def forward(params, vq, batch):
        (dec, latent), updates = model.apply(
            {"params": params, "vq": vq},
            batch["input"],
            train=True,
            mutable=["vq"],
        )
        return dec[..., :3], latent, updates["vq"]

    def rand_bits(key, t):
        k1, k2, k3 = jax.random.split(key, 3)
        start = jax.random.randint(k1, (), 0, t - sample_frames + 1)
        frame_id = jax.random.randint(k2, (), 1, sample_frames)
        flip = jax.random.bernoulli(k3)
        return start, frame_id, flip

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def gen_step(
        state: GANTrainState, batch: Dict[str, jnp.ndarray], key: jax.Array,
        lpips_vars: Any = None, adv_scale: jnp.ndarray = 1.0,
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """adv_scale: traced multiplier on the adversarial terms —
        0.0 during a discriminator warmup (taming-style adopt_weight
        gating, which the reference's mocoganhd trainers lack: fresh
        discriminators at full weight overwhelm a warm-started
        generator's reconstruction within a few hundred steps)."""
        # per-step randomness = caller key folded with (stream tag, the
        # on-device generator step counter): the host can pass ONE constant
        # key for the whole run — no per-step key-construction dispatch on
        # the device link — and resume reproduces the stream exactly
        key = jax.random.fold_in(jax.random.fold_in(key, 0), state.gen.step)
        batch = maybe_prepare(batch, key)
        t = batch["gt"].shape[1]
        start, frame_id, flip = rand_bits(key, t)

        def loss_fn(params, vq):
            out, latent, new_vq = forward(params, vq, batch)
            recon = mse_loss(out, batch["gt"])

            x_fake = _sample_window(out, start, sample_frames)
            x_real = _sample_window(batch["gt"], start, sample_frames)

            d_fake = d_img.apply(
                {"params": state.d_img_params}, _frame_pair(x_fake, frame_id)
            )
            d_real = d_img.apply(
                {"params": state.d_img_params},
                jax.lax.stop_gradient(_frame_pair(x_real, frame_id)),
            )
            g_2d = 0.5 * (
                relativistic_average_lsgan(d_fake, d_real, True)
                + relativistic_average_lsgan(d_real, d_fake, False)
            )

            d3_real = d_3d.apply(
                {"params": state.d_3d_params},
                _maybe_flip(_pair_stack(x_real), flip),
            )
            d3_fake = d_3d.apply(
                {"params": state.d_3d_params},
                _maybe_flip(_pair_stack(x_fake), flip),
            )
            g_3d = 0.5 * (
                relativistic_average_lsgan(d3_fake, d3_real, True)
                + relativistic_average_lsgan(d3_real, d3_fake, False)
            )

            perceptual = jnp.zeros((), jnp.float32)
            if lpips_apply is not None and perceptual_loss_weight > 0:
                from faceoff_tpu.ops import video as video_ops

                perceptual = lpips_apply(
                    lpips_vars,
                    video_ops.fold_time(batch["gt"]),
                    video_ops.fold_time(out),
                )

            loss = (
                recon
                + latent_loss_weight * latent
                + perceptual_loss_weight * perceptual
                + adv_scale * g_2d_weight * g_2d
                + adv_scale * g_3d_weight * g_3d
            )
            metrics = {
                "g_loss": loss,
                "mse": recon,
                "latent": latent,
                "g_2d": g_2d,
                "g_3d": g_3d,
                "perceptual": perceptual,
            }
            return loss, (new_vq, metrics)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_vq, metrics)), grads = grad_fn(state.gen.params, state.gen.vq)
        new_gen = state.gen.apply_gradients(grads, new_vq)
        return state.replace(gen=new_gen), metrics

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def disc_step(
        state: GANTrainState, batch: Dict[str, jnp.ndarray], key: jax.Array
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        # stream tag 1 (vs the gen step's 0): a gen/disc pair shares
        # state.gen.step until the next gen update, so the tag keeps the
        # two streams disjoint under a constant caller key
        key = jax.random.fold_in(jax.random.fold_in(key, 1), state.gen.step)
        batch = maybe_prepare(batch, key)
        t = batch["gt"].shape[1]
        start, frame_id, flip = rand_bits(key, t)

        out, _, _ = forward(state.gen.params, state.gen.vq, batch)
        out = jax.lax.stop_gradient(out)
        x_fake = _sample_window(out, start, sample_frames)
        x_real = _sample_window(batch["gt"], start, sample_frames)

        def d3_loss_fn(d3_params):
            real = d_3d.apply(
                {"params": d3_params}, _maybe_flip(_pair_stack(x_real), flip)
            )
            fake = d_3d.apply(
                {"params": d3_params}, _maybe_flip(_pair_stack(x_fake), flip)
            )
            return 0.5 * (
                relativistic_average_lsgan(real, fake, True)
                + relativistic_average_lsgan(fake, real, False)
            )

        def d2_loss_fn(d2_params):
            real = d_img.apply(
                {"params": d2_params}, _frame_pair(x_real, frame_id)
            )
            fake = d_img.apply(
                {"params": d2_params}, _frame_pair(x_fake, frame_id)
            )
            return 0.5 * (
                relativistic_average_lsgan(real, fake, True)
                + relativistic_average_lsgan(fake, real, False)
            )

        d3_loss, d3_grads = jax.value_and_grad(d3_loss_fn)(state.d_3d_params)
        d3_updates, d3_opt = state.tx_d_3d.update(
            d3_grads, state.d_3d_opt, state.d_3d_params
        )
        d3_params = optax.apply_updates(state.d_3d_params, d3_updates)

        d2_loss, d2_grads = jax.value_and_grad(d2_loss_fn)(state.d_img_params)
        d2_updates, d2_opt = state.tx_d_img.update(
            d2_grads, state.d_img_opt, state.d_img_params
        )
        d2_params = optax.apply_updates(state.d_img_params, d2_updates)

        metrics = {"d_3d_loss": d3_loss, "d_img_loss": d2_loss}
        return (
            state.replace(
                d_3d_params=d3_params,
                d_3d_opt=d3_opt,
                d_img_params=d2_params,
                d_img_opt=d2_opt,
            ),
            metrics,
        )

    return gen_step, disc_step


def make_gan_multi_step(
    model,
    d_img,
    d_3d,
    steps_per_call: int,
    *,
    donate: bool = True,
    **step_kwargs,
):
    """K alternating gen/disc iterations per dispatch via `lax.scan` —
    the reference's even/odd alternation (reference
    disc_trainers/train_vqvae_mocoganhd_disc_single.py:338-341) with K
    microbatches riding ONE XLA program, amortizing per-step dispatch
    latency exactly as train_step.make_multi_step does for the
    perceptual stage.

    The alternation is statically known, so the scan body is a
    (gen, disc) PAIR over two microbatches — no `lax.cond` (a measured
    1.7x per-step slowdown on TPU when the branches sat behind a
    conditional). `steps_per_call` must therefore be even and dispatches
    must start on a gen (even) step — the CLI aligns parity with a single
    plain step when resuming from an odd step count.

    Returns multi_step(state, batches, keys, lpips_vars) -> (state,
    metrics) where every batch leaf and `keys` carry a leading
    `steps_per_call` axis (microbatch i feeds iteration i: even -> gen,
    odd -> disc) and metrics are {'gen': ..., 'disc': ...} with stacked
    (steps_per_call//2,) device scalars."""
    if steps_per_call % 2 != 0:
        raise ValueError("steps_per_call must be even (gen/disc pairs)")
    gen_step, disc_step = make_gan_steps(
        model, d_img, d_3d, donate=False, **step_kwargs
    )
    gen_inner, disc_inner = gen_step.__wrapped__, disc_step.__wrapped__
    pairs = steps_per_call // 2

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(
        state: GANTrainState,
        batches: Dict[str, jnp.ndarray],
        keys: jax.Array,
        lpips_vars: Any = None,
        adv_scale: jnp.ndarray = 1.0,
    ):
        # (K, ...) -> (K/2, 2, ...): pair microbatch axis
        paired = jax.tree_util.tree_map(
            lambda x: x.reshape((pairs, 2) + x.shape[1:]), batches
        )
        paired_keys = keys.reshape((pairs, 2) + keys.shape[1:])

        def body(st, xs):
            batch2, key2 = xs
            b_gen = jax.tree_util.tree_map(lambda x: x[0], batch2)
            b_disc = jax.tree_util.tree_map(lambda x: x[1], batch2)
            st, gm = gen_inner(st, b_gen, key2[0], lpips_vars, adv_scale)
            st, dm = disc_inner(st, b_disc, key2[1])
            return st, {"gen": gm, "disc": dm}

        state_out, seq = jax.lax.scan(
            body, state, (paired, paired_keys), length=pairs
        )
        return state_out, seq

    return multi_step
