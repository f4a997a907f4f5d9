"""MoCoGAN BCE adversarial stage (patch image + patch video discriminators).

Behavioural port of reference disc_trainers/train_vqvae_mocogan_disc.py
(:136-178) and its `_perceptual` variant: every iteration updates, in
order, the image discriminator, the video discriminator, and the
generator, all with BCE-with-logits objectives:

  gen loss = recon + latent + 0.5*BCE(D_img(fake), 1) + 0.5*BCE(D_vid(fake), 1)
             (+ optional LPIPS; weights reference config.py:12-13)
  disc loss = BCE(D(real), 1) + BCE(D(fake), 0)

The patch discriminators carry BatchNorm running statistics, threaded
through the step as a `batch_stats` collection (the reference relies on
torch BN's implicit state).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from faceoff_tpu.losses import bce_logits_loss, mse_loss
from faceoff_tpu.ops import video as video_ops
from faceoff_tpu.train.state import TrainState


class MocoganState(struct.PyTreeNode):
    gen: TrainState
    d_img_vars: Any  # {'params', 'batch_stats'}
    d_img_opt: Any
    d_vid_vars: Any
    d_vid_opt: Any
    tx_d: optax.GradientTransformation = struct.field(pytree_node=False)


def create_mocogan_state(
    gen_state: TrainState,
    d_img,
    d_vid,
    key: jax.Array,
    *,
    frames: int,
    image_hw: int,
    channels: int = 3,
    disc_lr: float = 3e-4,
) -> MocoganState:
    k1, k2 = jax.random.split(key)
    img = jnp.zeros((1, image_hw, image_hw, channels))
    vid = jnp.zeros((1, frames, image_hw, image_hw, channels))
    d_img_vars = d_img.init(k1, img, train=False)
    d_vid_vars = d_vid.init(k2, vid, train=False)
    tx_d = optax.adam(disc_lr, b1=0.5, b2=0.999)
    return MocoganState(
        gen=gen_state,
        d_img_vars=d_img_vars,
        d_img_opt=tx_d.init(d_img_vars["params"]),
        d_vid_vars=d_vid_vars,
        d_vid_opt=tx_d.init(d_vid_vars["params"]),
        tx_d=tx_d,
    )


def make_mocogan_step(
    model,
    d_img,
    d_vid,
    *,
    latent_loss_weight: float = 1.0,
    image_disc_weight: float = 0.5,
    video_disc_weight: float = 0.5,
    perceptual_loss_weight: float = 0.0,
    lpips_apply=None,
    prepare_fn=None,
    donate: bool = True,
):
    """One combined iteration: disc updates then gen update
    (reference train_vqvae_mocogan_disc.py:178-230 orders
    train_discriminator for both discs, then train_generator).

    prepare_fn: optional on-device input pipeline (device_pipeline /
    resident corpus) — the step then accepts raw {"frames", "landmarks"}
    batches and the geometry fuses into the same XLA program."""

    def maybe_prepare(batch, key):
        if prepare_fn is not None and "frames" in batch:
            return prepare_fn(
                jax.random.fold_in(key, 1),
                batch["frames"],
                batch["landmarks"],
            )
        return batch

    def gen_forward(params, vq, batch):
        (dec, latent), updates = model.apply(
            {"params": params, "vq": vq}, batch["input"], train=True,
            mutable=["vq"],
        )
        return dec[..., :3], latent, updates["vq"]

    def disc_apply(d, dvars, x, train, noise_key=None):
        extra = {}
        if "batch_stats" in dvars:
            extra["batch_stats"] = dvars["batch_stats"]
        # 'noise' rng activates the GaussianNoise layers of use_noise
        # discriminators (reference mocogan_discriminator.py:16-25); the
        # reference applies it in generator passes too, so it is threaded
        # independently of `train`
        rngs = {"noise": noise_key} if noise_key is not None else None
        if train:
            out, ups = d.apply(
                {"params": dvars["params"], **extra}, x, train=True,
                mutable=["batch_stats"] if extra else [], rngs=rngs,
            )
            new_vars = dict(dvars)
            if extra:
                new_vars["batch_stats"] = ups["batch_stats"]
            return out, new_vars
        return (
            d.apply(
                {"params": dvars["params"], **extra}, x, train=False,
                rngs=rngs,
            ),
            dvars,
        )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(
        state: MocoganState, batch: Dict[str, jnp.ndarray], key: jax.Array,
        lpips_vars: Any = None,
    ) -> Tuple[MocoganState, Dict[str, jnp.ndarray]]:
        # fold the on-device generator step counter into the caller's key:
        # the host may pass ONE constant key for the whole run (no per-step
        # key-construction dispatch) and resume reproduces the stream
        key = jax.random.fold_in(key, state.gen.step)
        batch = maybe_prepare(batch, key)
        # one noise stream per discriminator application site (inactive
        # unless the discriminators were built with use_noise=True)
        nk = jax.random.split(key, 6)

        # reconstruction once, reused by every sub-update
        out, latent, new_vq = gen_forward(state.gen.params, state.gen.vq, batch)
        out_sg = jax.lax.stop_gradient(out)
        real_frames = video_ops.fold_time(batch["gt"])
        fake_frames_sg = video_ops.fold_time(out_sg)

        # ---- image discriminator update (reference :136-150)
        def d_img_loss_fn(params):
            dvars = {**state.d_img_vars, "params": params}
            real_logits, nv = disc_apply(
                d_img, dvars, real_frames, True, noise_key=nk[0]
            )
            fake_logits, nv = disc_apply(
                d_img, nv, fake_frames_sg, True, noise_key=nk[1]
            )
            loss = bce_logits_loss(real_logits, True) + bce_logits_loss(
                fake_logits, False
            )
            return loss, nv

        (d_img_loss, d_img_vars), d_img_grads = jax.value_and_grad(
            d_img_loss_fn, has_aux=True
        )(state.d_img_vars["params"])
        up, d_img_opt = state.tx_d.update(
            d_img_grads, state.d_img_opt, state.d_img_vars["params"]
        )
        d_img_vars = {
            **d_img_vars, "params": optax.apply_updates(
                state.d_img_vars["params"], up
            )
        }

        # ---- video discriminator update (reference :152-165)
        def d_vid_loss_fn(params):
            dvars = {**state.d_vid_vars, "params": params}
            real_logits, nv = disc_apply(
                d_vid, dvars, batch["gt"], True, noise_key=nk[2]
            )
            fake_logits, nv = disc_apply(
                d_vid, nv, out_sg, True, noise_key=nk[3]
            )
            loss = bce_logits_loss(real_logits, True) + bce_logits_loss(
                fake_logits, False
            )
            return loss, nv

        (d_vid_loss, d_vid_vars), d_vid_grads = jax.value_and_grad(
            d_vid_loss_fn, has_aux=True
        )(state.d_vid_vars["params"])
        up, d_vid_opt = state.tx_d.update(
            d_vid_grads, state.d_vid_opt, state.d_vid_vars["params"]
        )
        d_vid_vars = {
            **d_vid_vars, "params": optax.apply_updates(
                state.d_vid_vars["params"], up
            )
        }

        # ---- generator update (reference :152-176 train_generator:
        # gen loss = recon + latent + 0.5*img + 0.5*vid)
        def g_loss_fn(params, vq):
            out_g, latent_g, new_vq_g = gen_forward(params, vq, batch)
            recon = mse_loss(out_g, batch["gt"])
            fake_frames = video_ops.fold_time(out_g)
            img_logits, _ = disc_apply(
                d_img, d_img_vars, fake_frames, False, noise_key=nk[4]
            )
            vid_logits, _ = disc_apply(
                d_vid, d_vid_vars, out_g, False, noise_key=nk[5]
            )
            g_img = bce_logits_loss(img_logits, True)
            g_vid = bce_logits_loss(vid_logits, True)
            perceptual = jnp.zeros((), jnp.float32)
            if lpips_apply is not None and perceptual_loss_weight > 0:
                perceptual = lpips_apply(
                    lpips_vars, video_ops.fold_time(batch["gt"]), fake_frames
                )
            loss = (
                recon
                + latent_loss_weight * latent_g
                + perceptual_loss_weight * perceptual
                + image_disc_weight * g_img
                + video_disc_weight * g_vid
            )
            metrics = {
                "g_loss": loss, "mse": recon, "latent": latent_g,
                "g_img": g_img, "g_vid": g_vid, "perceptual": perceptual,
            }
            return loss, (new_vq_g, metrics)

        (_, (new_vq, metrics)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.gen.params, state.gen.vq)
        new_gen = state.gen.apply_gradients(grads, new_vq)

        metrics.update({"d_img_loss": d_img_loss, "d_vid_loss": d_vid_loss})
        return (
            state.replace(
                gen=new_gen,
                d_img_vars=d_img_vars,
                d_img_opt=d_img_opt,
                d_vid_vars=d_vid_vars,
                d_vid_opt=d_vid_opt,
            ),
            metrics,
        )

    return step
