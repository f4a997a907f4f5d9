"""GAN fine-tuning CLI: one coherent trainer replacing the reference's five
copy-pasted disc_trainers (SURVEY §3.6).

    python -m faceoff_tpu.cli.train_faceoff_gan \
        --data_root DATA --gan mocoganhd [--perceptual] [--ckpt latest]

--gan selects the adversarial recipe:
  mocoganhd  alternating RaLSGAN with multiscale 2D content + 3D motion
             discriminators (reference
             disc_trainers/train_vqvae_mocoganhd_disc_single.py; add
             --perceptual for train_vqvae_perceptual_mocoganhd_disc.py)
  mocogan    per-iteration BCE with patch image+video discriminators
             (reference disc_trainers/train_vqvae_mocogan_disc.py;
             --perceptual for the _perceptual variant)
  vqgan      PatchGAN with adaptive discriminator weight (reference
             loss.py:35-118 VQLPIPSWithDiscriminator)
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.discriminators import (
    MultiscaleDiscriminator2D,
    MultiscaleDiscriminator3D,
    NLayerDiscriminator,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
)
from faceoff_tpu.models.lpips import init_lpips
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.state import make_optimizer


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--gan", choices=["mocoganhd", "mocogan", "vqgan"],
                   default="mocoganhd")
    p.add_argument("--perceptual", action="store_true")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--disc_lr", type=float, default=3e-4)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--train_frames", type=int, default=30)
    p.add_argument("--sample_frames", type=int, default=16,
                   help="discriminator clip window (12 in the perceptual "
                        "variant, reference :164)")
    p.add_argument("--validate_at", type=int, default=1024)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--ckpt", default=None,
                   help="step or 'latest': initialize the generator from a "
                        "perceptual-stage checkpoint in --gen_checkpoint_dir "
                        "(the reference's pretrain -> GAN-finetune workflow)")
    p.add_argument("--gen_checkpoint_dir", default=None,
                   help="checkpoint dir of the pretrained generator")
    p.add_argument("--checkpoint_dir", default="gan_checkpoint")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=None,
                   help="optional hard cap on total steps (smoke runs)")
    p.add_argument("--device_pipeline", action="store_true",
                   help="run hull/perturb/composite on the accelerator "
                        "(mocoganhd recipe only)")
    return p


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.perceptual and args.sample_frames == 16:
        args.sample_frames = 12  # reference train_vqvae_perceptual_* :164
    print(args, flush=True)

    on_tpu = jax.default_backend() == "tpu"
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )

    ds = TemporalAlignmentDataset(
        args.data_root, "train", args.train_frames, resolution=args.size
    )
    prepare_fn = None
    if args.device_pipeline:
        if args.gan != "mocoganhd":
            raise SystemExit("--device_pipeline currently supports "
                             "--gan mocoganhd only")
        from faceoff_tpu.data.device_pipeline import (
            RawClipLoader,
            prepare_train_batch,
        )

        loader = RawClipLoader(
            ds, batch_clips=args.batch_size, num_workers=args.num_workers,
            seed=args.seed,
        )
        prepare_fn = prepare_train_batch
    else:
        loader = DataLoader(
            ds, batch_clips=args.batch_size, num_workers=args.num_workers,
            seed=args.seed,
        )

    sample = jnp.zeros(
        (args.batch_size, args.train_frames, args.size, args.size, 6),
        jnp.float32,
    )
    tx = make_optimizer(args.lr)
    gen_state = create_train_state(model, jax.random.key(args.seed), sample, tx=tx)

    # warm-start the generator from a perceptual-stage checkpoint
    # (the reference loads the vqvae ckpt before GAN fine-tuning,
    # disc_trainers/train_vqvae_mocoganhd_disc_single.py:350-360)
    if args.ckpt is not None:
        src_dir = args.gen_checkpoint_dir or args.checkpoint_dir
        src = CheckpointManager(src_dir)
        step = None if args.ckpt == "latest" else int(args.ckpt)
        gen_state = src.restore_weights(gen_state, step)
        print(f"generator warm-started from {src_dir} @ step "
              f"{int(gen_state.step)}", flush=True)

    lpips_apply = lpips_vars = None
    if args.perceptual or args.gan == "vqgan":
        lpips_model, lpips_vars = init_lpips(
            jax.random.key(args.seed + 1), image_size=args.size,
            weights_npz=args.lpips_weights,
        )
        lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)

    ckpt = CheckpointManager(args.checkpoint_dir)

    # build the recipe: a `run_step(state, batch, step_count, key) ->
    # (state, log line)` closure — one loop for all three adversarial
    # recipes instead of the reference's five copy-pasted trainer files
    if args.gan == "mocoganhd":
        from faceoff_tpu.train.gan import create_gan_state, make_gan_steps

        d_img = MultiscaleDiscriminator2D()
        d_3d = MultiscaleDiscriminator3D(n_frames=args.sample_frames)
        state = create_gan_state(
            gen_state, d_img, d_3d, jax.random.key(args.seed + 2),
            sample_frames=args.sample_frames, image_hw=args.size,
            disc_lr=args.disc_lr,
        )
        gen_step, disc_step = make_gan_steps(
            model, d_img, d_3d, sample_frames=args.sample_frames,
            perceptual_loss_weight=1.0 if args.perceptual else 0.0,
            lpips_apply=lpips_apply, prepare_fn=prepare_fn,
        )

        def run_step(state, batch, step_count, key):
            # alternate gen/disc (reference :187-190)
            if step_count % 2 == 0:
                state, m = gen_step(state, batch, key, lpips_vars)
                return state, f"gen loss: {float(m['g_loss']):.5f}"
            state, m = disc_step(state, batch, key)
            return state, (
                f"disc 3d: {float(m['d_3d_loss']):.5f} "
                f"img: {float(m['d_img_loss']):.5f}"
            )

    elif args.gan == "mocogan":
        from faceoff_tpu.train.mocogan import (
            create_mocogan_state,
            make_mocogan_step,
        )

        d_img = PatchImageDiscriminator()
        d_vid = PatchVideoDiscriminator()
        state = create_mocogan_state(
            gen_state, d_img, d_vid, jax.random.key(args.seed + 2),
            frames=args.train_frames, image_hw=args.size,
            disc_lr=args.disc_lr,
        )
        step = make_mocogan_step(
            model, d_img, d_vid,
            perceptual_loss_weight=1.0 if args.perceptual else 0.0,
            lpips_apply=lpips_apply,
        )

        def run_step(state, batch, step_count, key):
            state, m = step(state, batch, key, lpips_vars)
            return state, (
                f"gen: {float(m['g_loss']):.5f} "
                f"d_img: {float(m['d_img_loss']):.5f} "
                f"d_vid: {float(m['d_vid_loss']):.5f}"
            )

    else:  # vqgan
        from faceoff_tpu.train.vqgan import create_vqgan_state, make_vqgan_steps

        disc = NLayerDiscriminator()
        state = create_vqgan_state(
            gen_state, disc, jax.random.key(args.seed + 2),
            image_hw=args.size, disc_lr=args.disc_lr,
        )
        gen_step, disc_step = make_vqgan_steps(
            model, disc, lpips_apply=lpips_apply
        )

        def run_step(state, batch, step_count, key):
            if step_count % 2 == 0:
                state, m = gen_step(state, batch, lpips_vars)
                return state, f"gen loss: {float(m['g_loss']):.5f}"
            state, m = disc_step(state, batch)
            return state, f"disc loss: {float(m['d_loss']):.5f}"

    # -- the one training loop
    step_count = 0
    done = False
    for epoch in range(args.epoch):
        for batch in loader:
            key = jax.random.key(args.seed * 100003 + step_count)
            batch = {
                k: jnp.asarray(v) for k, v in batch.items()
                if k in ("input", "gt", "frames", "landmarks")
            }
            state, line = run_step(state, batch, step_count, key)
            step_count += 1
            if step_count % 10 == 0:
                print(f"epoch {epoch + 1} step {step_count}; {line}",
                      flush=True)
            if step_count % args.validate_at == 0:
                ckpt.save(step_count, state.gen)
            if args.steps and step_count >= args.steps:
                done = True
                break
        if done:
            break

    ckpt.save(max(step_count, 1), state.gen)
    print(f"done: {step_count} steps; generator checkpoint saved")


if __name__ == "__main__":
    main()
