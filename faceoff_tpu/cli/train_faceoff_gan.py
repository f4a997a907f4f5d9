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
import dataclasses
import os.path as osp

import jax
import jax.numpy as jnp

from faceoff_tpu.cli import common
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.models.discriminators import (
    MultiscaleDiscriminator2D,
    MultiscaleDiscriminator3D,
    NLayerDiscriminator,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
)
from faceoff_tpu.models.lpips import init_lpips, resolve_lpips_weights
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.parallel import (
    collectives,
    make_mesh,
    shard_batch,
    stage_global,
)
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.state import make_optimizer


def _disc_bundle(state) -> dict:
    """Everything in a composite GAN state except the generator — the
    discriminators and their optimizer states, checkpointed alongside the
    generator so adversarial fine-tuning resumes exactly (the reference
    saves disc weights too and reloads them via --load_disc,
    disc_trainers/train_vqvae_mocoganhd_disc_single.py:321-328,
    train_vqvae_mocogan_disc.py:285-289)."""
    return {
        f.name: getattr(state, f.name)
        for f in dataclasses.fields(state)
        if f.metadata.get("pytree_node", True) and f.name != "gen"
    }


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
    p.add_argument("--load_disc", action="store_true",
                   help="with --ckpt: also restore the discriminators + "
                        "their optimizers from <gen_checkpoint_dir>/disc "
                        "(reference --load_disc, "
                        "train_vqvae_mocogan_disc.py:285-289)")
    p.add_argument("--resume", default=None,
                   help="step or 'latest': exact-resume the FULL GAN state "
                        "(generator + discriminators + all optimizers) from "
                        "--checkpoint_dir")
    p.add_argument("--gen_checkpoint_dir", default=None,
                   help="checkpoint dir of the pretrained generator")
    p.add_argument("--checkpoint_dir", default="gan_checkpoint")
    p.add_argument("--sample_folder", default="gan_samples",
                   help="validation mp4 streams are written here at the "
                        "--validate_at cadence (the reference GAN trainers "
                        "dump sample videos the same way)")
    p.add_argument("--metrics_path", default=None,
                   help="append-only JSONL scalar log (one line per step)")
    p.add_argument("--stall_timeout", type=float, default=0.0,
                   help="fail fast (exit 117) after this many seconds "
                        "without a completed step (hung remote accelerator "
                        "client); supervisor restarts with --resume. Must "
                        "exceed the first cold compile. 0 disables")
    p.add_argument("--val_frames", type=int, default=30)
    p.add_argument("--val_batches", type=int, default=2)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--lpips_weights", default=None,
                   help=".npz from tools/convert_lpips.py, or 'auto' to "
                        "probe standard locations and auto-convert torch "
                        "checkpoints")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=None,
                   help="optional cap on total steps (smoke runs); with "
                        "--steps_per_call it rounds up to the next "
                        "dispatch boundary")
    p.add_argument("--device_pipeline", action="store_true",
                   help="run hull/perturb/composite on the accelerator "
                        "(all recipes)")
    p.add_argument("--resident_data", action="store_true",
                   help="stage the whole decoded corpus into device HBM "
                        "once; clip sampling + geometry fuse into the "
                        "gen/disc steps (all recipes; steps_per_call=1 — "
                        "the resident step already fuses input prep, so "
                        "there is no per-step dispatch to amortize)")
    p.add_argument("--resident_max_frames", type=int, default=None,
                   help="cap decoded frames per video when staging the "
                        "resident corpus")
    p.add_argument("--resident_hbm_budget_gib", type=float, default=8.0,
                   help="refuse to stage a resident corpus estimated "
                        "above this many GiB (guards against silently "
                        "evicting the model from HBM); on overflow the "
                        "error names the estimate — cap "
                        "--resident_max_frames or fall back to "
                        "--device_pipeline")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="K alternating gen/disc iterations per dispatch "
                        "via lax.scan (mocoganhd only; even K). Use ONLY "
                        "on dispatch-latency-bound hosts (tunneled/remote "
                        "accelerators): it amortizes launch latency but "
                        "costs ~40%% device throughput (BENCHMARKS.md); "
                        "validation/log cadences quantize to dispatch "
                        "boundaries")
    common.add_model_flags(p)
    p.add_argument("--ndf", type=int, default=64,
                   help="discriminator base width")
    p.add_argument("--disc_noise", type=float, default=0.0,
                   help="mocogan: additive gaussian input-noise sigma for "
                        "the discriminators (reference "
                        "mocogan_discriminator.py:16-25 use_noise; 0=off)")
    p.add_argument("--g2d_weight", type=float, default=0.25,
                   help="mocoganhd: weight on the 2D adversarial generator "
                        "term (reference config.py:9). At the reference "
                        "value the adversarial terms dwarf a small recon "
                        "loss ~80x; lower it when fine-tuning from an "
                        "under-converged generator")
    p.add_argument("--g3d_weight", type=float, default=0.25,
                   help="mocoganhd: weight on the 3D adversarial generator "
                        "term (reference config.py:10)")
    p.add_argument("--img_disc_weight", type=float, default=0.5,
                   help="mocogan: generator-side image-disc weight "
                        "(reference config.py:12)")
    p.add_argument("--vid_disc_weight", type=float, default=0.5,
                   help="mocogan: generator-side video-disc weight "
                        "(reference config.py:13)")
    p.add_argument("--adversarial_start", type=int, default=0,
                   help="mocoganhd: discriminator warmup — zero the "
                        "generator's adversarial terms for this many steps "
                        "of THIS run (taming-style adopt_weight gating; "
                        "fresh discriminators at full weight otherwise "
                        "wreck a warm-started generator's reconstruction)")
    p.add_argument("--adversarial_ramp", type=int, default=0,
                   help="mocoganhd: ramp the adversarial terms linearly "
                        "0->1 over this many steps after "
                        "--adversarial_start instead of switching on at "
                        "full weight (0 = hard switch). Softens the "
                        "post-warmup shock that can still collapse an "
                        "under-converged generator's reconstruction")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host run: jax.distributed.initialize() + "
                        "per-process train-loader sharding")
    common.add_curation_flags(p)
    common.add_multihost_flags(p)
    return p


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    args = build_parser().parse_args(argv)
    # distributed init MUST precede anything that touches the XLA backend
    # — including enable_compilation_cache's jax.default_backend() probe
    # (otherwise jax.distributed.initialize raises and --multihost would
    # silently degrade to per-host single-process training)
    if args.multihost:
        collectives.initialize_distributed(**common.multihost_kwargs(args))
    enable_compilation_cache()
    if args.multihost:
        print(
            f"multihost: process {collectives.get_rank()} of "
            f"{collectives.get_world_size()}", flush=True,
        )
    if args.perceptual and args.sample_frames == 16:
        args.sample_frames = 12  # reference train_vqvae_perceptual_* :164
    print(args, flush=True)

    # batches shard over the 'data' mesh axis (the reference's flagship GAN
    # trainer is multi-GPU DDP, train_vqvae_mocoganhd_disc.py:581-598):
    # each step carries batch_size clips per device
    mesh = make_mesh()
    n_dev = mesh.devices.size
    # per-process share of the global batch (dataset AND batch shard per
    # process in multihost runs)
    world = collectives.get_world_size()
    local_clips = max(1, args.batch_size * n_dev // world)
    local_val_clips = max(1, n_dev // world)

    model = common.build_vqvae(args)

    ds = TemporalAlignmentDataset(
        args.data_root, "train", args.train_frames, resolution=args.size,
        exclude_list=args.exclude_list,
    )
    prepare_fn = None
    if args.steps_per_call > 1 and args.gan != "mocoganhd":
        raise SystemExit("--steps_per_call currently supports "
                         "--gan mocoganhd only")
    if args.steps_per_call > 1 and args.steps_per_call % 2 != 0:
        raise SystemExit("--steps_per_call must be even "
                         "(gen/disc pairs per dispatch)")
    if args.resident_data:
        if args.steps_per_call > 1:
            raise SystemExit("--resident_data supports steps_per_call=1 "
                             "(the resident step already fuses input prep "
                             "— there is no per-step dispatch to amortize)")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from faceoff_tpu.data.resident import (
            ResidentBatches,
            build_resident_corpus,
            make_resident_prepare,
        )

        corpus = build_resident_corpus(
            ds, max_frames_per_video=args.resident_max_frames,
            sharding=NamedSharding(mesh, P()),
            hbm_budget_bytes=int(args.resident_hbm_budget_gib * 2**30),
        )
        print(
            f"resident corpus staged: {corpus.n_videos} videos, "
            f"{corpus.nbytes / 2**20:.0f} MiB in HBM", flush=True,
        )
        prepare_fn = make_resident_prepare(
            corpus, local_clips, args.train_frames, mesh=mesh
        )
        loader = ResidentBatches(
            corpus, max(1, len(ds) // local_clips),
            clips_per_step=local_clips, clip_len=args.train_frames,
        )
    elif args.device_pipeline:
        from faceoff_tpu.data.device_pipeline import (
            RawClipLoader,
            prepare_train_batch,
        )

        loader = RawClipLoader(
            ds, batch_clips=local_clips,
            num_workers=args.num_workers, seed=args.seed,
            shard_index=collectives.get_rank(),
            shard_count=collectives.get_world_size(),
        )
        prepare_fn = prepare_train_batch
    else:
        loader = DataLoader(
            ds, batch_clips=local_clips,
            num_workers=args.num_workers, seed=args.seed,
            shard_index=collectives.get_rank(),
            shard_count=collectives.get_world_size(),
        )

    sample = jnp.zeros(
        (args.batch_size * n_dev, args.train_frames, args.size, args.size, 6),
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

    # LPIPS variables double as the fd_vgg feature extractor for
    # adversarial-quality tracking, so build them unconditionally
    lpips_model, fd_lpips_vars = init_lpips(
        jax.random.key(args.seed + 1), image_size=args.size,
        weights_npz=resolve_lpips_weights(args.lpips_weights),
    )
    lpips_apply = lpips_vars = None
    if args.perceptual or args.gan == "vqgan":
        lpips_vars = fd_lpips_vars
        lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)
        if getattr(args, "remat_lpips", False):
            lpips_apply = jax.checkpoint(lpips_apply)

    ckpt = CheckpointManager(args.checkpoint_dir)

    # build the recipe: a `run_step(state, batch, step_count, key) ->
    # (state, log line)` closure — one loop for all three adversarial
    # recipes instead of the reference's five copy-pasted trainer files
    from faceoff_tpu.train.gan import adv_scale_schedule

    def adv_scale_at(step_count):
        return adv_scale_schedule(
            step_count, start=args.adversarial_start,
            ramp=args.adversarial_ramp,
        )

    multi_step = None
    if args.gan == "mocoganhd":
        from faceoff_tpu.train.gan import (
            create_gan_state,
            make_gan_multi_step,
            make_gan_steps,
        )

        d_img = MultiscaleDiscriminator2D(ndf=args.ndf)
        d_3d = MultiscaleDiscriminator3D(ndf=args.ndf, n_frames=args.sample_frames)
        state = create_gan_state(
            gen_state, d_img, d_3d, jax.random.key(args.seed + 2),
            sample_frames=args.sample_frames, image_hw=args.size,
            disc_lr=args.disc_lr,
        )
        step_kwargs = dict(
            sample_frames=args.sample_frames,
            perceptual_loss_weight=1.0 if args.perceptual else 0.0,
            lpips_apply=lpips_apply, prepare_fn=prepare_fn,
            g_2d_weight=args.g2d_weight, g_3d_weight=args.g3d_weight,
        )
        gen_step, disc_step = make_gan_steps(
            model, d_img, d_3d, **step_kwargs
        )
        if args.steps_per_call > 1:
            multi_step = make_gan_multi_step(
                model, d_img, d_3d, args.steps_per_call, **step_kwargs
            )

        def run_step(state, batch, step_count, key):
            # alternate gen/disc (reference :187-190); metrics stay device
            # scalars — float() reads are deferred to the log cadence
            if step_count % 2 == 0:
                scale = adv_scale_at(step_count)
                state, m = gen_step(state, batch, key, lpips_vars, scale)
                # logged so resume continuity is auditable (and testable):
                # the ramp weight is an absolute-step schedule
                return state, {**m, "adv_scale": scale}
            return disc_step(state, batch, key)

    elif args.gan == "mocogan":
        from faceoff_tpu.train.mocogan import (
            create_mocogan_state,
            make_mocogan_step,
        )

        use_noise = args.disc_noise > 0
        d_img = PatchImageDiscriminator(
            ndf=args.ndf, use_noise=use_noise, noise_sigma=args.disc_noise
        )
        d_vid = PatchVideoDiscriminator(
            ndf=args.ndf, use_noise=use_noise, noise_sigma=args.disc_noise
        )
        state = create_mocogan_state(
            gen_state, d_img, d_vid, jax.random.key(args.seed + 2),
            frames=args.train_frames, image_hw=args.size,
            disc_lr=args.disc_lr,
        )
        step = make_mocogan_step(
            model, d_img, d_vid,
            perceptual_loss_weight=1.0 if args.perceptual else 0.0,
            lpips_apply=lpips_apply,
            image_disc_weight=args.img_disc_weight,
            video_disc_weight=args.vid_disc_weight,
            prepare_fn=prepare_fn,
        )

        def run_step(state, batch, step_count, key):
            return step(state, batch, key, lpips_vars)

    else:  # vqgan
        from faceoff_tpu.train.vqgan import create_vqgan_state, make_vqgan_steps

        disc = NLayerDiscriminator(ndf=args.ndf)
        state = create_vqgan_state(
            gen_state, disc, jax.random.key(args.seed + 2),
            image_hw=args.size, disc_lr=args.disc_lr,
        )
        gen_step, disc_step = make_vqgan_steps(
            model, disc, lpips_apply=lpips_apply, prepare_fn=prepare_fn
        )

        def run_step(state, batch, step_count, key):
            k = key if prepare_fn is not None else None
            if step_count % 2 == 0:
                return gen_step(state, batch, lpips_vars, k)
            return disc_step(state, batch, k)

    # resume paths: --resume restores the FULL adversarial state from this
    # run's checkpoint_dir; --ckpt --load_disc additionally restores the
    # discriminators saved next to a previous GAN run's generator
    disc_ckpt = CheckpointManager(osp.join(args.checkpoint_dir, "disc"))
    step0 = 0
    if args.resume == "latest" and ckpt.latest_step() is None:
        # resume-if-present-else-fresh: a supervisor loop can ALWAYS pass
        # --resume latest; the first launch falls through to the warm-start
        # path (--ckpt/--load_disc) or a fresh state
        print("--resume latest: no checkpoint yet — starting fresh",
              flush=True)
        args.resume = None
    if args.resume is not None:
        step = (
            ckpt.latest_step() if args.resume == "latest" else int(args.resume)
        )
        gen = ckpt.restore(state.gen, step)
        bundle = disc_ckpt.restore(_disc_bundle(state), step)
        state = state.replace(gen=gen, **bundle)
        step0 = int(step)
        print(f"resumed full GAN state @ step {step0}", flush=True)
    elif args.ckpt is not None and args.load_disc:
        src_dir = args.gen_checkpoint_dir or args.checkpoint_dir
        src_disc = CheckpointManager(osp.join(src_dir, "disc"))
        step = None if args.ckpt == "latest" else int(args.ckpt)
        bundle = src_disc.restore(_disc_bundle(state), step)
        state = state.replace(**bundle)
        print(f"discriminators restored from {src_dir}/disc", flush=True)

    # validation: reconstruction eval + the mp4 sample streams, same
    # machinery as the perceptual trainer (the reference GAN trainers dump
    # sample videos at cadence too)
    from faceoff_tpu.train.train_step import make_eval_step
    from faceoff_tpu.train.trainer import run_validation
    from faceoff_tpu.train.observability import (
        MetricsWriter,
        PreemptionGuard,
        StallWatchdog,
    )

    eval_step = make_eval_step(model)
    val_ds = TemporalAlignmentDataset(
        args.data_root, "val", args.val_frames, resolution=args.size,
        exclude_list=args.exclude_list,
    )
    val_loader = DataLoader(
        val_ds, batch_clips=local_val_clips, shuffle=False, num_workers=2,
        seed=args.seed,
        shard_index=collectives.get_rank(),
        shard_count=collectives.get_world_size(),
    )
    metrics_writer = (
        MetricsWriter(args.metrics_path) if args.metrics_path else None
    )
    preemption = PreemptionGuard()
    watchdog = StallWatchdog(args.stall_timeout)

    def save_all(step_count):
        # EVERY process calls orbax save: its multi-controller sync would
        # deadlock a primary-only call; orbax itself coordinates writes
        ckpt.save(step_count, state.gen)
        disc_ckpt.save(step_count, _disc_bundle(state))

    from faceoff_tpu.evaluation import make_fd_video_features

    fd_feats, fd_finalize = make_fd_video_features(fd_lpips_vars)

    def validate(epoch, step_count):
        run_validation(
            eval_step, state.gen, val_loader, args.sample_folder,
            epoch, step_count, mesh=mesh, max_batches=args.val_batches,
        )
        # adversarial-quality proxies the reference lacks entirely:
        # Fréchet distances between real and generated clips in VGG
        # feature space — fd_vgg (per-frame appearance) + fd_vgg_motion
        # (frame-difference features, the FVD temporal-coherence role).
        # Features accumulate over ALL --val_batches batches before the
        # stats are computed (single-batch Fréchet stats are too noisy).
        chunks = []
        for bi, batch in enumerate(val_loader):
            if bi >= args.val_batches:
                break
            # stage onto the global mesh (per-process local shards in
            # multihost runs; plain device_put otherwise)
            b = shard_batch(
                {k: batch[k] for k in ("input", "gt")}, mesh
            )
            out, _ = eval_step(state.gen, b)
            chunks.append(fd_feats(b["gt"], out))
        fd_vals = {k: float(v) for k, v in fd_finalize(chunks).items()}
        print(
            " ".join(f"{k}: {v:.4f}" for k, v in fd_vals.items()),
            flush=True,
        )
        if metrics_writer is not None:
            metrics_writer.write(step_count, fd_vals, epoch=epoch)
            metrics_writer.flush()
        save_all(step_count)

    # -- the one training loop
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_count = step0
    pending = []  # (step, device-scalar metrics) — host reads at log cadence
    done = False
    spc = args.steps_per_call if multi_step is not None else 1
    acc = []  # microbatch accumulator for steps_per_call > 1
    last_log = last_val = step0
    stacked_sharding = NamedSharding(mesh, P(None, "data"))
    # ONE constant base key for the whole run: the jitted steps fold in the
    # on-device generator step counter, so per-step host key construction
    # (a device dispatch each on a tunneled accelerator) is unnecessary
    base_key = jax.random.key(args.seed * 100003)
    base_keys = (
        jax.random.split(base_key, spc) if spc > 1 else None
    )
    # absolute budget (mirrors Trainer.fit): --epoch counts TOTAL epochs
    # for the run INCLUDING progress restored by --resume, so a
    # stall-watchdog retry with --resume latest finishes the original
    # budget instead of appending a whole fresh one (each loader batch is
    # one optimizer step; a <spc tail per run stays untrained, same as
    # the perceptual trainer's _batch_stream remainder policy)
    steps_per_epoch = max(len(loader), 1)
    step_budget = args.epoch * steps_per_epoch

    def _delivered(e):
        # optimizer steps actually delivered by `e` full epochs: with
        # --steps_per_call K the microbatch accumulator carries ACROSS
        # epoch boundaries, so e epochs of e*spe loader batches train
        # floor(e*spe/K)*K steps — crediting resumed progress against the
        # raw e*spe would under-count finished epochs and re-run them
        # (the hazard trainer.py fit() fixes for the perceptual path)
        if spc <= 1:
            return e * steps_per_epoch
        return (e * steps_per_epoch // spc) * spc

    start_epoch = 0
    # `<= step0` (not <) also absorbs the +1 odd-resume alignment step
    while start_epoch < args.epoch and _delivered(start_epoch + 1) <= step0:
        start_epoch += 1
    if start_epoch:
        print(
            f"resume at step {step0}: {start_epoch}/{args.epoch} epochs "
            f"already done (budget {step_budget} steps)", flush=True,
        )
    for epoch in range(start_epoch, args.epoch):
        for batch in loader:
            batch = {
                k: v for k, v in batch.items()
                if k in ("input", "gt", "frames", "landmarks")
            }
            if spc > 1:
                if step_count % 2 == 1 and not acc:
                    # align to the gen/disc pair boundary (odd resume):
                    # one plain disc step, then scan pairs
                    state, m = run_step(
                        state, shard_batch(batch, mesh), step_count, base_key
                    )
                    step_count += 1
                    pending.append((step_count, epoch, m))
                # K alternating gen/disc iterations per dispatch: stack K
                # microbatches (clips still shard over 'data' on axis 1)
                else:
                    acc.append(batch)
                    if len(acc) < spc:
                        continue
                    stacked = {
                        k: np.stack([b[k] for b in acc]) for k in acc[0]
                    }
                    acc = []
                    sharded = jax.tree_util.tree_map(
                        lambda x: stage_global(x, stacked_sharding),
                        stacked,
                    )
                    state, seq_m = multi_step(
                        state, sharded, base_keys, lpips_vars,
                        adv_scale_at(step_count),
                    )
                    for j in range(spc):
                        part = "gen" if j % 2 == 0 else "disc"
                        m_j = {
                            k: v[j // 2] for k, v in seq_m[part].items()
                        }
                        step_count += 1
                        pending.append((step_count, epoch, m_j))
            else:
                if not args.resident_data:
                    # resident batches are already staged (replicated) on
                    # the mesh; sharding the corpus over 'data' would both
                    # copy it and force cross-chip gathers per step
                    batch = shard_batch(batch, mesh)
                state, m = run_step(state, batch, step_count, base_key)
                step_count += 1
                pending.append((step_count, epoch, m))
            watchdog.beat()
            log_now = step_count - last_log >= args.log_every
            if log_now:
                last_log = step_count
                # start every device->host copy asynchronously first: on a
                # high-latency link N sequential float() reads cost N round
                # trips, async-then-read costs ~1
                for _, _, pm in pending:
                    for v in pm.values():
                        if hasattr(v, "copy_to_host_async"):
                            v.copy_to_host_async()
                for s, e, pm in pending:
                    vals = {k: float(v) for k, v in pm.items()}
                    if metrics_writer is not None:
                        metrics_writer.write(s, vals, epoch=e)
                line = " ".join(f"{k}: {v:.5f}" for k, v in vals.items())
                print(f"epoch {epoch + 1} step {step_count}; {line}",
                      flush=True)
                pending.clear()
                if metrics_writer is not None:
                    metrics_writer.flush()
            # multihost: stop by consensus at the aligned log cadence
            # (per-process signals + all-process orbax saves would
            # otherwise deadlock the checkpoint barrier)
            stop_req = (
                preemption.should_stop if world == 1
                else (preemption.should_stop_global() if log_now else False)
            )
            if stop_req:
                print("preemption: saving full GAN state", flush=True)
                save_all(step_count)
                done = True
                break
            if step_count - last_val >= args.validate_at:
                last_val = step_count
                validate(epoch, step_count)
            if step_count >= step_budget or (
                args.steps and step_count >= args.steps
            ):
                done = True
                break
        if done:
            break

    if acc:
        print(
            f"note: {len(acc)} accumulated microbatch(es) below the "
            f"--steps_per_call={spc} dispatch size were not trained",
            flush=True,
        )
    pending.clear()
    watchdog.stop()
    save_all(max(step_count, 1))
    if metrics_writer is not None:
        metrics_writer.close()
    print(f"done: {step_count} steps; full GAN state saved "
          f"(generator in {args.checkpoint_dir}, discriminators in "
          f"{args.checkpoint_dir}/disc)")


if __name__ == "__main__":
    main()
