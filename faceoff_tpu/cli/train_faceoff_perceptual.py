"""Canonical trainer CLI: VQVAE-2 + Conv3D latents + LPIPS perceptual loss.

Flag-compatible with the reference entry point
(reference train_faceoff_perceptual.py:210-253):

    python -m faceoff_tpu.cli.train_faceoff_perceptual \
        --data_root /path/to/dataset --batch_size 1 --lr 3e-4 --sched cycle
        [--test] [--crossid] [--custom_validation --validation_folder DIR]
        [--colorjit const|random] [--gray] [--ckpt STEP]

Differences by design: no --n_gpu/--dist_url (a single process drives all
chips through the mesh); --batch_size counts clips per *device*;
checkpoints are orbax directories holding full train state.
"""

from __future__ import annotations

import argparse
import os
import random
import string

import jax
import jax.numpy as jnp

from faceoff_tpu import config as config_lib
from faceoff_tpu.cli import common
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.lpips import init_lpips, resolve_lpips_weights
from faceoff_tpu.parallel import collectives, make_mesh
from faceoff_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from faceoff_tpu.train.state import make_optimizer
from faceoff_tpu.train.trainer import Trainer, run_validation


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--batch_size", type=int, default=1,
                   help="clips per device per step")
    p.add_argument("--size", type=int, default=256, help="image resolution")
    p.add_argument("--epoch", type=int, default=560)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sched", type=str, default="")
    p.add_argument("--validate_at", type=int, default=1024)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint step to resume (or 'latest')")
    p.add_argument("--test", action="store_true")
    p.add_argument("--gray", action="store_true")
    p.add_argument("--colorjit", type=str, default="",
                   help="const or random or empty")
    p.add_argument("--crossid", action="store_true")
    p.add_argument("--custom_validation", action="store_true")
    p.add_argument("--sample_folder", type=str, default="samples")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoint")
    p.add_argument("--validation_folder", type=str, default=None)
    p.add_argument("--train_frames", type=int, default=30)
    p.add_argument("--val_frames", type=int, default=50)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help=".npz from tools/convert_lpips.py, or 'auto' to "
                        "probe standard locations (cwd vgg.pth / "
                        "lpips_weights.npz, $FACEOFF_LPIPS_WEIGHTS, torch "
                        "hub cache) and auto-convert torch checkpoints")
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize enc/dec activations in the backward "
                        "(less HBM traffic, more recompute); checkpoints "
                        "are interchangeable with remat off")
    p.add_argument("--remat_scope", choices=["all", "decoder", "encoder"],
                   default="all",
                   help="with --remat: which submodules recompute "
                        "('decoder' = only the full-resolution decode "
                        "tail; the cheaper trade at 512px+)")
    p.add_argument("--remat_lpips", action="store_true",
                   help="rematerialize the LPIPS VGG towers in the "
                        "backward — the memory lever that unlocks larger "
                        "batches at 512px (a small throughput loss at "
                        "256px)")
    p.add_argument("--device_pipeline", action="store_true",
                   help="run hull/perturb/composite on the accelerator "
                        "(host workers only decode JPEGs)")
    p.add_argument("--resident_data", action="store_true",
                   help="stage the WHOLE decoded corpus into device HBM "
                        "once; clip sampling + geometry fuse into the "
                        "train step (zero per-step host traffic — the "
                        "trainer then runs at the device step rate). "
                        "Implies the on-device geometry of "
                        "--device_pipeline")
    p.add_argument("--resident_max_frames", type=int, default=None,
                   help="cap decoded frames per video when staging the "
                        "resident corpus (HBM guard for long videos)")
    p.add_argument("--resident_hbm_budget_gib", type=float, default=8.0,
                   help="refuse to stage a resident corpus estimated "
                        "above this many GiB (guards against silently "
                        "evicting the model from HBM); on overflow the "
                        "error names the estimate — cap "
                        "--resident_max_frames or fall back to "
                        "--device_pipeline")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help=">1: scan that many optimizer steps per dispatch "
                        "(amortizes launch overhead)")
    p.add_argument("--metrics_path", type=str, default=None,
                   help="append per-step scalars as JSONL")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-15")
    p.add_argument("--stall_timeout", type=float, default=0.0,
                   help="fail fast (exit 117) after this many seconds "
                        "without a completed step — a hung remote "
                        "accelerator client blocks forever otherwise; a "
                        "supervisor restarts with --ckpt latest. Must "
                        "exceed the first cold compile (allow >=1800). "
                        "0 disables")
    p.add_argument("--seed", type=int, default=0)
    # model-size overrides (reference hardcodes channel=128 etc.,
    # models/vqvae_conv3d_latent.py:192-201)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--n_res_block", type=int, default=2)
    p.add_argument("--n_res_channel", type=int, default=32)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--n_embed", type=int, default=512)
    p.add_argument("--multihost", action="store_true",
                   help="multi-host run: jax.distributed.initialize() at "
                        "startup; the train loader shards per process "
                        "(replaces the reference's mp.spawn + NCCL "
                        "rendezvous + DistributedSampler, "
                        "distributed/launch.py:22-92, distributed.py:135-143)")
    common.add_curation_flags(p)
    common.add_multihost_flags(p)
    p.add_argument("--commitment_beta", type=float, default=1.0,
                   help="scales the VQ commitment (latent) term")
    p.add_argument("--revive_every", type=int, default=0,
                   help="re-seed EMA-dead VQ codes every N steps (0 = off)")
    return p


def random_run_name(n: int = 5) -> str:
    """Run-name suffix (reference train_faceoff_perceptual.py:206-208)."""
    return "".join(random.choices(string.ascii_lowercase + string.digits, k=n))


def build_everything(args):
    cfg = config_lib.Config(
        model=config_lib.ModelConfig(
            use_pallas_vq=not args.no_pallas,
            channel=args.channel,
            n_res_block=args.n_res_block,
            n_res_channel=args.n_res_channel,
            embed_dim=args.embed_dim,
            n_embed=args.n_embed,
            commitment_beta=args.commitment_beta,
            remat=args.remat,
            remat_scope=args.remat_scope,
        ),
        data=config_lib.DataConfig(
            data_root=args.data_root,
            resolution=args.size,
            train_frames=args.train_frames,
            val_frames=args.val_frames,
            batch_clips=args.batch_size,
            color_jitter=args.colorjit,
            grayscale=args.gray,
            num_workers=args.num_workers,
        ),
        train=config_lib.TrainConfig(
            lr=args.lr,
            epochs=args.epoch,
            validate_at=args.validate_at,
            sched=args.sched,
            seed=args.seed,
            revive_codes_every=args.revive_every,
            checkpoint_dir=args.checkpoint_dir,
            sample_folder=args.sample_folder,
        ),
    )

    mesh = make_mesh()
    n_dev = mesh.devices.size
    # per-process share of the global batch (the loader already yields a
    # disjoint shard of the DATASET per process; each batch must likewise
    # be this process's local block of the global batch)
    world = collectives.get_world_size()
    local_clips = max(1, args.batch_size * n_dev // world)
    local_val_clips = max(1, n_dev // world)

    on_tpu = jax.default_backend() == "tpu"
    model = VQVAE(
        in_channels=cfg.model.in_channels,
        channel=cfg.model.channel,
        n_res_block=cfg.model.n_res_block,
        n_res_channel=cfg.model.n_res_channel,
        embed_dim=cfg.model.embed_dim,
        n_embed=cfg.model.n_embed,
        decay=cfg.model.vq_decay,
        commitment_beta=cfg.model.commitment_beta,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=cfg.model.use_pallas_vq and on_tpu,
        remat=cfg.model.remat,
        remat_scope=cfg.model.remat_scope,
    )

    train_ds = TemporalAlignmentDataset(
        args.data_root,
        "train",
        cfg.data.train_frames,
        resolution=args.size,
        color_jitter_type=args.colorjit,
        grayscale=args.gray,
        exclude_list=args.exclude_list,
    )
    val_root = args.validation_folder or args.data_root
    val_ds = TemporalAlignmentDataset(
        val_root,
        "val",
        cfg.data.val_frames,
        resolution=args.size,
        color_jitter_type=args.colorjit,
        cross_identity=args.crossid,
        grayscale=args.gray,
        custom_validation_source=(
            args.data_root if args.custom_validation else None
        ),
        exclude_list=args.exclude_list,
    )
    prepare_fn = None
    if args.resident_data:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from faceoff_tpu.data.resident import (
            ResidentBatches,
            build_resident_corpus,
            make_resident_prepare,
        )

        corpus = build_resident_corpus(
            train_ds,
            max_frames_per_video=args.resident_max_frames,
            sharding=NamedSharding(mesh, P()),
            hbm_budget_bytes=int(args.resident_hbm_budget_gib * 2**30),
        )
        print(
            f"resident corpus staged: {corpus.n_videos} videos, "
            f"{corpus.frames.shape[1]} max frames, "
            f"{corpus.nbytes / 2**20:.0f} MiB in HBM", flush=True,
        )
        prepare_fn = make_resident_prepare(
            corpus, local_clips, cfg.data.train_frames,
            color_jitter=args.colorjit, mesh=mesh,
        )
        steps_per_epoch = max(1, len(train_ds) // local_clips)
        train_loader = ResidentBatches(
            corpus, steps_per_epoch, args.steps_per_call,
            clips_per_step=local_clips, clip_len=cfg.data.train_frames,
        )
    elif args.device_pipeline:
        import functools

        from faceoff_tpu.data.device_pipeline import (
            RawClipLoader,
            prepare_train_batch,
        )

        train_loader = RawClipLoader(
            train_ds,
            batch_clips=local_clips,
            num_workers=args.num_workers,
            seed=args.seed,
            shard_index=collectives.get_rank(),
            shard_count=collectives.get_world_size(),
        )
        prepare_fn = functools.partial(
            prepare_train_batch, color_jitter=args.colorjit
        )
    else:
        train_loader = DataLoader(
            train_ds,
            batch_clips=local_clips,
            num_workers=args.num_workers,
            seed=args.seed,
            shard_index=collectives.get_rank(),
            shard_count=collectives.get_world_size(),
        )
    val_loader = DataLoader(
        val_ds, batch_clips=local_val_clips, shuffle=False,
        num_workers=args.num_workers, seed=args.seed,
        shard_index=collectives.get_rank(),
        shard_count=collectives.get_world_size(),
    )

    sample = jnp.zeros(
        (n_dev, 2, args.size, args.size, cfg.model.in_channels), jnp.float32
    )
    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        args.lr, args.sched, n_iter=steps_per_epoch * args.epoch,
        warmup_proportion=0.05,
    )
    state = create_train_state(model, jax.random.key(args.seed), sample, tx=tx)

    lpips_model, lpips_vars = init_lpips(
        jax.random.key(args.seed + 1),
        image_size=args.size,
        weights_npz=resolve_lpips_weights(args.lpips_weights),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)
    if args.remat_lpips:
        lpips_apply = jax.checkpoint(lpips_apply)

    step_kwargs = dict(
        latent_loss_weight=cfg.train.latent_loss_weight,
        perceptual_loss_weight=cfg.train.perceptual_loss_weight,
        lpips_apply=lpips_apply,
        prepare_fn=prepare_fn,
    )
    if args.steps_per_call > 1:
        from faceoff_tpu.train.train_step import make_multi_step

        train_step = make_multi_step(
            model, args.steps_per_call,
            # resident corpus: the scan body reuses ONE constant staged
            # batch (no leading K axis of stacked micro-batches)
            scan_batches=not args.resident_data,
            **step_kwargs,
        )
    else:
        train_step = make_train_step(model, **step_kwargs)
    eval_step = make_eval_step(model)

    trainer = Trainer(
        cfg, model, state, train_step, eval_step, train_loader, val_loader,
        lpips_vars=lpips_vars, mesh=mesh, prepare_fn=prepare_fn,
        metrics_path=args.metrics_path, profile_dir=args.profile_dir,
        steps_per_call=args.steps_per_call,
        stall_timeout=args.stall_timeout,
    )
    return trainer, cfg


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
    if args.multihost:
        # every process must agree on the run dirs (orbax saves and
        # sample writes coordinate across processes): broadcast a RANDOM
        # suffix from process 0 — a seed-derived one made same-seed
        # reruns collide, and orbax silently skips saves at steps below
        # a reused directory's latest checkpoint
        import numpy as _np
        from jax.experimental import multihost_utils

        nonce = multihost_utils.broadcast_one_to_all(
            _np.frombuffer(os.urandom(4), _np.uint32)[0]
        )
        run = "mh" + format(int(nonce), "08x")[:5]
    else:
        run = random_run_name()
    args.sample_folder = f"{args.sample_folder}_{run}"
    args.checkpoint_dir = f"{args.checkpoint_dir}_{run}" if not args.ckpt else args.checkpoint_dir
    print(args, flush=True)

    trainer, cfg = build_everything(args)
    if args.ckpt:
        if args.ckpt == "latest":
            # resume-if-present-else-fresh: lets a supervisor loop ALWAYS
            # pass `--ckpt latest` (first launch trains from scratch; a
            # stall-watchdog restart resumes exactly)
            if trainer.ckpt.latest_step() is None:
                print(
                    f"--ckpt latest: no checkpoint in "
                    f"{trainer.ckpt.directory} yet — training from scratch",
                    flush=True,
                )
            else:
                trainer.resume(None)
        else:
            trainer.resume(int(args.ckpt))

    if args.test:
        run_validation(
            trainer.eval_step,
            trainer.state,
            trainer.val_loader,
            cfg.train.sample_folder,
            epoch=0,
            step=0,
            mesh=trainer.mesh,
        )
    else:
        trainer.fit()


if __name__ == "__main__":
    main()
