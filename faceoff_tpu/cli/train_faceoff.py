"""Vanilla trainer CLI: MSE + latent loss only, no LPIPS.

Working equivalent of the reference's stale `train_faceoff.py` entry point
(reference train_faceoff.py; stale against the current factory per SURVEY
§3.6) — same flags as the perceptual trainer, perceptual weight forced to
zero, restored behind the one coherent factory:

    python -m faceoff_tpu.cli.train_faceoff --data_root DATA ...
"""

from __future__ import annotations

from faceoff_tpu.cli import train_faceoff_perceptual as base


def main(argv=None):
    args = base.build_parser().parse_args(argv)
    run = base.random_run_name()
    args.sample_folder = f"{args.sample_folder}_{run}"
    if not args.ckpt:
        args.checkpoint_dir = f"{args.checkpoint_dir}_{run}"
    print(args, flush=True)

    trainer, cfg = base.build_everything(args)

    # drop the LPIPS term: rebuild the train step with weight 0 and no
    # VGG forward at all (cheaper than weighting it out)
    from faceoff_tpu.train import make_train_step

    trainer.train_step = make_train_step(
        trainer.model,
        latent_loss_weight=cfg.train.latent_loss_weight,
        perceptual_loss_weight=0.0,
        lpips_apply=None,
    )
    trainer.lpips_vars = None

    if args.ckpt:
        if args.ckpt == "latest":
            if trainer.ckpt.latest_step() is None:  # supervisor-friendly:
                print("--ckpt latest: no checkpoint yet — training from "
                      "scratch", flush=True)
            else:
                trainer.resume(None)
        else:
            trainer.resume(int(args.ckpt))

    if args.test:
        from faceoff_tpu.train.trainer import run_validation

        run_validation(
            trainer.eval_step, trainer.state, trainer.val_loader,
            cfg.train.sample_folder, epoch=0, step=0, mesh=trainer.mesh,
        )
    else:
        trainer.fit()


if __name__ == "__main__":
    main()
