"""Trainer CLI for the alignment-regression network.

The reference ships the alignment data mode — dataset items whose targets
are the negated applied perturbation amounts (reference
TemporalAlignment/dataset.py:377-397) — but no model or trainer consumes
it. This CLI completes the path: AlignmentNet regresses the inverse
(rotation deg, tx px, ty px) from the (perturbed face ‖ background)
composite, trained with MSE (faceoff_tpu/train/alignment.py).

    python -m faceoff_tpu.cli.train_alignment --data_root DATA \
        [--steps N] [--size 256] [--frames 8] [--checkpoint_dir CKPT]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.models.alignment import AlignmentNet
from faceoff_tpu.train.alignment import (
    create_alignment_state,
    make_alignment_step,
)
from faceoff_tpu.train.observability import MetricsWriter


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--steps", type=int, default=None,
                   help="optional hard cap on total steps")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint_dir", default="alignment_checkpoint")
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--metrics_path", default=None)
    p.add_argument("--widths", type=int, nargs="+",
                   default=[32, 64, 128, 128])
    return p


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    model = AlignmentNet(
        widths=tuple(args.widths),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    ds = TemporalAlignmentDataset(
        args.data_root, "train", args.frames, resolution=args.size,
        alignment=True,
    )
    loader = DataLoader(
        ds, batch_clips=args.batch_size, num_workers=args.num_workers,
        seed=args.seed,
    )
    state = create_alignment_state(
        model, jax.random.key(args.seed),
        jnp.zeros((args.batch_size, args.size, args.size, 6)),
        lr=args.lr,
    )
    step = make_alignment_step(model)
    ckpt = CheckpointManager(args.checkpoint_dir)
    writer = MetricsWriter(args.metrics_path) if args.metrics_path else None

    step_count = 0
    done = False
    for epoch in range(args.epoch):
        for batch in loader:
            b = {
                "input": jnp.asarray(batch["input"]),
                "transforms": jnp.asarray(batch["transforms"]),
            }
            state, m = step(state, b)
            step_count += 1
            if step_count % args.log_every == 0:
                vals = {k: float(v) for k, v in m.items()}
                print(
                    f"epoch {epoch + 1} step {step_count}; "
                    + " ".join(f"{k}: {v:.4f}" for k, v in vals.items()),
                    flush=True,
                )
                if writer is not None:
                    writer.write(step_count, vals, epoch=epoch)
                    writer.flush()
            if step_count % args.save_every == 0:
                ckpt.save(step_count, state)
            if args.steps and step_count >= args.steps:
                done = True
                break
        if done:
            break

    ckpt.save(max(step_count, 1), state)
    if writer is not None:
        writer.close()
    print(f"done: {step_count} steps; checkpoint in {args.checkpoint_dir}")


if __name__ == "__main__":
    main()
