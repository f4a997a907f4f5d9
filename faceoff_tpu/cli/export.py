"""Export a trained checkpoint as a self-contained serving bundle
(StableHLO via jax.export) — deployment without model code.

    python -m faceoff_tpu.cli.export \
        --checkpoint_dir runs/ckpt --out bundle/ --size 256 --frames 8 \
        [--platforms tpu cpu] [--no_streaming]

The bundle holds the offline (chunked) swap forward and the streaming
per-frame primitives with the trained weights baked into the lowered
programs. Load with `faceoff_tpu.serve.export.load_bundle(dir)` — no
flax / model class / checkpoint plumbing needed in the serving process
(the reference's only deployment path is re-running the torch module
against a .pt state_dict, train_faceoff_perceptual.py:178-185).
"""

from __future__ import annotations

import argparse

from faceoff_tpu.cli import common


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--ckpt", default=None, help="step (default latest)")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=8,
                   help="offline chunk length (frames per call)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering targets, e.g. --platforms tpu cpu "
                        "(default: current backend)")
    p.add_argument("--no_streaming", action="store_true",
                   help="skip the streaming push/flush exports")
    common.add_model_flags(p)
    return p


def main(argv=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from faceoff_tpu.io.checkpoint import CheckpointManager
    from faceoff_tpu.serve.export import save_bundle
    from faceoff_tpu.train import create_train_state

    args = build_parser().parse_args(argv)

    # same backend-conditioned dtype as every other inference CLI, but
    # always the portable XLA VQ path: pallas custom-calls do not lower
    # cross-platform
    model = dataclasses.replace(common.build_vqvae(args), use_pallas=False)
    sample = jnp.zeros(
        (1, args.frames, args.size, args.size, 6), jnp.float32
    )
    state = create_train_state(model, jax.random.key(0), sample)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore_weights(
        state, None if args.ckpt in (None, "latest") else int(args.ckpt)
    )
    print(f"restored checkpoint step {int(state.step)}")

    variables = {"params": state.params, "vq": state.vq}
    meta = save_bundle(
        args.out, model, variables,
        frames=args.frames, size=args.size, batch=args.batch,
        streaming=not args.no_streaming, platforms=args.platforms,
    )
    print(f"bundle -> {args.out} (platforms: {meta['platforms']})")


if __name__ == "__main__":
    main()
