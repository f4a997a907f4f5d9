"""Tokenizer CLI: encode videos to discrete VQ codes and decode them back.

Exposes the model's discrete-latent API (`encode_codes` / `decode_code`,
reference models/vqvae_conv3d_latent.py:261-295) as a tool: write the
(T, h, w) top/bottom code maps for downstream latent modeling, or
round-trip them to a reconstruction video.

    python -m faceoff_tpu.cli.encode --video_dir DIR \
        --checkpoint_dir CKPT --out codes.npz [--decode recon.mp4]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.data.dataset import (
    _landmark_paths,
    denormalize,
    load_window_frames,
)
from faceoff_tpu.cli import common
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.io.video import save_frames_as_video
from faceoff_tpu.train import create_train_state


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_dir", required=True,
                   help="preprocessed video dir (frames + landmarks)")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="codes.npz")
    p.add_argument("--decode", default=None,
                   help="also decode the codes back to an mp4")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--max_frames", type=int, default=32)
    p.add_argument("--fps", type=int, default=25)
    common.add_model_flags(p)
    args = p.parse_args(argv)

    paths = _landmark_paths(args.video_dir)[: args.max_frames]
    if not paths:
        raise SystemExit(f"no frames with landmarks under {args.video_dir}")
    frames, _ = load_window_frames(paths, args.size)
    video = jnp.asarray(frames, jnp.float32)[None] / 127.5 - 1.0
    # the tokenizer consumes 6-channel (face ‖ background) composites; for
    # plain video tokenization feed the frame into both halves
    video6 = jnp.concatenate([video, video], axis=-1)

    model = common.build_vqvae(args)
    state = create_train_state(model, jax.random.key(0), video6)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore_weights(
        state, None if args.ckpt in (None, "latest") else int(args.ckpt)
    )
    variables = {"params": state.params, "vq": state.vq}

    id_t, id_b = jax.jit(
        lambda v: model.apply(variables, v, method=model.encode_codes)
    )(video6)
    np.savez(
        args.out,
        codes_top=np.asarray(id_t),
        codes_bottom=np.asarray(id_b),
    )
    print(
        f"wrote {args.out}: top {tuple(id_t.shape)} bottom "
        f"{tuple(id_b.shape)} ({model.n_embed}-way codes)"
    )

    if args.decode:
        dec = jax.jit(
            lambda t, b: model.apply(
                variables, t, b, method=model.decode_code
            )
        )(id_t, id_b)
        recon = np.asarray(dec)[..., :3]
        save_frames_as_video(
            [denormalize(f) for f in recon], args.decode, fps=args.fps
        )
        print(f"wrote {args.decode} ({recon.shape[0]} frames)")


if __name__ == "__main__":
    main()
