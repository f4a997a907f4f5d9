"""Shared CLI plumbing: model-size flags + VQVAE construction.

Every inference-side CLI (swap/evaluate/encode) rebuilds the generator
before restoring a checkpoint, so each must accept the same model-size
overrides the training CLIs expose (the reference instead hardcodes
channel=128 etc. in the constructor, models/vqvae_conv3d_latent.py:193-201
— checkpoints of any other size simply cannot be loaded there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from faceoff_tpu.models import VQVAE


def add_model_flags(p) -> None:
    g = p.add_argument_group(
        "model size (must match the trained checkpoint)"
    )
    g.add_argument("--channel", type=int, default=128)
    g.add_argument("--n_res_block", type=int, default=2)
    g.add_argument("--n_res_channel", type=int, default=32)
    g.add_argument("--embed_dim", type=int, default=64)
    g.add_argument("--n_embed", type=int, default=512)
    g.add_argument("--no_pallas", action="store_true",
                   help="use the pure-XLA VQ path even on TPU")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize enc/dec activations in the backward "
                        "(less HBM traffic, more recompute); checkpoints "
                        "are interchangeable with remat off")
    g.add_argument("--remat_scope", choices=["all", "decoder", "encoder"],
                   default="all",
                   help="with --remat: which submodules recompute. "
                        "'decoder' keeps encoder activations and "
                        "recomputes only the full-resolution decode tail "
                        "- the cheaper trade at 512px+")
    g.add_argument("--remat_lpips", action="store_true",
                   help="rematerialize the LPIPS VGG towers in the "
                        "backward. A throughput LOSS at 256px (the "
                        "recompute outweighs the saved traffic) but the "
                        "memory lever that unlocks larger batches at "
                        "512px, where the towers' full-resolution "
                        "activations dominate HBM")


def add_curation_flags(p) -> None:
    """Dataset curation: the reference maintains repo-root JSON lists of
    bad videos (bad_mp4s.json) consumed inside its dataset class
    (reference TemporalAlignment/dataset.py:190-208); here the same list
    is an explicit flag accepted by every dataset-consuming CLI."""
    p.add_argument(
        "--exclude_list", default=None,
        help="JSON file of video directory names/paths to skip "
             "(the reference's bad_mp4s.json role)",
    )


def add_multihost_flags(p) -> None:
    """Explicit process-coordination flags for clusters without
    autodetectable metadata — the role of the reference launcher's
    dist_url / n_machine / machine_rank CLI surface
    (reference distributed/launch.py:22-23, train_faceoff_perceptual.py:
    220-222). Omit them on TPU pods/SLURM where jax autodetects."""
    g = p.add_argument_group("multi-host coordination (with --multihost)")
    g.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (reference dist_url)")
    g.add_argument("--num_processes", type=int, default=None,
                   help="total process count (reference n_machine role)")
    g.add_argument("--process_id", type=int, default=None,
                   help="this process's rank (reference machine_rank)")


def multihost_kwargs(args) -> dict:
    """kwargs for collectives.initialize_distributed from the flags
    (none set -> jax cluster autodetection; a partial set is a
    misconfiguration that must not silently fall back)."""
    flags = {
        "coordinator_address": getattr(args, "coordinator_address", None),
        "num_processes": getattr(args, "num_processes", None),
        "process_id": getattr(args, "process_id", None),
    }
    given = {k: v for k, v in flags.items() if v is not None}
    if given and len(given) != len(flags):
        missing = sorted(set(flags) - set(given))
        raise SystemExit(
            "explicit multi-host coordination needs all three flags; "
            f"missing: {', '.join('--' + m for m in missing)}"
        )
    return given


def build_vqvae(args, in_channels: int = 6) -> VQVAE:
    on_tpu = jax.default_backend() == "tpu"
    return VQVAE(
        in_channels=in_channels,
        channel=args.channel,
        n_res_block=args.n_res_block,
        n_res_channel=args.n_res_channel,
        embed_dim=args.embed_dim,
        n_embed=args.n_embed,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu and not args.no_pallas,
        remat=getattr(args, "remat", False),
        remat_scope=getattr(args, "remat_scope", "all"),
    )
