"""Single structured config for the whole framework.

The reference scatters configuration over three tiers: per-trainer argparse
(reference train_faceoff_perceptual.py:211-238), module constants
(reference config.py:1-18) and hardcoded cluster paths. Here everything is
one dataclass tree; CLI entry points parse flags into it.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """VQVAE-2 generator hyperparameters.

    Defaults mirror the reference operating point
    (reference models/vqvae_conv3d_latent.py:192-235): 6-channel input
    (source face || background), channel 128, two res blocks of width 32,
    two 512-code x 64-dim EMA codebooks with decay 0.99.
    """

    in_channels: int = 6
    out_channels: int = 6
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    vq_decay: float = 0.99
    vq_eps: float = 1e-5
    commitment_beta: float = 1.0  # scales the commitment (latent) term
    # backward-pass rematerialization of enc/dec activations (HBM traffic
    # vs recompute); pure execution-plan change, checkpoint-compatible
    remat: bool = False
    # which submodules --remat recomputes: 'all', 'decoder' (full-res
    # decode tail only), or 'encoder'
    remat_scope: str = "all"
    temporal_postnet_layers: int = 3  # Conv3D stack depth per level
    temporal_kernel: int = 3
    use_pallas_vq: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration.

    Perturbation magnitudes follow the reference
    (reference TemporalAlignment/ranges.py:1-3 and perturbations.py:208-264):
    +/-3 px translation, +/-3 deg rotation about the eye centre, 90-110 %
    scale, arc/barrel/inverse-barrel radial distortions; at least one
    perturbation per frame.
    """

    data_root: str = ""
    resolution: int = 256
    train_frames: int = 30  # reference utils.py:55-58
    val_frames: int = 50  # reference utils.py:60-66
    batch_clips: int = 1  # clips per device per step
    translation_range: int = 3
    rotation_range: float = 3.0
    scale_range: Tuple[int, int] = (90, 110)
    arc_max_deg: float = 30.0
    mask_enlargement: int = 10
    color_jitter: str = ""  # '', 'const' or 'random' (reference --colorjit)
    grayscale: bool = False
    num_workers: int = 8
    prefetch: int = 2
    # Landmark layout contract: 68-point iBUG; jaw excluded for hull masks.
    hull_start: int = 17
    hull_end: int = 67
    stable_points: Tuple[int, ...] = (33, 36, 39, 42, 45)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization configuration (reference train_faceoff_perceptual.py:224-238
    and config.py:4-18)."""

    lr: float = 3e-4
    epochs: int = 560
    validate_at: int = 1024
    sched: str = ""  # '' or 'cycle'
    latent_loss_weight: float = 1.0
    perceptual_loss_weight: float = 1.0
    # GAN stage weights (reference config.py:9-15)
    g_loss_2d_weight: float = 0.25
    g_loss_3d_weight: float = 0.25
    image_disc_weight: float = 0.5
    video_disc_weight: float = 0.5
    d_loss_weight: float = 0.1
    disc_lr: float = 3e-4
    disc_frames: int = 16  # discriminator clip window
    seed: int = 0
    revive_codes_every: int = 0  # 0 = off; else re-seed dead VQ codes
    checkpoint_dir: str = "checkpoints"
    sample_folder: str = "samples"
    keep_checkpoints: int = 5


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. `data` shards clips (DP); `time` optionally shards
    the frame axis for long clips (sequence parallelism with a halo exchange
    around the k=3 Conv3D receptive field)."""

    data: int = -1  # -1: all devices
    time: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def default_config() -> Config:
    return Config()
