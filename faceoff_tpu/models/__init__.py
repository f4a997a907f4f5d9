from faceoff_tpu.models.vqvae import VQVAE, Encoder, Decoder, ResBlock, TemporalPostnet
from faceoff_tpu.models.vqvae_b2f import VQVAE_B2F
from faceoff_tpu.models.alignment import AlignmentNet
from faceoff_tpu.models.lpips import LPIPS, init_lpips

__all__ = [
    "VQVAE",
    "VQVAE_B2F",
    "AlignmentNet",
    "LPIPS",
    "init_lpips",
    "Encoder",
    "Decoder",
    "ResBlock",
    "TemporalPostnet",
]
