"""faceoff_tpu — a TPU-native video face-swapping framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the FaceOff
video-to-video face swapping system (WACV 2023): a hierarchical VQVAE-2 with
Conv3D temporal latent blending, trained self-supervised on perturbed face
composites, with LPIPS perceptual and GAN fine-tuning stages.

Design notes (TPU-first, not a port):
  * All image tensors are channels-last (N, H, W, C) / video (B, T, H, W, C);
    2D convolution stages fold time into the batch axis, the temporal modules
    unfold it back — this keeps every conv MXU-shaped.
  * Compute runs in bfloat16 with float32 parameters and float32 VQ/EMA
    statistics.
  * Scaling is mesh-based: `jax.jit` over a `jax.sharding.Mesh` with explicit
    shardings; XLA inserts the gradient/codebook-statistics collectives that
    the reference performed manually with NCCL all_reduce.
  * The vector-quantization hot path (distance + argmin + codebook stats) has
    a fused Pallas TPU kernel with a pure-XLA fallback.
"""

__version__ = "0.1.0"

from faceoff_tpu import config as config

__all__ = ["config", "__version__"]
