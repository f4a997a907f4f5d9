"""VQVAE_B2F — blob2full: three-stream VQVAE with a shared decoder.

Port of the reference's legacy sign-language variant
(reference models/vqvae_conv3d_latent.py:297-437): separate
encode+quantize towers for face / right hand / left hand whose quantized
latents are summed and decoded by one shared decoder. Kept for component
parity; not wired into the canonical trainers (the reference's isn't
either, SURVEY §2 item 4).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from faceoff_tpu.models.vqvae import Decoder, EmaQuantizer, Encoder


class EncodeTower(nn.Module):
    """One stream: enc_b/enc_t -> quantize_t -> dec_t -> quantize_b
    (reference models/vqvae_conv3d_latent.py:301-341)."""

    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    def setup(self):
        d = self.dtype
        self.enc_b = Encoder(
            self.channel, self.n_res_block, self.n_res_channel, 4, dtype=d
        )
        self.enc_t = Encoder(
            self.channel, self.n_res_block, self.n_res_channel, 2, dtype=d
        )
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1), dtype=d)
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1), dtype=d)
        vq_kwargs = dict(
            embed_dim=self.embed_dim, n_embed=self.n_embed, decay=self.decay,
            axis_name=self.axis_name,
        )
        self.quantize_t = EmaQuantizer(**vq_kwargs)
        self.quantize_b = EmaQuantizer(**vq_kwargs)
        self.dec_t = Decoder(
            self.embed_dim, self.channel, self.n_res_block,
            self.n_res_channel, 2, dtype=d,
        )

    def __call__(self, x: jnp.ndarray, *, train: bool):
        enc_b = self.enc_b(x.astype(self.dtype))
        enc_t = self.enc_t(enc_b)
        quant_t, _, diff_t = self.quantize_t(
            self.quantize_conv_t(enc_t), train=train
        )
        dec_t = self.dec_t(quant_t)
        qb_in = self.quantize_conv_b(jnp.concatenate([dec_t, enc_b], axis=-1))
        quant_b, _, diff_b = self.quantize_b(qb_in, train=train)
        return quant_t, quant_b, diff_t + diff_b


class VQVAE_B2F(nn.Module):
    """Three-stream blob2full model (reference :343-428).

    __call__((face, rhand, lhand), train) -> (reconstruction, latent_loss);
    each input (N, H, W, C) frame-folded.
    """

    in_channels: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    def setup(self):
        tower = dict(
            channel=self.channel, n_res_block=self.n_res_block,
            n_res_channel=self.n_res_channel, embed_dim=self.embed_dim,
            n_embed=self.n_embed, decay=self.decay, dtype=self.dtype,
            axis_name=self.axis_name,
        )
        self.encode_face = EncodeTower(**tower)
        self.encode_rhand = EncodeTower(**tower)
        self.encode_lhand = EncodeTower(**tower)
        self.upsample_t = nn.ConvTranspose(
            self.embed_dim, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype,
        )
        self.dec = Decoder(
            self.in_channels, self.channel, self.n_res_block,
            self.n_res_channel, 4, dtype=self.dtype,
        )

    def __call__(
        self, inputs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        *, train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        face, rhand, lhand = inputs
        qt_f, qb_f, d_f = self.encode_face(face, train=train)
        qt_r, qb_r, d_r = self.encode_rhand(rhand, train=train)
        qt_l, qb_l, d_l = self.encode_lhand(lhand, train=train)

        quant_t = qt_f + qt_r + qt_l
        quant_b = qb_f + qb_r + qb_l
        diff = d_f + d_r + d_l

        up_t = self.upsample_t(quant_t)
        dec = self.dec(jnp.concatenate([up_t, quant_b], axis=-1))
        return dec.astype(jnp.float32), diff.astype(jnp.float32)
