"""Hierarchical VQVAE-2 generator with Conv3D temporal latent blending.

The flagship model: a two-level VQ-VAE (top latent at stride 8, bottom at
stride 4) whose encoder outputs pass through Conv3D temporal postnets before
quantization, so the discrete latents are blended across frames. Re-designed
TPU-first from the behaviour of reference models/vqvae_conv3d_latent.py:192-295:

  * channels-last NHWC / NTHWC layouts end-to-end — the reference's permute
    dance around Conv3d (vqvae_conv3d_latent.py:247-251) collapses into two
    reshapes (time fold/unfold);
  * bfloat16 activations, float32 params and VQ statistics;
  * the EMA codebooks live in a separate `'vq'` variable collection updated
    functionally during training (apply with `mutable=['vq']`), replacing
    the reference's in-forward buffer mutation + NCCL all_reduce
    (vqvae_conv3d_latent.py:59-75);
  * the nearest-code search can run through the fused Pallas kernel
    (faceoff_tpu/ops/vq_pallas.py).

Input/output videos are (B, T, H, W, C) in [-1, 1]; C=6 for the canonical
(source face || target background) conditioning (reference utils.py:29-38).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from faceoff_tpu.ops import video as video_ops
from faceoff_tpu.ops import vq as vq_ops


class ResBlock(nn.Module):
    """Pre-activation residual block: ReLU > 3x3 conv > ReLU > 1x1 conv + skip
    (reference models/vqvae_conv3d_latent.py:86-101)."""

    channel: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.relu(x)
        h = nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(in_ch, (1, 1), dtype=self.dtype)(h)
        return x + h


class Encoder(nn.Module):
    """Strided conv encoder (reference models/vqvae_conv3d_latent.py:103-131).

    stride=4: two k4s2 convs (x4 downsample); stride=2: one k4s2 conv.
    """

    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.channel
        if self.stride == 4:
            x = nn.Conv(ch // 2, (4, 4), strides=2, padding=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (4, 4), strides=2, padding=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        elif self.stride == 2:
            x = nn.Conv(ch // 2, (4, 4), strides=2, padding=1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, dtype=self.dtype)(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """Conv + res blocks + transposed-conv upsampler
    (reference models/vqvae_conv3d_latent.py:134-166)."""

    out_channel: int
    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.channel
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.stride == 4:
            x = nn.ConvTranspose(
                ch // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype
            )(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(
                self.out_channel, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.dtype,
            )(x)
        elif self.stride == 2:
            x = nn.ConvTranspose(
                self.out_channel, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.dtype,
            )(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        return x


class TemporalPostnet(nn.Module):
    """Conv3D stack blending latents across frames
    (reference models/vqvae_conv3d_latent.py:169-190): N-1 conv+ReLU layers
    plus a final linear conv, all k=3 'same' over (T, H, W)."""

    channels: int
    n_layers: int = 3
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel,) * 3
        for i in range(self.n_layers):
            x = nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype)(x)
            if i < self.n_layers - 1:
                x = nn.relu(x)
        return x


class EmaQuantizer(nn.Module):
    """Linen wrapper holding one EMA codebook in the `'vq'` collection.

    Training (`train=True` with `'vq'` mutable) runs the straight-through
    lookup and advances the EMA state; evaluation only looks up. The
    underlying math is the pure-functional faceoff_tpu.ops.vq.
    """

    embed_dim: int
    n_embed: int
    decay: float = 0.99
    eps: float = 1e-5
    axis_name: Optional[str] = None
    use_pallas: bool = False

    def setup(self):
        def init_state() -> vq_ops.VQCodebook:
            key = self.make_rng("params")
            return vq_ops.init_codebook(key, self.embed_dim, self.n_embed)

        self.codebook_state = self.variable("vq", "codebook", init_state)

    def __call__(
        self, x: jnp.ndarray, *, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        state = self.codebook_state
        codebook = state.value

        if train and self.is_mutable_collection("vq"):
            quant, indices, diff, new_codebook = vq_ops.vq_quantize_train(
                codebook,
                x,
                decay=self.decay,
                eps=self.eps,
                axis_name=self.axis_name,
                use_pallas=self.use_pallas,
            )
            state.value = new_codebook
        else:
            quant, indices, diff = vq_ops.vq_lookup(codebook, x)
        return quant, indices, diff

    def lookup_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        return vq_ops.codebook_lookup(codes, self.codebook_state.value.embed)

    def revive(
        self, x: jnp.ndarray, key: jax.Array, usage_threshold: float = 1e-3
    ) -> None:
        """Re-seed EMA-dead codes from the batch activations `x`
        (requires the 'vq' collection mutable)."""
        if not self.is_mutable_collection("vq"):
            return
        flat = x.astype(jnp.float32).reshape(-1, self.embed_dim)
        self.codebook_state.value = vq_ops.revive_dead_codes(
            self.codebook_state.value, flat, key,
            usage_threshold=usage_threshold,
        )


class VQVAE(nn.Module):
    """Two-level VQVAE-2 with temporal postnets
    (reference models/vqvae_conv3d_latent.py:192-295).

    __call__(video, train) -> (reconstruction, latent_loss)
      video: (B, T, H, W, in_channels) in [-1, 1].
    """

    in_channels: int = 6
    out_channels: Optional[int] = None  # defaults to in_channels
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99
    eps: float = 1e-5
    temporal_postnet_layers: int = 3
    temporal_kernel: int = 3
    commitment_beta: float = 1.0  # scales the commitment (latent) term
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    # rematerialize encoder/decoder/postnet activations in the backward
    # pass: trades recompute FLOPs for HBM traffic — a win when the train
    # step is memory-bound (BENCHMARKS.md roofline). Param structure is
    # unchanged, so checkpoints are interchangeable with remat off.
    remat: bool = False
    # which submodules remat applies to: 'all' (round-3 behaviour),
    # 'decoder' (dec_t/upsample path + final decoder only — keeps the
    # already-computed encoder activations and recomputes just the
    # full-resolution tail, the cheaper trade at large image sizes), or
    # 'encoder' (the mirror choice)
    remat_scope: str = "all"

    def setup(self):
        out_ch = self.out_channels or self.in_channels
        d = self.dtype
        enc_remat = self.remat and self.remat_scope in ("all", "encoder")
        dec_remat = self.remat and self.remat_scope in ("all", "decoder")
        Enc = nn.remat(Encoder) if enc_remat else Encoder
        Dec = nn.remat(Decoder) if dec_remat else Decoder
        Post = nn.remat(TemporalPostnet) if enc_remat else TemporalPostnet
        self.enc_b = Enc(
            self.channel, self.n_res_block, self.n_res_channel, 4, dtype=d
        )
        self.enc_t = Enc(
            self.channel, self.n_res_block, self.n_res_channel, 2, dtype=d
        )
        self.postnet_b = Post(
            self.channel, self.temporal_postnet_layers, self.temporal_kernel, dtype=d
        )
        self.postnet_t = Post(
            self.channel, self.temporal_postnet_layers, self.temporal_kernel, dtype=d
        )
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1), dtype=d)
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1), dtype=d)
        vq_kwargs = dict(
            embed_dim=self.embed_dim,
            n_embed=self.n_embed,
            decay=self.decay,
            eps=self.eps,
            axis_name=self.axis_name,
            use_pallas=self.use_pallas,
        )
        self.quantize_t = EmaQuantizer(**vq_kwargs)
        self.quantize_b = EmaQuantizer(**vq_kwargs)
        self.dec_t = Dec(
            self.embed_dim, self.channel, self.n_res_block, self.n_res_channel,
            2, dtype=d,
        )
        self.upsample_t = nn.ConvTranspose(
            self.embed_dim, (4, 4), strides=(2, 2), padding="SAME", dtype=d
        )
        self.dec = Dec(
            out_ch, self.channel, self.n_res_block, self.n_res_channel, 4, dtype=d
        )

    def only_encode(
        self, video: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-frame 2D encoding (reference :237-241): video (B,T,H,W,C) ->
        (enc_b (B,T,H/4,W/4,ch), enc_t (B,T,H/8,W/8,ch))."""
        b = video.shape[0]
        frames = video_ops.fold_time(video.astype(self.dtype))
        enc_b = self.enc_b(frames)
        enc_t = self.enc_t(enc_b)
        return video_ops.unfold_time(enc_b, b), video_ops.unfold_time(enc_t, b)

    def temporal_blend(
        self, enc_b: jnp.ndarray, enc_t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Conv3D postnets on both levels (reference :247-251)."""
        return self.postnet_b(enc_b), self.postnet_t(enc_t)

    def encode_quantized(self, enc_b: jnp.ndarray, enc_t: jnp.ndarray, *, train: bool):
        """Project to embed_dim and quantize both levels (reference :261-278).

        enc_b/enc_t: (N, h, w, channel) frame-folded. Returns
        (quant_t, quant_b, diff, id_t, id_b).
        """
        qt_in = self.quantize_conv_t(enc_t)
        quant_t, id_t, diff_t = self.quantize_t(qt_in, train=train)

        dec_t = self.dec_t(quant_t)
        qb_in = self.quantize_conv_b(jnp.concatenate([dec_t, enc_b], axis=-1))
        quant_b, id_b, diff_b = self.quantize_b(qb_in, train=train)
        diff = (diff_t + diff_b) * self.commitment_beta
        return quant_t, quant_b, diff, id_t, id_b

    def decode(self, quant_t: jnp.ndarray, quant_b: jnp.ndarray) -> jnp.ndarray:
        """(reference :280-285)"""
        up_t = self.upsample_t(quant_t)
        return self.dec(jnp.concatenate([up_t, quant_b], axis=-1))

    def decode_code(self, code_t: jnp.ndarray, code_b: jnp.ndarray) -> jnp.ndarray:
        """Decode integer code maps (reference :287-295)."""
        quant_t = self.quantize_t.lookup_codes(code_t).astype(self.dtype)
        quant_b = self.quantize_b.lookup_codes(code_b).astype(self.dtype)
        return self.decode(quant_t, quant_b)

    def encode_codes(self, video: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Video -> discrete (code_t, code_b) maps, frame-folded."""
        b = video.shape[0]
        enc_b, enc_t = self.only_encode(video)
        enc_b, enc_t = self.temporal_blend(enc_b, enc_t)
        _, _, _, id_t, id_b = self.encode_quantized(
            video_ops.fold_time(enc_b), video_ops.fold_time(enc_t), train=False
        )
        return id_t, id_b

    def revive_codes(
        self, video: jnp.ndarray, key: jax.Array,
        usage_threshold: float = 1e-3,
    ) -> None:
        """Re-seed dead codebook entries from this batch's pre-VQ latents
        (apply with mutable=['vq']). Dead-code restart is absent from the
        reference — its codebooks can permanently collapse
        (reference models/vqvae_conv3d_latent.py:59-75 only EMA-updates
        codes that win assignments)."""
        enc_b, enc_t = self.only_encode(video)
        enc_b, enc_t = self.temporal_blend(enc_b, enc_t)
        enc_b_f = video_ops.fold_time(enc_b)
        enc_t_f = video_ops.fold_time(enc_t)
        kt, kb = jax.random.split(key)
        qt_in = self.quantize_conv_t(enc_t_f)
        self.quantize_t.revive(qt_in, kt, usage_threshold)
        quant_t, _, _ = self.quantize_t(qt_in, train=False)
        dec_t = self.dec_t(quant_t)
        qb_in = self.quantize_conv_b(
            jnp.concatenate([dec_t, enc_b_f], axis=-1)
        )
        self.quantize_b.revive(qb_in, kb, usage_threshold)

    def __call__(
        self, video: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = video.shape[0]
        enc_b, enc_t = self.only_encode(video)
        enc_b, enc_t = self.temporal_blend(enc_b, enc_t)

        quant_t, quant_b, diff, _, _ = self.encode_quantized(
            video_ops.fold_time(enc_b), video_ops.fold_time(enc_t), train=train
        )
        dec = self.dec(
            jnp.concatenate([self.upsample_t(quant_t), quant_b], axis=-1)
        )
        dec = video_ops.unfold_time(dec, b)
        return dec.astype(jnp.float32), diff.astype(jnp.float32)
