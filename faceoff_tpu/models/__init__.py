from faceoff_tpu.models.vqvae import VQVAE, Encoder, Decoder, ResBlock, TemporalPostnet

__all__ = ["VQVAE", "Encoder", "Decoder", "ResBlock", "TemporalPostnet"]
