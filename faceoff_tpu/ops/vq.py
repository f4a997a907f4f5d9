"""Pure-functional EMA vector quantization.

Implements the VQ-VAE codebook with exponential-moving-average updates
(van den Oord et al., sonnet-style), matching the math of the reference
quantizer (reference models/vqvae_conv3d_latent.py:33-83) but as pure
functions over an explicit `VQCodebook` pytree instead of mutable nn
buffers:

  * nearest-codebook assignment by squared L2 distance,
  * straight-through estimator for the encoder gradient,
  * EMA updates of cluster counts and code sums with Laplace smoothing,
  * cross-device reduction of the statistics.

Cross-device behaviour: the reference all_reduces `embed_onehot_sum` /
`embed_sum` over NCCL inside the forward pass (reference
models/vqvae_conv3d_latent.py:60-64). Here the statistics are computed over
the *global* batch: under `jax.jit` with sharded inputs XLA inserts the
all-reduce automatically; under `shard_map`/`pmap` pass `axis_name` and the
reduction is an explicit `lax.psum` over ICI.

All statistics are float32 regardless of the activation dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class VQCodebook(NamedTuple):
    """EMA codebook state for one quantizer level.

    embed:        (dim, n_embed) float32 — current codebook.
    cluster_size: (n_embed,)     float32 — EMA of per-code assignment counts.
    embed_avg:    (dim, n_embed) float32 — EMA of per-code input sums.
    """

    embed: jnp.ndarray
    cluster_size: jnp.ndarray
    embed_avg: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.embed.shape[0]

    @property
    def n_embed(self) -> int:
        return self.embed.shape[1]


def init_codebook(key: jax.Array, dim: int, n_embed: int) -> VQCodebook:
    """Random-normal codebook; EMA average starts at the codebook itself."""
    embed = jax.random.normal(key, (dim, n_embed), jnp.float32)
    return VQCodebook(
        embed=embed,
        cluster_size=jnp.zeros((n_embed,), jnp.float32),
        # distinct buffer (donation-safe), same values as the codebook —
        # the reference clones too (models/vqvae_conv3d_latent.py:45)
        embed_avg=embed + 0.0,
    )


def nearest_code(flat: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook index per row.

    flat: (N, dim), embed: (dim, n_embed) -> (N,) int32.

    argmin_j ||x - e_j||^2 == argmax_j (x . e_j - 0.5 ||e_j||^2); the ||x||^2
    term is constant per row so it is dropped. The score is one MXU matmul.
    """
    f32 = flat.astype(jnp.float32)
    e = embed.astype(jnp.float32)
    scores = jnp.dot(f32, e, preferred_element_type=jnp.float32)
    scores -= 0.5 * jnp.sum(e * e, axis=0)[None, :]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def codebook_lookup(indices: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Embed indices: (...,) int -> (..., dim)."""
    return jnp.take(embed.T, indices, axis=0)


def vq_lookup(
    codebook: VQCodebook, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize activations with a straight-through gradient.

    x: (..., dim) activations. Returns (quantized, indices, diff) where
    `quantized` carries the identity gradient back to `x` and `diff` is the
    commitment term mean((sg(q) - x)^2) (reference
    models/vqvae_conv3d_latent.py:77-78).
    """
    dim = codebook.dim
    flat = x.reshape(-1, dim)
    indices = nearest_code(flat, codebook.embed)
    indices = indices.reshape(x.shape[:-1])
    quant = codebook_lookup(indices, codebook.embed).astype(x.dtype)
    x32 = x.astype(jnp.float32)
    diff = jnp.mean(
        (jax.lax.stop_gradient(quant.astype(jnp.float32)) - x32) ** 2
    )
    quant = x + jax.lax.stop_gradient(quant - x)
    return quant, indices, diff


def vq_stats(
    flat: jnp.ndarray, indices: jnp.ndarray, n_embed: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assignment statistics for the EMA update.

    flat: (N, dim), indices: (N,) -> (cluster counts (n_embed,),
    per-code input sums (dim, n_embed)), both float32. The sums are one
    matmul over the one-hot assignment matrix — MXU-friendly, mirroring
    `flatten.T @ embed_onehot` (reference models/vqvae_conv3d_latent.py:60-61).
    """
    # the one-hot matmul runs in the INPUT dtype (bf16 on TPU): one-hot
    # values are exact in any float dtype and the accumulation stays f32
    # via preferred_element_type, so this halves the matmul's HBM traffic
    # with no statistical change beyond the bf16 rounding the activations
    # already carry (round-3 cast everything to f32 first)
    onehot = jax.nn.one_hot(indices, n_embed, dtype=flat.dtype)
    counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
    sums = jnp.dot(
        flat.T, onehot, preferred_element_type=jnp.float32
    )
    return counts, sums.astype(jnp.float32)


def vq_ema_update(
    codebook: VQCodebook,
    counts: jnp.ndarray,
    sums: jnp.ndarray,
    *,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> VQCodebook:
    """One EMA step of the codebook given (already global, or per-shard with
    `axis_name`) assignment statistics.

    Matches reference models/vqvae_conv3d_latent.py:66-75: EMA of counts and
    sums, Laplace-smoothed normalization, codebook <- embed_avg / counts.
    """
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        sums = jax.lax.psum(sums, axis_name)
    counts = jax.lax.stop_gradient(counts)
    sums = jax.lax.stop_gradient(sums)

    cluster_size = codebook.cluster_size * decay + counts * (1.0 - decay)
    embed_avg = codebook.embed_avg * decay + sums * (1.0 - decay)
    n = jnp.sum(cluster_size)
    smoothed = (cluster_size + eps) / (n + codebook.n_embed * eps) * n
    embed = embed_avg / smoothed[None, :]
    return VQCodebook(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)


def revive_dead_codes(
    codebook: VQCodebook,
    flat: jnp.ndarray,
    key: jax.Array,
    *,
    usage_threshold: float = 1e-3,
) -> VQCodebook:
    """Re-seed codes whose EMA usage has collapsed with random batch
    vectors (standard VQ-VAE dead-code restart; not in the reference —
    its codebooks can permanently collapse). Call periodically from the
    training loop with a batch of encoder outputs."""
    n_embed = codebook.n_embed
    dead = codebook.cluster_size < usage_threshold  # (n_embed,)
    idx = jax.random.randint(key, (n_embed,), 0, flat.shape[0])
    replacements = flat.astype(jnp.float32)[idx].T  # (dim, n_embed)
    embed = jnp.where(dead[None, :], replacements, codebook.embed)
    embed_avg = jnp.where(dead[None, :], replacements, codebook.embed_avg)
    cluster_size = jnp.where(dead, 1.0, codebook.cluster_size)
    return VQCodebook(
        embed=embed, cluster_size=cluster_size, embed_avg=embed_avg
    )


def vq_quantize_train(
    codebook: VQCodebook,
    x: jnp.ndarray,
    *,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, VQCodebook]:
    """Training-mode quantization: lookup + straight-through + EMA update.

    Returns (quantized, indices, diff, new_codebook). Evaluation should call
    `vq_lookup` alone (no codebook mutation), mirroring the
    `self.training` gate in the reference (models/vqvae_conv3d_latent.py:59).
    """
    dim = codebook.dim
    flat = x.reshape(-1, dim)

    if use_pallas:
        from faceoff_tpu.ops import vq_pallas

        # Measured crossover (tools/bench_vq.py, v5e, N=524288 D=64):
        # the fused kernel is parity with XLA through K=2048; past the
        # single-pass VMEM ceiling the K-tiled kernel avoids the OOM but
        # XLA's fused streaming argmax is 2.7-3x faster (24.3 vs 64.9 ms
        # at K=8192), so use_pallas routes large codebooks to the XLA
        # path. vq_pallas.vq_assign remains callable directly at any K.
        use_pallas = codebook.n_embed <= vq_pallas._MAX_SINGLE_PASS_K

    if use_pallas:
        from faceoff_tpu.ops import vq_pallas

        indices, quant_flat, counts, sums = vq_pallas.vq_assign(
            flat, codebook.embed
        )
        quant = quant_flat.reshape(x.shape).astype(x.dtype)
        indices = indices.reshape(x.shape[:-1])
    else:
        indices_flat = nearest_code(flat, codebook.embed)
        counts, sums = vq_stats(flat, indices_flat, codebook.n_embed)
        indices = indices_flat.reshape(x.shape[:-1])
        quant = codebook_lookup(indices, codebook.embed).astype(x.dtype)

    x32 = x.astype(jnp.float32)
    diff = jnp.mean(
        (jax.lax.stop_gradient(quant.astype(jnp.float32)) - x32) ** 2
    )
    quant_st = x + jax.lax.stop_gradient(quant - x)

    new_codebook = vq_ema_update(
        codebook, counts, sums, decay=decay, eps=eps, axis_name=axis_name
    )
    return quant_st, indices, diff, new_codebook


def codebook_perplexity(indices: jnp.ndarray, n_embed: int) -> jnp.ndarray:
    """exp(entropy) of the empirical code usage — a codebook-health metric
    (not present in the reference; useful for monitoring collapse)."""
    onehot = jax.nn.one_hot(indices.reshape(-1), n_embed, dtype=jnp.float32)
    probs = jnp.mean(onehot, axis=0)
    return jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
