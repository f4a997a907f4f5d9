"""Fused Pallas TPU kernel for the vector-quantization hot path.

One pass over the encoder activations computes, per grid tile:
  scores  = x @ E - 0.5 ||E||^2          (MXU)
  indices = argmax(scores)               (VPU)
  onehot  = iota == indices              (VPU)
  quant   = onehot @ E^T                 (MXU)
  counts += sum(onehot); sums += x^T @ onehot   (accumulated across the
  sequential TPU grid into the same output block)

This replaces four separate XLA ops (distance matmul, argmin, gather,
one-hot stats matmul — the hot loop of reference
models/vqvae_conv3d_latent.py:47-61) and never materializes the (N, K)
distance matrix in HBM: scores and onehot live only in VMEM per tile.

No gradient flows through these outputs at the call site (straight-through
estimator + stop-gradient EMA statistics, see faceoff_tpu.ops.vq), so the
kernel needs no VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per grid step. 512 rows x 512 codes of f32 scores+onehot ~= 2 MB VMEM.
_TILE_N = 512


def _vq_kernel(
    x_ref, embed_ref, idx_ref, quant_ref, counts_ref, sums_ref, *, n_valid: int
):
    i = pl.program_id(0)
    tile_n = x_ref.shape[0]

    x = x_ref[:]  # (TN, D) f32
    e = embed_ref[:]  # (D, K) f32

    scores = jnp.dot(x, e, preferred_element_type=jnp.float32)
    scores = scores - 0.5 * jnp.sum(e * e, axis=0, keepdims=True)

    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (TN,)

    k = e.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, k), 1) == idx[:, None]
    ).astype(jnp.float32)

    # rows beyond the true N are padding: exclude from the statistics
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + i * tile_n
    valid = (row < n_valid).astype(jnp.float32)  # (TN, 1)
    onehot_valid = onehot * valid

    quant = jax.lax.dot_general(
        onehot, e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, D)

    idx_ref[:] = idx[:, None]
    quant_ref[:] = quant

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += jnp.sum(onehot_valid, axis=0, keepdims=True)
    sums_ref[:] += jax.lax.dot_general(
        x, onehot_valid,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def vq_assign(
    flat: jnp.ndarray, embed: jnp.ndarray, *, interpret: bool = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused nearest-code assignment + quantized values + EMA statistics.

    flat: (N, D) activations, embed: (D, K) codebook. Returns
    (indices (N,) int32, quant (N, D) f32, counts (K,) f32, sums (D, K) f32).

    interpret=None auto-selects interpreter mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = flat.shape
    k = embed.shape[1]
    # No gradient flows through any output (straight-through + stop-gradient
    # EMA stats at the call site), so cut tangents at the inputs — otherwise
    # jvp tries to differentiate the pallas_call itself.
    flat32 = jax.lax.stop_gradient(flat).astype(jnp.float32)
    embed32 = jax.lax.stop_gradient(embed).astype(jnp.float32)

    n_pad = -n % _TILE_N
    if n_pad:
        flat32 = jnp.pad(flat32, ((0, n_pad), (0, 0)))
    n_total = n + n_pad
    grid = (n_total // _TILE_N,)

    idx, quant, counts, sums = pl.pallas_call(
        functools.partial(_vq_kernel, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_total, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
        ],
        interpret=interpret,
    )(flat32, embed32)

    idx = idx[:n, 0]
    quant = quant[:n]
    counts = counts[0]
    return (
        jax.lax.stop_gradient(idx),
        jax.lax.stop_gradient(quant),
        jax.lax.stop_gradient(counts),
        jax.lax.stop_gradient(sums),
    )
