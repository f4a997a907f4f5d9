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

# Codebooks larger than this route through the K-tiled two-kernel path:
# the single-pass kernel holds a full (TILE_N, K) score block in VMEM, so
# it hits the scoped-VMEM ceiling near K=4096 (measured: K=8192 needs
# 20.3 MB against the 16 MB limit).
_MAX_SINGLE_PASS_K = 2048
# K-tiled path tile sizes: (TILE_N_BIG x TILE_K) f32 scores + onehot = 4 MB.
_TILE_N_BIG = 1024
_TILE_K = 512


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


def _assign_kernel_tiled(
    x_ref, e_ref, idx_ref, quant_ref,
    best_score, best_idx, best_vec,
    *, k_tiles: int, tile_k: int, k_valid: int,
):
    """Streaming-argmax assignment over codebook tiles.

    Grid (n_tiles, k_tiles), K innermost: the x block (indexed by i only)
    stays VMEM-resident across the K sweep while (TILE_K)-wide codebook
    slices stream through. Running (best score, best index, best vector)
    live in VMEM scratch; outputs are written on the final K tile. Ties
    break toward the lowest index (strict '>' keeps the earlier winner),
    matching jnp.argmax in the pure-XLA path.
    """
    kk = pl.program_id(1)
    tile_n = x_ref.shape[0]

    x = x_ref[:]  # (TN, D) f32
    e = e_ref[:]  # (D, TK) f32

    scores = jnp.dot(x, e, preferred_element_type=jnp.float32)
    scores = scores - 0.5 * jnp.sum(e * e, axis=0, keepdims=True)
    # mask padded codebook columns (K rounded up to TILE_K)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_k), 1) + kk * tile_k
    scores = jnp.where(col < k_valid, scores, -jnp.inf)

    loc_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (TN,)
    loc_best = jnp.max(scores, axis=-1)  # (TN,)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_k), 1)
        == loc_idx[:, None]
    ).astype(jnp.float32)
    loc_vec = jax.lax.dot_general(
        onehot, e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, D)

    @pl.when(kk == 0)
    def _init():
        best_score[:] = jnp.full_like(best_score, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)
        best_vec[:] = jnp.zeros_like(best_vec)

    improved = loc_best[:, None] > best_score[:]  # (TN, 1)
    best_score[:] = jnp.where(improved, loc_best[:, None], best_score[:])
    best_idx[:] = jnp.where(
        improved, loc_idx[:, None] + kk * tile_k, best_idx[:]
    )
    best_vec[:] = jnp.where(improved, loc_vec, best_vec[:])

    @pl.when(kk == k_tiles - 1)
    def _emit():
        idx_ref[:] = best_idx[:]
        quant_ref[:] = best_vec[:]


def _stats_kernel_tiled(
    x_ref, idx_ref, counts_ref, sums_ref, *, tile_k: int, n_valid: int
):
    """EMA statistics for one codebook tile, accumulated over row tiles.

    Grid (k_tiles, n_tiles), N innermost: the (1, TILE_K) counts and
    (D, TILE_K) sums blocks (indexed by kk only) stay resident across the
    N sweep; each step contributes its rows' one-hot columns that fall in
    this K range.
    """
    kk, j = pl.program_id(0), pl.program_id(1)
    tile_n = x_ref.shape[0]

    x = x_ref[:]  # (TN, D)
    local = idx_ref[:] - kk * tile_k  # (TN, 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_k), 1) == local
    ).astype(jnp.float32)  # indices outside [0, TILE_K) match no column

    row = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + j * tile_n
    onehot *= (row < n_valid).astype(jnp.float32)

    @pl.when(j == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += jnp.sum(onehot, axis=0, keepdims=True)
    sums_ref[:] += jax.lax.dot_general(
        x, onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _vq_assign_tiled(
    flat32: jnp.ndarray, embed32: jnp.ndarray, n: int, *, interpret: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-tiled two-kernel path for codebooks too large for the
    single-pass kernel's full-width VMEM score block."""
    d = flat32.shape[1]
    k = embed32.shape[1]

    n_pad = -n % _TILE_N_BIG
    if n_pad:
        flat32 = jnp.pad(flat32, ((0, n_pad), (0, 0)))
    n_total = n + n_pad
    k_pad = -k % _TILE_K
    if k_pad:
        embed32 = jnp.pad(embed32, ((0, 0), (0, k_pad)))
    k_total = k + k_pad
    n_tiles = n_total // _TILE_N_BIG
    k_tiles = k_total // _TILE_K

    idx, quant = pl.pallas_call(
        functools.partial(
            _assign_kernel_tiled,
            k_tiles=k_tiles, tile_k=_TILE_K, k_valid=k,
        ),
        grid=(n_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec(
                (_TILE_N_BIG, d), lambda i, kk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, _TILE_K), lambda i, kk: (0, kk),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (_TILE_N_BIG, 1), lambda i, kk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TILE_N_BIG, d), lambda i, kk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_total, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TILE_N_BIG, 1), jnp.float32),
            pltpu.VMEM((_TILE_N_BIG, 1), jnp.int32),
            pltpu.VMEM((_TILE_N_BIG, d), jnp.float32),
        ],
        interpret=interpret,
    )(flat32, embed32)

    counts, sums = pl.pallas_call(
        functools.partial(_stats_kernel_tiled, tile_k=_TILE_K, n_valid=n),
        grid=(k_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (_TILE_N_BIG, d), lambda kk, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TILE_N_BIG, 1), lambda kk, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _TILE_K), lambda kk, j: (0, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, _TILE_K), lambda kk, j: (0, kk), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k_total), jnp.float32),
            jax.ShapeDtypeStruct((d, k_total), jnp.float32),
        ],
        interpret=interpret,
    )(flat32, idx)

    return (
        jax.lax.stop_gradient(idx[:n, 0]),
        jax.lax.stop_gradient(quant[:n]),
        jax.lax.stop_gradient(counts[0, :k]),
        jax.lax.stop_gradient(sums[:, :k]),
    )


def vq_assign(
    flat: jnp.ndarray, embed: jnp.ndarray, *, interpret: bool = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused nearest-code assignment + quantized values + EMA statistics.

    flat: (N, D) activations, embed: (D, K) codebook. Returns
    (indices (N,) int32, quant (N, D) f32, counts (K,) f32, sums (D, K) f32).

    K <= 2048 runs the single-pass kernel (scores + stats in one sweep);
    larger codebooks stream TILE_K-wide codebook slices through a
    running-argmax kernel plus a K-tiled statistics kernel, so VMEM use is
    constant in K (the single-pass kernel VMEM-OOMs at K=8192).

    interpret=None auto-selects interpreter mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if embed.shape[1] > _MAX_SINGLE_PASS_K:
        n = flat.shape[0]
        flat32 = jax.lax.stop_gradient(flat).astype(jnp.float32)
        embed32 = jax.lax.stop_gradient(embed).astype(jnp.float32)
        return _vq_assign_tiled(flat32, embed32, n, interpret=interpret)
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
