"""Pallas bilinear image warp: gather-free resampling on the MXU.

Why this kernel exists: the training input pipeline warps every frame
(perturbations, cross-identity alignment — the device twin of reference
`TemporalAlignment/perturbations.py` + `face_translation_videos3_utils.py`
cv2.remap/warpAffine calls). The natural XLA expression — a 4-tap
advanced-index gather (`ops/warp._bilinear_sample`) — lowers to a
per-element gather loop on TPU: measured 680 ms for 128 frames at 256 px
on a v5e, which made the fused device input pipeline 3x slower than the
train step it feeds.

Formulation: bilinear sampling is a separable 2-tap interpolation in x
and y, so for each output element o = (i, j) of a frame

    out[o, c] = sum_k Y[o, k] * (sum_w X[o, w] * img[k, w, c])

where X[o, :] carries (1-dx, dx) at columns (x0, x0+1) and Y[o, :]
carries (1-dy, dy) at rows (y0, y0+1). The inner contraction is a dense
(o, W) @ (W, H*C) matmul — one-hot-sparse, but the MXU runs it at
hundreds of TFLOP/s, which beats any TPU gather by orders of magnitude —
and the outer contraction is a cheap VPU weighted row-pick. Per 256px
frame that is ~25 GFLOP of matmul instead of ~0.8 M scattered loads.

The kernel tiles output rows (grid = (N, H/TILE_H)); the (W, H*C)
transposed source frame stays resident in VMEM across a frame's row
tiles (same block index on the inner grid axis → no re-DMA).

Numerics: `precision='highest'` keeps everything f32 — bit-comparable to
`_bilinear_sample` up to f32 matmul reassociation (parity-tested at
1e-5). `precision='bfloat16'` casts the image and interpolation weights
to bf16 for the MXU (~2x faster); worst-case error ~1e-2 in [-1, 1]
units — fine for training augmentation, selectable where parity matters
more than speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(img_t_ref, xs_ref, ys_ref, out_ref, *, h, w, c, tile_h,
                 compute_dtype):
    """One (TILE_H, W) tile of output for one frame.

    img_t_ref: (W, H*C) — the frame transposed so the x-contraction is a
               plain matmul; resident across the frame's row tiles.
    xs_ref/ys_ref: (TILE_H, W) source coordinates for this tile.
    out_ref: (C, TILE_H, W) — channels leading so the last dim stays
             lane-aligned (C=3 would violate the 128-lane tiling).
    """
    img_t = img_t_ref[0].astype(compute_dtype)  # (W_src, H*C)
    # one output row at a time: every intermediate keeps the OUTPUT
    # column axis on the 128-wide lane dimension and never reshapes
    # across it (Mosaic cannot re-lane vectors); the source axis lives on
    # sublanes, where iota-compare one-hots and dim-0 contraction are
    # native. fori_loop (not python unroll) keeps only ONE row's buffers
    # live — the unrolled version overflowed the 16M scoped-vmem stack.
    def row(r, carry):
        xs = xs_ref[0, pl.ds(r, 1), :]  # (1, W_out)
        ys = ys_ref[0, pl.ds(r, 1), :]

        x0f = jnp.floor(xs)
        y0f = jnp.floor(ys)
        dx = (xs - x0f).astype(compute_dtype)
        dy = ys - y0f
        x0i = x0f.astype(jnp.int32)
        y0i = y0f.astype(jnp.int32)
        x0 = jnp.clip(x0i, 0, w - 1)
        x1 = jnp.clip(x0i + 1, 0, w - 1)  # clip the RAW tap (x0+1 may be
        y0 = jnp.clip(y0i, 0, h - 1)      # 0 when x0 = -1 at the border)
        y1 = jnp.clip(y0i + 1, 0, h - 1)
        # zeros-outside border PER TAP, exactly like _bilinear_sample:
        # the 4 inside tests factor separably (inside = mx(a)*my(b)), so
        # each one-hot weight carries its own mask and a tap that falls
        # off the image contributes nothing even when its partner tap is
        # inside (e.g. x = -0.5 still blends half of column 0).
        mx0 = (x0f >= 0) & (x0f <= w - 1)
        mx1 = (x0f + 1 >= 0) & (x0f + 1 <= w - 1)
        my0 = (y0f >= 0) & (y0f <= h - 1)
        my1 = (y0f + 1 >= 0) & (y0f + 1 <= h - 1)
        wx0 = (1.0 - dx) * mx0.astype(compute_dtype)
        wx1 = dx * mx1.astype(compute_dtype)

        # x one-hot TRANSPOSED: (W_src sublanes, W_out lanes)
        si = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        x_oh = (
            (si == x0).astype(compute_dtype) * wx0
            + (si == x1).astype(compute_dtype) * wx1
        )
        # (H*C, W_out) = img_t^T @ x_oh, contracting the source-column
        # axis on dim 0 of both — the MXU does the "gather"
        b = jax.lax.dot_general(
            img_t, x_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h, c, w)

        wy0 = (1.0 - dy) * my0.astype(jnp.float32)
        wy1 = dy * my1.astype(jnp.float32)
        ki = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        y_oh = (
            (ki == y0).astype(jnp.float32) * wy0
            + (ki == y1).astype(jnp.float32) * wy1
        )  # (H_src sublanes, W_out lanes)
        out = jnp.sum(b * y_oh[:, None, :], axis=0)  # (C, W_out), VPU
        out_ref[0, :, pl.ds(r, 1), :] = out[:, None, :]
        return carry

    jax.lax.fori_loop(0, tile_h, row, 0)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "precision", "interpret")
)
def bilinear_warp_frames(
    imgs: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    *,
    tile_h: int = 8,
    precision: str = "highest",
    interpret: bool = None,
) -> jnp.ndarray:
    """Batched bilinear warp: sample imgs (N, H, W, C) at float coords
    xs/ys (N, H, W); zeros outside. Returns (N, H, W, C) float32 — the
    batched equivalent of `ops.warp._bilinear_sample` (which remains the
    reference implementation and the off-TPU fallback).

    interpret=None auto-selects interpreter mode off-TPU so CPU tests
    exercise the same kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = imgs.shape
    if h % tile_h:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    if tile_h % 8 and tile_h != h:
        # Mosaic block constraint: second-to-last block dim must be a
        # multiple of 8 (sublane) unless it spans the whole axis
        raise ValueError(f"tile_h={tile_h} must be a multiple of 8")
    compute_dtype = (
        jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    )

    # (N, W, H*C): x-contraction-ready layout, built once by XLA
    imgs_t = imgs.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        n, w, h * c
    )
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    kernel = functools.partial(
        _warp_kernel, h=h, w=w, c=c, tile_h=tile_h,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            # same block for every row tile of a frame -> stays in VMEM
            pl.BlockSpec((1, w, h * c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, tile_h, w), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tile_h, w), lambda i, t: (i, t, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile_h, w), lambda i, t: (i, 0, t, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=interpret,
    )(imgs_t, xs, ys)
    return out.transpose(0, 2, 3, 1)
