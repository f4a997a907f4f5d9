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
(W_src, L) one-hot against the transposed frame (W_src, H*C) — one MXU
matmul per output tile of L = TILE_H*W pixels. One-hot-sparse, but the
MXU runs it at hundreds of TFLOP/s, which beats any TPU gather by an
order of magnitude. The outer contraction is a cheap VPU weighted
row-pick. Per 256px frame that is ~25 GFLOP of matmul instead of ~0.8 M
scattered loads.

The kernel tiles output rows (grid = (N, H/TILE_H)); the (W, H*C)
transposed source frame stays resident in VMEM across a frame's row
tiles (same block index on the inner grid axis → no re-DMA). Output
pixel coordinates arrive pre-flattened to (N, H/TILE_H, TILE_H*W) so a
whole tile's one-hot builds in ONE shot with the flattened pixel axis on
the 128-wide lanes (Mosaic cannot merge sublanes into lanes inside the
kernel, so the reshape happens in XLA where it is a free relayout).

Numerics (measured on v5e hardware, random [-1, 1] images, prof in
tools/prof_warp_pallas.py):
  * precision='highest'  — true f32 MXU passes; matches
    `_bilinear_sample` to ~1e-6 (f32 reassociation only).
  * precision='default'  — f32 buffers, default MXU precision (bf16
    multiply passes): worst-case ~4e-3 in [-1, 1] units, fastest.
  * precision='bfloat16' — bf16 buffers end to end: worst-case ~6e-3.
Training augmentation uses 'default'; parity tests pin all three in
interpret mode (tests/test_warp_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _warp_kernel(img_t_ref, xs_ref, ys_ref, out_ref, *, h, w, c,
                 compute_dtype, dot_precision):
    """One (TILE_H*W,) flattened tile of output pixels for one frame.

    img_t_ref: (1, W, H*C) — the frame transposed so the x-contraction is
               a plain matmul; resident across the frame's row tiles.
    xs_ref/ys_ref: (1, 1, L) source coordinates, L = TILE_H*W flattened
               row-major so the whole tile lives on the lane axis.
    out_ref: (1, C, 1, L) — channels leading so the lane axis stays the
             flattened pixel axis (C=3 would violate 128-lane tiling).
    """
    img_t = img_t_ref[0].astype(compute_dtype)  # (W_src, H*C)
    xs = xs_ref[0]  # (1, L)
    ys = ys_ref[0]

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
    # zeros-outside border PER TAP, exactly like _bilinear_sample: the 4
    # inside tests factor separably (inside = mx(a)*my(b)), so each
    # one-hot weight carries its own mask and a tap that falls off the
    # image contributes nothing even when its partner tap is inside
    # (e.g. x = -0.5 still blends half of column 0).
    mx0 = (x0f >= 0) & (x0f <= w - 1)
    mx1 = (x0f + 1 >= 0) & (x0f + 1 <= w - 1)
    my0 = (y0f >= 0) & (y0f <= h - 1)
    my1 = (y0f + 1 >= 0) & (y0f + 1 <= h - 1)
    wx0 = (1.0 - dx) * mx0.astype(compute_dtype)
    wx1 = dx * mx1.astype(compute_dtype)

    # x one-hot TRANSPOSED: (W_src sublanes, L lanes) — built for the
    # whole tile at once; the contraction below is ONE MXU matmul
    si = jax.lax.broadcasted_iota(jnp.int32, (w,) + x0.shape[1:], 0)
    x_oh = (
        (si == x0).astype(compute_dtype) * wx0
        + (si == x1).astype(compute_dtype) * wx1
    )
    # (H*C, L) = img_t^T @ x_oh, contracting the source-column axis on
    # dim 0 of both — the MXU does the "gather"
    b = jax.lax.dot_general(
        img_t, x_oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision,
    ).reshape(h, c, -1)

    wy0 = (1.0 - dy) * my0.astype(jnp.float32)
    wy1 = dy * my1.astype(jnp.float32)
    ki = jax.lax.broadcasted_iota(jnp.int32, (h,) + y0.shape[1:], 0)
    y_oh = (
        (ki == y0).astype(jnp.float32) * wy0
        + (ki == y1).astype(jnp.float32) * wy1
    )  # (H_src sublanes, L lanes)
    # per-channel row-pick keeps the peak VMEM at one (H, L) product
    # instead of an (H, C, L) broadcast temp
    for ci in range(c):
        out_ref[0, ci, 0, :] = jnp.sum(b[:, ci, :] * y_oh, axis=0)


def _auto_tile_h(out_h, out_w, h, w, c, vmem_budget=14 << 20):
    """Largest output-row tile whose kernel working set fits scoped VMEM.

    Estimate (f32): double-buffered transposed frame + x one-hot + the
    (H*C, L) matmul result + y one-hot + the row-pick temp, L = t*out_w.
    Conservative vs the compiler's accounting (measured: 256px c3 t8 fits
    at ~17M limit, t16 OOMs), so the pick errs toward smaller tiles.
    """
    img_bytes = 2 * w * h * c * 4
    for t in range(16, 0, -1):
        if out_h % t:
            continue
        length = t * out_w
        est = img_bytes + 4 * length * (w + h * c + 2 * h)
        if est <= vmem_budget:
            return t
    return 1


def _warp_pallas_raw(imgs, xs, ys, *, tile_h, precision, interpret):
    n, h, w, c = imgs.shape
    out_h, out_w = xs.shape[1:3]
    compute_dtype = (
        jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    )
    dot_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    if tile_h is None:
        tile_h = _auto_tile_h(out_h, out_w, h, w, c)
    tiles = out_h // tile_h
    length = tile_h * out_w

    # (N, W, H*C): x-contraction-ready layout, built once by XLA; the
    # coordinate tiles flatten to the lane axis here, outside the kernel.
    # Tiles fold into the LEADING axis (n*tiles, 1, L) so every block's
    # trailing two dims exactly equal the array's — Mosaic's block rule.
    imgs_t = imgs.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        n, w, h * c
    )
    xs = xs.astype(jnp.float32).reshape(n * tiles, 1, length)
    ys = ys.astype(jnp.float32).reshape(n * tiles, 1, length)

    kernel = functools.partial(
        _warp_kernel, h=h, w=w, c=c,
        compute_dtype=compute_dtype, dot_precision=dot_precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, tiles),
        in_specs=[
            # same block for every row tile of a frame -> stays in VMEM
            pl.BlockSpec((1, w, h * c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, length), lambda i, t: (i * tiles + t, 0, 0)),
            pl.BlockSpec((1, 1, length), lambda i, t: (i * tiles + t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 1, length), lambda i, t: (i * tiles + t, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n * tiles, c, 1, length), jnp.float32
        ),
        interpret=interpret,
    )(imgs_t, xs, ys)
    # (n*tiles, c, 1, tile_h*out_w) -> (n, out_h, out_w, c)
    out = out.reshape(n, tiles, c, tile_h, out_w)
    return out.transpose(0, 1, 3, 4, 2).reshape(n, out_h, out_w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp_diff(imgs, xs, ys, tile_h, precision, interpret):
    return _warp_pallas_raw(
        imgs, xs, ys, tile_h=tile_h, precision=precision,
        interpret=interpret,
    )


def _warp_diff_fwd(imgs, xs, ys, tile_h, precision, interpret):
    return _warp_diff(imgs, xs, ys, tile_h, precision, interpret), (
        imgs, xs, ys
    )


def _warp_diff_bwd(tile_h, precision, interpret, res, g):
    # The warp is upstream of the model in the input pipeline, so this
    # path is rarely traced; when it is, differentiate the XLA gather
    # reference (same linear map — bilinear splat adjoint for the image,
    # finite-slope coord grads), which jax can transpose natively.
    import faceoff_tpu.ops.warp as _W

    imgs, xs, ys = res
    _, vjp = jax.vjp(
        lambda im, x, y: jax.vmap(_W._bilinear_sample)(im, x, y),
        imgs, xs, ys,
    )
    return vjp(g)


_warp_diff.defvjp(_warp_diff_fwd, _warp_diff_bwd)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "precision", "interpret")
)
def bilinear_warp_frames(
    imgs: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    *,
    tile_h: int = None,
    precision: str = "default",
    interpret: bool = None,
) -> jnp.ndarray:
    """Batched bilinear warp: sample imgs (N, H, W, C) at float coords
    xs/ys (N, OH, OW) — the output grid may differ from the source frame.
    Zeros outside. Returns (N, OH, OW, C) float32 — the batched
    equivalent of `ops.warp._bilinear_sample` (which remains the
    reference implementation and the off-TPU fallback). Parity is pinned
    by tests/test_warp_pallas.py (interpret-mode 1e-5 incl. borders and
    negative coords; TPU-measured envelopes in the module docstring).

    tile_h=None picks the largest output-row tile that fits scoped VMEM
    (8 at 256px, smaller at 512px). interpret=None auto-selects
    interpreter mode off-TPU so CPU tests exercise the same kernel.
    Differentiable via a custom VJP that transposes the equivalent gather
    formulation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_h = xs.shape[1]
    if tile_h is not None and out_h % tile_h:
        raise ValueError(
            f"output H={out_h} must be divisible by tile_h={tile_h}"
        )
    return _warp_diff(imgs, xs, ys, tile_h, precision, interpret)
