"""Parity tests for the Pallas bilinear warp kernel vs the XLA gather path.

`ops.warp._bilinear_sample` is the reference implementation (itself
cv2-parity-tested in test_warp.py); `ops.warp_pallas.bilinear_warp_frames`
must reproduce it bit-closely in f32 and within bf16 tolerance at
precision='bfloat16'. On the CPU test mesh the kernel runs in Pallas
interpret mode — the same kernel source the TPU compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.ops import warp as W
from faceoff_tpu.ops.warp_pallas import bilinear_warp_frames


def _gather_reference(imgs, xs, ys):
    return jax.vmap(W._bilinear_sample)(imgs, xs, ys)


def _rotation_grids(n, h, w, max_deg=30.0, seed=0):
    """Affine sampling grids spanning interiors AND borders."""
    rng = np.random.default_rng(seed)
    xs = np.empty((n, h, w), np.float32)
    ys = np.empty((n, h, w), np.float32)
    for i in range(n):
        M = W.rotation_about(
            jnp.float32(rng.uniform(-max_deg, max_deg)),
            jnp.asarray(rng.uniform(0, [w, h]).astype(np.float32)),
            scale=float(rng.uniform(0.8, 1.2)),
        )
        gx, gy = W.affine_grid(W.invert_affine(M), h, w)
        xs[i], ys[i] = np.asarray(gx), np.asarray(gy)
    return jnp.asarray(xs), jnp.asarray(ys)


class TestBilinearWarpPallas:
    def test_identity(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 16, 24, 3)).astype(np.float32))
        x, y = W.identity_grid(16, 24)
        xs = jnp.broadcast_to(x, (2, 16, 24))
        ys = jnp.broadcast_to(y, (2, 16, 24))
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)

    def test_parity_rotation_f32(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
        xs, ys = _rotation_grids(4, 32, 32, seed=1)
        ref = _gather_reference(imgs, xs, ys)
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_parity_borders_negative_coords(self):
        """Coords straddling every border, incl. the fractional edge cases
        where one tap is inside and its partner is off-image (x=-0.5 blends
        half of column 0; x=w-0.5 blends half of the last column)."""
        rng = np.random.default_rng(2)
        h, w = 16, 16
        imgs = jnp.asarray(rng.uniform(-1, 1, (3, h, w, 2)).astype(np.float32))
        # uniform coords well past every border
        xs = jnp.asarray(rng.uniform(-6, w + 6, (3, h, w)).astype(np.float32))
        ys = jnp.asarray(rng.uniform(-6, h + 6, (3, h, w)).astype(np.float32))
        # pin specific edge cases into frame 0
        edge = np.array(
            [-0.5, -1.0, 0.0, w - 1.0, w - 0.5, w - 1e-3], np.float32
        )
        xs = xs.at[0, 0, : len(edge)].set(edge)
        ys = ys.at[0, 0, : len(edge)].set(
            np.array([-0.5, h - 0.5, 0.0, h - 1.0, -1.0, h - 1e-3], np.float32)
        )
        ref = _gather_reference(imgs, xs, ys)
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_parity_non_square(self):
        """H != W exercises the (W, H*C) transposed layout indexing."""
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 24, 40, 3)).astype(np.float32))
        xs, ys = _rotation_grids(2, 24, 40, seed=3)
        ref = _gather_reference(imgs, xs, ys)
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_parity_single_channel_and_six_channel(self):
        rng = np.random.default_rng(4)
        for c in (1, 6):
            imgs = jnp.asarray(
                rng.uniform(-1, 1, (2, 16, 16, c)).astype(np.float32)
            )
            xs, ys = _rotation_grids(2, 16, 16, seed=10 + c)
            ref = _gather_reference(imgs, xs, ys)
            out = bilinear_warp_frames(imgs, xs, ys, tile_h=8)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5
            )

    def test_bfloat16_tolerance(self):
        """precision='bfloat16' trades ~1e-2 accuracy (in [-1,1] units) for
        MXU speed — assert it stays within that envelope."""
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
        xs, ys = _rotation_grids(2, 32, 32, seed=5)
        ref = _gather_reference(imgs, xs, ys)
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=8, precision="bfloat16")
        err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
        assert err < 2e-2, f"bf16 warp error {err} exceeds envelope"

    def test_whole_axis_tile(self):
        """tile_h == H (one tile per frame) is the small-image fast path."""
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
        xs, ys = _rotation_grids(2, 16, 16, seed=6)
        ref = _gather_reference(imgs, xs, ys)
        out = bilinear_warp_frames(imgs, xs, ys, tile_h=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_tile_constraints(self):
        imgs = jnp.zeros((1, 16, 16, 3), jnp.float32)
        xs = jnp.zeros((1, 16, 16), jnp.float32)
        with pytest.raises(ValueError, match="divisible"):
            bilinear_warp_frames(imgs, xs, xs, tile_h=5)

    def test_parity_all_precisions_tile4(self):
        """'highest' and 'default' agree exactly in interpret mode; tile_h
        has no alignment constraint (the tile flattens onto the lane axis)."""
        rng = np.random.default_rng(8)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
        xs, ys = _rotation_grids(2, 16, 16, seed=8)
        ref = _gather_reference(imgs, xs, ys)
        for prec in ("highest", "default"):
            out = bilinear_warp_frames(
                imgs, xs, ys, tile_h=4, precision=prec
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5
            )

    def test_perturb_clip_routes_identically(self):
        """The full composite perturbation produces the same clip through
        either warp backend (pallas kernel in interpret mode vs gather)."""
        rng = np.random.default_rng(9)
        faces = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
        eyes = jnp.asarray(
            rng.uniform(10, 22, (4, 2)).astype(np.float32)
        )
        key = jax.random.key(3)
        a = W.perturb_clip(key, faces, eyes, use_pallas=False)
        b = W.perturb_clip(key, faces, eyes, use_pallas=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_affine_warp_routes_identically(self):
        rng = np.random.default_rng(10)
        imgs = jnp.asarray(rng.uniform(0, 1, (3, 24, 24, 3)).astype(np.float32))
        Ms = jnp.asarray(
            np.stack([
                np.array([[1, 0.02, 1.5], [-0.02, 1, -2.0]], np.float32)
                for _ in range(3)
            ])
        )
        a = W.affine_warp(imgs, Ms, use_pallas=False)
        b = W.affine_warp(imgs, Ms, use_pallas=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gradients_flow(self):
        """The warp sits inside the training input path under jit; it must
        be differentiable w.r.t. the image (the one-hot matmul is linear in
        the image, so grads are exact)."""
        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
        xs, ys = _rotation_grids(1, 16, 16, seed=7)

        def loss_pallas(im):
            return jnp.sum(bilinear_warp_frames(im, xs, ys, tile_h=8) ** 2)

        def loss_ref(im):
            return jnp.sum(_gather_reference(im, xs, ys) ** 2)

        g1 = jax.grad(loss_pallas)(imgs)
        g2 = jax.grad(loss_ref)(imgs)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
