"""On-device warp engine tests: parity with the host cv2 implementations."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.ops import warp as W


class TestAffineWarp:
    def test_identity(self):
        img = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
        M = np.array([[[1, 0, 0], [0, 1, 0]]], np.float32)
        out = W.affine_warp(jnp.asarray(img), jnp.asarray(M))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)

    def test_translation_matches_cv2(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
        M = np.array([[1, 0, 5], [0, 1, -3]], np.float32)
        ref = cv2.warpAffine(img, M, (40, 40))
        out = W.affine_warp(jnp.asarray(img[None]), jnp.asarray(M[None]))[0]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_rotation_matches_cv2(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        Mcv = cv2.getRotationMatrix2D((20.0, 30.0), 15.0, 1.0)
        ref = cv2.warpAffine(img, Mcv, (64, 64))
        M = W.rotation_about(jnp.float32(15.0), jnp.array([20.0, 30.0]))
        np.testing.assert_allclose(np.asarray(M), Mcv, atol=1e-5)
        out = W.affine_warp(jnp.asarray(img[None]), M[None])[0]
        # interiors match; border pixels may differ by interpolation policy
        np.testing.assert_allclose(
            np.asarray(out)[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-2
        )

    def test_invert_affine_roundtrip(self):
        M = jnp.asarray(
            cv2.getRotationMatrix2D((10.0, 12.0), 33.0, 1.2), jnp.float32
        )
        Mi = W.invert_affine(M)
        I = W.compose_affine(M, Mi)
        np.testing.assert_allclose(
            np.asarray(I), [[1, 0, 0], [0, 1, 0]], atol=1e-4
        )


class TestConvexMask:
    def test_matches_cv2_rect(self):
        pts = np.array([[8, 8], [40, 8], [40, 30], [8, 30]], np.float32)
        ours = np.asarray(W.convex_mask(jnp.asarray(pts), 48, 48))
        ref = np.zeros((48, 48), np.uint8)
        cv2.fillConvexPoly(ref, pts.astype(np.int32), 1)
        # agreement away from edges
        inter = (ours > 0.5) & (ref > 0)
        union = (ours > 0.5) | (ref > 0)
        assert inter.sum() / union.sum() > 0.95

    def test_interior_points_ignored(self):
        pts = np.array(
            [[8, 8], [40, 8], [40, 40], [8, 40], [24, 24]], np.float32
        )  # last point interior
        ours = np.asarray(W.convex_mask(jnp.asarray(pts), 48, 48))
        assert ours[24, 24] == 1.0
        assert ours[10, 10] == 1.0
        assert ours[4, 4] == 0.0

    def test_landmark_hull_vs_cv2(self):
        from faceoff_tpu.data.synthetic import face_landmarks

        lms = face_landmarks((64, 64), 40)[17:67]
        ours = np.asarray(W.convex_mask(jnp.asarray(lms), 128, 128))
        ref = np.zeros((128, 128), np.uint8)
        hull = cv2.convexHull(lms.astype(np.int32))
        cv2.fillConvexPoly(ref, hull, 1)
        inter = (ours > 0.5) & (ref > 0)
        union = (ours > 0.5) | (ref > 0)
        assert inter.sum() / union.sum() > 0.95


class TestBarrel:
    def test_identity_at_d1(self):
        img = np.random.default_rng(0).uniform(size=(32, 32, 1)).astype(np.float32)
        xs, ys = W.barrel_grid(32, 32, 0.0, 0.0, 0.0, 1.0)
        out = W.warp_with_grid(jnp.asarray(img), xs, ys)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)

    def test_distortion_moves_pixels(self):
        img = np.zeros((64, 64, 1), np.float32)
        img[10:14, 10:14] = 1.0
        xs, ys = W.barrel_grid(64, 64, 0.0, 0.5, 0.0, 1.0)
        out = np.asarray(W.warp_with_grid(jnp.asarray(img), xs, ys))
        assert not np.allclose(out, img)


class TestPerturbClip:
    def test_shapes_and_determinism(self):
        faces = jnp.asarray(
            np.random.default_rng(0).uniform(size=(4, 64, 64, 3)), jnp.float32
        )
        eyes = jnp.full((4, 2), 32.0)
        out1 = W.perturb_clip(jax.random.key(1), faces, eyes)
        out2 = W.perturb_clip(jax.random.key(1), faces, eyes)
        assert out1.shape == faces.shape
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_always_perturbs(self):
        faces = jnp.asarray(
            np.random.default_rng(0).uniform(0.2, 1, (8, 32, 32, 3)), jnp.float32
        )
        eyes = jnp.full((8, 2), 16.0)
        out = W.perturb_clip(jax.random.key(3), faces, eyes)
        diffs = np.abs(np.asarray(out) - np.asarray(faces)).mean(axis=(1, 2, 3))
        assert (diffs > 1e-5).all()  # every frame changed

    def test_jittable(self):
        f = jax.jit(W.perturb_clip)
        faces = jnp.zeros((2, 32, 32, 3))
        eyes = jnp.full((2, 2), 16.0)
        out = f(jax.random.key(0), faces, eyes)
        assert out.shape == faces.shape


class TestPerturbationDistributionParity:
    """The device pipeline must train on the SAME corruption distribution
    as the host path (reference perturbations.py:131-165,208-264): uniform
    non-empty subsets, discrete parameter grids, all three distortions."""

    N = 400

    def _host_energy(self, img, lms):
        from faceoff_tpu.data import perturbations as P

        rng = np.random.default_rng(0)
        es = []
        for _ in range(self.N):
            out, _ = P.perturb_image_composite(img, lms, rng)
            es.append(np.abs(out - img).mean())
        return np.asarray(es)

    def _device_energy(self, img, lms):
        from faceoff_tpu.data.perturbations import find_eye_center

        faces = jnp.asarray(np.broadcast_to(img, (self.N,) + img.shape))
        eye = np.asarray(find_eye_center(lms), np.float32)
        eyes = jnp.asarray(np.broadcast_to(eye, (self.N, 2)))
        out = np.asarray(W.perturb_clip(jax.random.key(0), faces, eyes))
        return np.abs(out - img[None]).mean(axis=(1, 2, 3))

    def test_corruption_energy_moments_match(self):
        """Mean/std of per-frame corruption energy agree between the host
        (cv2/reference-grid) and device (fused-grid) pipelines."""
        from faceoff_tpu.data.synthetic import draw_face, face_landmarks

        img = np.zeros((64, 64, 3), np.uint8)
        lms = face_landmarks((32, 32), 18)
        draw_face(img, lms, (205, 165, 135))
        imgf = img.astype(np.float32) / 255.0

        he = self._host_energy(imgf, lms)
        de = self._device_energy(imgf, lms)
        # Individual transforms match to ~1e-7 (see the per-op diagnostic
        # in the commit history); the residual composite gap is the host's
        # SEQUENTIAL resampling (each cv2 op bilinear/cubic-resamples the
        # previous output, compounding interpolation blur) vs the device's
        # single fused gather — so host energy reads slightly high.
        assert abs(he.mean() - de.mean()) / he.mean() < 0.15, (
            he.mean(), de.mean()
        )
        assert abs(he.std() - de.std()) / he.std() < 0.25, (he.std(), de.std())
        # >=1 perturbation is guaranteed, but a drawn amount can still be
        # identity (0 px / 0 deg / 100%), so only most frames must change —
        # on BOTH paths alike
        assert (he > 1e-4).mean() > 0.9
        assert (de > 1e-4).mean() > 0.9

    def test_subset_is_uniform_nonempty(self):
        """The device subset sampler reproduces the reference's
        redraw-until-nonempty semantics: uniform over the 31 non-empty
        subsets => each perturbation enabled with P = 16/31."""
        key = jax.random.key(7)
        subset = jax.random.randint(key, (20000,), 1, 32)
        s = np.asarray(subset)
        assert s.min() >= 1
        for k in range(5):
            p = ((s >> k) & 1).mean()
            assert abs(p - 16 / 31) < 0.01, (k, p)
