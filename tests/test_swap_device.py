"""On-device swap path parity vs the host geometry
(reference face_translation_videos3_utils.py:139-194)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.data import geometry
from faceoff_tpu.data.dataset import normalize
from faceoff_tpu.data.synthetic import draw_face, face_landmarks
from faceoff_tpu.ops import warp as W
from faceoff_tpu.ops.swap import prepare_swap_batch


def _frame(center, scale, color, size=128):
    img = np.zeros((size, size, 3), np.uint8)
    lms = face_landmarks(center, scale)
    draw_face(img, lms, color)
    return img, lms.astype(np.float32)


@pytest.fixture(scope="module")
def pair():
    src_img, src_lms = _frame((60, 64), 30, (205, 165, 135))
    tgt_img, tgt_lms = _frame((70, 60), 24, (150, 180, 120))
    return src_img, src_lms, tgt_img, tgt_lms


class TestUmeyamaParity:
    def test_matches_host_closed_form(self, pair):
        src_img, src_lms, tgt_img, tgt_lms = pair
        sp = np.asarray([33, 36, 39, 42, 45])
        m_host = geometry.umeyama_similarity(src_lms[sp], tgt_lms[sp])
        m_dev = np.asarray(
            W.umeyama_similarity(jnp.asarray(src_lms[sp]), jnp.asarray(tgt_lms[sp]))
        )
        np.testing.assert_allclose(m_dev, m_host, rtol=1e-4, atol=1e-4)

    def test_maps_points(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
        theta, s, t = 0.3, 1.2, np.array([5.0, -3.0])
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        dst = (s * src @ R.T + t).astype(np.float32)
        M = np.asarray(W.umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
        mapped = src @ M[:, :2].T + M[:, 2]
        np.testing.assert_allclose(mapped, dst, atol=1e-3)


class TestSwapParity:
    def test_streams_match_host_path(self, pair):
        """Device swap streams agree with generate_warped_image up to
        rasterization/interpolation edges (<3% of pixels may differ
        meaningfully; mean abs difference small)."""
        src_img, src_lms, tgt_img, tgt_lms = pair
        host = geometry.generate_warped_image(
            src_lms, tgt_lms, src_img, tgt_img
        )
        dev = prepare_swap_batch(
            jnp.asarray(src_img[None]), jnp.asarray(src_lms[None]),
            jnp.asarray(tgt_img[None]), jnp.asarray(tgt_lms[None]),
        )

        for dev_key, host_key in (
            ("source", "source_face_transformed"),
            ("background", "target_without_face_features"),
        ):
            d = np.asarray(dev[dev_key][0])
            hst = normalize(host[host_key])
            mad = np.abs(d - hst).mean()
            frac_big = (np.abs(d - hst).max(axis=-1) > 0.25).mean()
            assert mad < 0.04, (dev_key, mad)
            assert frac_big < 0.03, (dev_key, frac_big)

    def test_input_is_source_concat_background(self, pair):
        src_img, src_lms, tgt_img, tgt_lms = pair
        dev = prepare_swap_batch(
            jnp.asarray(src_img[None]), jnp.asarray(src_lms[None]),
            jnp.asarray(tgt_img[None]), jnp.asarray(tgt_lms[None]),
        )
        np.testing.assert_array_equal(
            np.asarray(dev["input"][..., :3]), np.asarray(dev["source"])
        )
        np.testing.assert_array_equal(
            np.asarray(dev["input"][..., 3:]), np.asarray(dev["background"])
        )
        assert dev["input"].dtype == jnp.float32
        assert float(dev["input"].min()) >= -1.0
        assert float(dev["input"].max()) <= 1.0

    def test_jit_batched(self, pair):
        src_img, src_lms, tgt_img, tgt_lms = pair
        n = 4
        out = prepare_swap_batch(
            jnp.asarray(np.stack([src_img] * n)),
            jnp.asarray(np.stack([src_lms] * n)),
            jnp.asarray(np.stack([tgt_img] * n)),
            jnp.asarray(np.stack([tgt_lms] * n)),
        )
        assert out["input"].shape == (n, 128, 128, 6)
        # all frames identical inputs -> identical outputs
        np.testing.assert_array_equal(
            np.asarray(out["input"][0]), np.asarray(out["input"][-1])
        )


class TestPoissonBlend:
    def test_device_matches_host_scipy(self, pair):
        """ops.swap.poisson_blend (lax.scan Jacobi) must match the host
        scipy-laplace implementation (geometry.poisson_blend, reference
        face_translation_videos3_utils.py:79-82) iteration for iteration."""
        from faceoff_tpu.ops.swap import poisson_blend as device_blend

        src_img, src_lms, tgt_img, tgt_lms = pair
        out = geometry.generate_warped_image(src_lms, tgt_lms, src_img, tgt_img)
        t01 = tgt_img / 255.0
        s01 = src_img / 255.0
        m01 = out["source_face_transformed"] / 255.0
        host = geometry.poisson_blend(t01, s01, m01, iters=48)
        dev = np.asarray(
            device_blend(
                jnp.asarray(t01), jnp.asarray(s01), jnp.asarray(m01),
                iters=48,
            )
        )
        np.testing.assert_allclose(dev, host, atol=2e-4)

    def test_batched_and_changes_output(self, pair):
        """prepare_swap_batch(poisson=True) runs batched under jit and
        produces a combined stream different from the hard paste."""
        src_img, src_lms, tgt_img, tgt_lms = pair
        args = (
            jnp.asarray(np.stack([src_img] * 2)),
            jnp.asarray(np.stack([src_lms] * 2)),
            jnp.asarray(np.stack([tgt_img] * 2)),
            jnp.asarray(np.stack([tgt_lms] * 2)),
        )
        paste = prepare_swap_batch(*args)["combined"]
        blended = prepare_swap_batch(*args, poisson=True, poisson_iters=32)[
            "combined"
        ]
        assert blended.shape == paste.shape
        assert np.all(np.asarray(blended) >= -1) and np.all(
            np.asarray(blended) <= 1
        )
        assert not np.allclose(np.asarray(blended), np.asarray(paste))
