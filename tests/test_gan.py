"""GAN stage tests: alternating gen/disc steps run, losses finite,
parameter partitions update correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.discriminators import (
    MultiscaleDiscriminator2D,
    MultiscaleDiscriminator3D,
)
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.gan import GANTrainState, create_gan_state, make_gan_steps

SAMPLE_FRAMES = 4
HW = 32


@pytest.fixture(scope="module")
def setup():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (1, 6, HW, HW, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (1, 6, HW, HW, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}

    gen_state = create_train_state(model, k3, batch["input"], lr=1e-4)
    state = create_gan_state(
        gen_state, d_img, d_3d, jax.random.key(1),
        sample_frames=SAMPLE_FRAMES, image_hw=HW, disc_lr=1e-4,
    )
    gen_step, disc_step = make_gan_steps(
        model, d_img, d_3d, sample_frames=SAMPLE_FRAMES, donate=False
    )
    return state, batch, gen_step, disc_step


def _flat(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


class TestGANSteps:
    def test_alternating_steps_finite(self, setup):
        state, batch, gen_step, disc_step = setup
        for i in range(4):
            key = jax.random.key(100 + i)
            if i % 2 == 0:
                state, m = gen_step(state, batch, key)
                assert np.isfinite(float(m["g_loss"]))
                assert np.isfinite(float(m["g_2d"]))
                assert np.isfinite(float(m["g_3d"]))
            else:
                state, m = disc_step(state, batch, key)
                assert np.isfinite(float(m["d_3d_loss"]))
                assert np.isfinite(float(m["d_img_loss"]))

    def test_gen_step_updates_gen_only(self, setup):
        state, batch, gen_step, disc_step = setup
        new_state, _ = gen_step(state, batch, jax.random.key(0))
        # generator moved
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(_flat(state.gen.params), _flat(new_state.gen.params))
        )
        assert moved
        # discriminators untouched
        for a, b in zip(
            _flat(state.d_img_params), _flat(new_state.d_img_params)
        ):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(
            _flat(state.d_3d_params), _flat(new_state.d_3d_params)
        ):
            np.testing.assert_array_equal(a, b)

    def test_disc_step_updates_discs_only(self, setup):
        state, batch, gen_step, disc_step = setup
        new_state, _ = disc_step(state, batch, jax.random.key(0))
        for a, b in zip(_flat(state.gen.params), _flat(new_state.gen.params)):
            np.testing.assert_array_equal(a, b)
        moved_img = any(
            not np.array_equal(a, b)
            for a, b in zip(
                _flat(state.d_img_params), _flat(new_state.d_img_params)
            )
        )
        moved_3d = any(
            not np.array_equal(a, b)
            for a, b in zip(
                _flat(state.d_3d_params), _flat(new_state.d_3d_params)
            )
        )
        assert moved_img and moved_3d


def test_gan_steps_with_device_pipeline():
    """Raw {frames, landmarks} batches prepare on-device inside the fused
    GAN steps."""
    from faceoff_tpu.data.device_pipeline import prepare_train_batch
    from faceoff_tpu.data.synthetic import face_landmarks

    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)
    T = 6
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, T, HW, HW, 3)).astype(np.uint8)
    lms = np.stack(
        [[face_landmarks((HW / 2, HW / 2), HW * 0.3) for _ in range(T)]]
    ).astype(np.float32)
    raw = {"frames": jnp.asarray(frames), "landmarks": jnp.asarray(lms)}

    gen_state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, T, HW, HW, 6)), lr=1e-4
    )
    state = create_gan_state(
        gen_state, d_img, d_3d, jax.random.key(1),
        sample_frames=SAMPLE_FRAMES, image_hw=HW, disc_lr=1e-4,
    )
    gen_step, disc_step = make_gan_steps(
        model, d_img, d_3d, sample_frames=SAMPLE_FRAMES,
        prepare_fn=prepare_train_batch, donate=False,
    )
    state, gm = gen_step(state, raw, jax.random.key(2))
    state, dm = disc_step(state, raw, jax.random.key(3))
    assert np.isfinite(float(gm["g_loss"]))
    assert np.isfinite(float(dm["d_3d_loss"]))
