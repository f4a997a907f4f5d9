"""VQGAN-style trainer tests: adaptive weight, disc gating, updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.discriminators import NLayerDiscriminator
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.vqgan import create_vqgan_state, make_vqgan_steps

HW, T = 32, 4


@pytest.fixture(scope="module")
def setup():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (1, T, HW, HW, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (1, T, HW, HW, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}
    gen_state = create_train_state(model, k3, batch["input"], lr=1e-4)
    state = create_vqgan_state(
        gen_state, disc, jax.random.key(1), image_hw=HW, disc_lr=1e-4
    )
    return model, disc, state, batch


class TestVQGAN:
    def test_steps_run_finite(self, setup):
        model, disc, state, batch = setup
        gen_step, disc_step = make_vqgan_steps(model, disc, donate=False)
        state, m = gen_step(state, batch)
        assert np.isfinite(float(m["g_loss"]))
        assert np.isfinite(float(m["d_weight"]))
        assert float(m["d_weight"]) >= 0
        state, dm = disc_step(state, batch)
        assert np.isfinite(float(dm["d_loss"]))

    def test_disc_start_gates_adversarial(self, setup):
        model, disc, state, batch = setup
        gen_step, disc_step = make_vqgan_steps(
            model, disc, disc_start=10_000, donate=False
        )
        # before disc_start: the adversarial term contributes 0 to d loss
        _, dm = disc_step(state, batch)
        assert float(dm["d_loss"]) == 0.0

    def test_hinge_variant(self, setup):
        model, disc, state, batch = setup
        gen_step, disc_step = make_vqgan_steps(
            model, disc, disc_loss="hinge", donate=False
        )
        _, dm = disc_step(state, batch)
        assert np.isfinite(float(dm["d_loss"]))
