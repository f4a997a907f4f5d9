"""MoCoGAN BCE stage tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.discriminators import (
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
)
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.mocogan import create_mocogan_state, make_mocogan_step

# patch discriminators need enough spatial/temporal extent: the image disc
# halves H six times, the video disc consumes 3 frames per k=4 valid-time
# conv (reference runs them at 256px / 16 frames)
HW, T = 64, 16


@pytest.fixture(scope="module")
def setup():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = PatchImageDiscriminator(ndf=8)
    d_vid = PatchVideoDiscriminator(ndf=8)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (1, T, HW, HW, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (1, T, HW, HW, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}
    gen_state = create_train_state(model, k3, batch["input"], lr=1e-4)
    state = create_mocogan_state(
        gen_state, d_img, d_vid, jax.random.key(1), frames=T, image_hw=HW,
        disc_lr=1e-4,
    )
    step = make_mocogan_step(model, d_img, d_vid, donate=False)
    return state, batch, step


class TestMocoganStep:
    def test_runs_and_finite(self, setup):
        state, batch, step = setup
        for i in range(2):
            state, m = step(state, batch, jax.random.key(i))
            for k in ("g_loss", "mse", "g_img", "g_vid", "d_img_loss", "d_vid_loss"):
                assert np.isfinite(float(m[k])), k

    def test_all_three_update(self, setup):
        state, batch, step = setup
        new_state, _ = step(state, batch, jax.random.key(9))

        def moved(a, b):
            return any(
                not np.array_equal(np.asarray(x), np.asarray(y))
                for x, y in zip(
                    jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
                )
            )

        assert moved(state.gen.params, new_state.gen.params)
        assert moved(
            state.d_img_vars["params"], new_state.d_img_vars["params"]
        )
        assert moved(
            state.d_vid_vars["params"], new_state.d_vid_vars["params"]
        )
        # BatchNorm running stats advanced
        assert moved(
            state.d_img_vars["batch_stats"], new_state.d_img_vars["batch_stats"]
        )


class TestDiscNoise:
    """use_noise discriminators (reference mocogan_discriminator.py:16-25):
    a 'noise' rng activates additive gaussian input noise at every conv
    stage; without the rng the layers are transparent."""

    def _logits(self, d, x, rngs=None):
        v = d.init(jax.random.key(0), x, train=False)
        kw = {"rngs": rngs} if rngs else {}
        return d.apply(v, x, train=True, mutable=["batch_stats"], **kw)[0]

    def test_noise_changes_logits_only_with_rng(self):
        x = jax.random.uniform(
            jax.random.key(1), (1, HW, HW, 3), minval=-1, maxval=1
        )
        d = PatchImageDiscriminator(ndf=8, use_noise=True, noise_sigma=0.5)
        base = self._logits(d, x)
        noisy1 = self._logits(d, x, rngs={"noise": jax.random.key(2)})
        noisy2 = self._logits(d, x, rngs={"noise": jax.random.key(3)})
        # no rng -> deterministic, identical to a use_noise=False disc
        plain = self._logits(PatchImageDiscriminator(ndf=8), x)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(plain), rtol=1e-6
        )
        assert not np.allclose(np.asarray(base), np.asarray(noisy1))
        assert not np.allclose(np.asarray(noisy1), np.asarray(noisy2))

    def test_video_disc_noise(self):
        x = jax.random.uniform(
            jax.random.key(1), (1, T, HW, HW, 3), minval=-1, maxval=1
        )
        d = PatchVideoDiscriminator(ndf=8, use_noise=True, noise_sigma=0.5)
        base = self._logits(d, x)
        noisy = self._logits(d, x, rngs={"noise": jax.random.key(2)})
        assert not np.allclose(np.asarray(base), np.asarray(noisy))

    def test_full_step_with_noisy_discs(self):
        model = VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32,
        )
        d_img = PatchImageDiscriminator(ndf=8, use_noise=True)
        d_vid = PatchVideoDiscriminator(ndf=8, use_noise=True)
        gt = jax.random.uniform(
            jax.random.key(0), (1, T, HW, HW, 3), minval=-1, maxval=1
        )
        batch = {"input": jnp.concatenate([gt, gt], axis=-1), "gt": gt}
        gen_state = create_train_state(
            model, jax.random.key(1), batch["input"], lr=1e-4
        )
        state = create_mocogan_state(
            gen_state, d_img, d_vid, jax.random.key(2), frames=T,
            image_hw=HW, disc_lr=1e-4,
        )
        step = make_mocogan_step(model, d_img, d_vid, donate=False)
        state, m = step(state, batch, jax.random.key(3))
        for k in ("g_loss", "d_img_loss", "d_vid_loss"):
            assert np.isfinite(float(m[k]))
