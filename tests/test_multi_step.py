"""Multi-step-per-dispatch (lax.scan) training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.models import VQVAE
from faceoff_tpu.train import create_train_state, make_train_step
from faceoff_tpu.train.train_step import make_multi_step


def test_multi_step_matches_single_chain():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    K, B, T, HW = 3, 1, 2, 32
    key = jax.random.key(0)
    gt = jax.random.uniform(key, (K, B, T, HW, HW, 3), minval=-1, maxval=1)
    batches = {"input": jnp.concatenate([gt, gt], -1), "gt": gt}
    state = create_train_state(model, key, batches["input"][0], lr=1e-3)
    keys = jax.random.split(jax.random.key(1), K)

    multi = make_multi_step(model, K, donate=False)
    s_multi, m = multi(state, batches, None, keys)
    assert int(s_multi.step) == K
    assert np.isfinite(float(m["loss_mean"]))

    single = make_train_step(model, donate=False)
    s = state
    for i in range(K):
        s, ms = single(
            s, jax.tree_util.tree_map(lambda x: x[i], batches), None, keys[i]
        )
    np.testing.assert_allclose(float(ms["loss"]), float(m["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s.params),
        jax.tree_util.tree_leaves(s_multi.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
