"""Explicit-collectives (shard_map + psum) train step parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.parallel import make_mesh
from faceoff_tpu.train import create_train_state, make_train_step
from faceoff_tpu.train.shardmap_step import make_shardmap_train_step


def test_shardmap_matches_automatic(devices):
    mesh = make_mesh(data=8)

    def build(axis_name):
        return VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32,
            axis_name=axis_name,
        )

    key = jax.random.key(0)
    gt = jax.random.uniform(key, (8, 2, 32, 32, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, gt], -1), "gt": gt}

    # automatic partitioner path (axis-free model)
    auto_model = build(None)
    state_a = create_train_state(auto_model, jax.random.key(1), batch["input"])
    auto_step = make_train_step(auto_model, donate=False)
    sa, ma = auto_step(state_a, batch)

    # explicit shard_map path (same initial params; model psums VQ stats)
    sm_model = build("data")
    state_b = create_train_state(sm_model, jax.random.key(1), batch["input"])
    sm_step = make_shardmap_train_step(sm_model, mesh)
    sb, mb = sm_step(state_b, batch, None)

    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.params),
        jax.tree_util.tree_leaves(sb.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # EMA codebooks advanced identically (psum'd stats == global stats)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.vq), jax.tree_util.tree_leaves(sb.vq)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
