"""VQVAE_B2F (blob2full) variant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.models.vqvae_b2f import VQVAE_B2F


def test_forward_shapes_and_vq_update():
    model = VQVAE_B2F(
        in_channels=3, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    x = tuple(
        jax.random.normal(jax.random.key(i), (2, 64, 64, 3)) for i in range(3)
    )
    variables = model.init(jax.random.key(9), x, train=False)
    dec, diff = model.apply(variables, x, train=False)
    assert dec.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(dec)).all()
    assert diff.shape == ()

    (dec, diff), ups = model.apply(variables, x, train=True, mutable=["vq"])
    # six codebooks (2 per tower) all present
    leaves = jax.tree_util.tree_leaves(ups["vq"])
    assert len(leaves) == 6 * 3  # 6 codebooks x 3 arrays each
