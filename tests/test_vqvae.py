"""Shape/dtype/behaviour tests for the VQVAE-2 generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE


def tiny_model(**kw):
    defaults = dict(
        in_channels=6,
        channel=16,
        n_res_block=1,
        n_res_channel=8,
        embed_dim=8,
        n_embed=32,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return VQVAE(**defaults)


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    video = jnp.zeros((1, 4, 64, 64, 6))
    variables = model.init(jax.random.key(0), video, train=False)
    return model, variables


class TestForward:
    def test_output_shapes(self, model_and_vars):
        model, variables = model_and_vars
        video = jax.random.normal(jax.random.key(1), (2, 4, 64, 64, 6))
        dec, diff = model.apply(variables, video, train=False)
        assert dec.shape == (2, 4, 64, 64, 6)
        assert dec.dtype == jnp.float32
        assert diff.shape == ()
        assert np.isfinite(np.asarray(dec)).all()

    def test_train_mutates_vq_only(self, model_and_vars):
        model, variables = model_and_vars
        video = jax.random.normal(jax.random.key(2), (1, 4, 64, 64, 6))
        (dec, diff), updates = model.apply(
            variables, video, train=True, mutable=["vq"]
        )
        assert set(updates.keys()) == {"vq"}
        old = jax.tree_util.tree_leaves(variables["vq"])
        new = jax.tree_util.tree_leaves(updates["vq"])
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(old, new)
        )
        assert changed, "EMA codebook should move during a training step"

    def test_eval_does_not_mutate(self, model_and_vars):
        model, variables = model_and_vars
        video = jax.random.normal(jax.random.key(3), (1, 4, 64, 64, 6))
        (dec, diff), updates = model.apply(
            variables, video, train=False, mutable=["vq"]
        )
        old = jax.tree_util.tree_leaves(variables["vq"])
        new = jax.tree_util.tree_leaves(updates["vq"])
        for a, b in zip(old, new):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latent_shapes(self, model_and_vars):
        model, variables = model_and_vars
        video = jnp.zeros((1, 4, 64, 64, 6))
        enc_b, enc_t = model.apply(variables, video, method=model.only_encode)
        assert enc_b.shape == (1, 4, 16, 16, 16)  # stride 4, channel 16
        assert enc_t.shape == (1, 4, 8, 8, 16)  # stride 8

    def test_encode_codes_and_decode_code_roundtrip(self, model_and_vars):
        model, variables = model_and_vars
        video = jax.random.normal(jax.random.key(4), (1, 4, 64, 64, 6))
        id_t, id_b = model.apply(variables, video, method=model.encode_codes)
        assert id_t.shape == (4, 8, 8)
        assert id_b.shape == (4, 16, 16)
        assert id_t.dtype == jnp.int32
        dec = model.apply(variables, id_t, id_b, method=model.decode_code)
        assert dec.shape == (4, 64, 64, 6)

    def test_gradients_flow_to_all_params(self, model_and_vars):
        model, variables = model_and_vars
        video = jax.random.normal(jax.random.key(5), (1, 4, 64, 64, 6))

        def loss_fn(params):
            (dec, diff), _ = model.apply(
                {"params": params, "vq": variables["vq"]},
                video,
                train=True,
                mutable=["vq"],
            )
            return jnp.mean((dec[..., :3] - video[..., :3]) ** 2) + diff

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
        # every parameter should receive gradient signal
        assert nonzero == len(leaves), f"{len(leaves) - nonzero} dead params"


class TestBfloat16:
    def test_bf16_compute_fp32_out(self):
        model = tiny_model(dtype=jnp.bfloat16)
        video = jnp.zeros((1, 2, 32, 32, 6))
        variables = model.init(jax.random.key(0), video, train=False)
        dec, diff = model.apply(variables, video, train=False)
        assert dec.dtype == jnp.float32
        # params stay fp32
        p = jax.tree_util.tree_leaves(variables["params"])
        assert all(x.dtype == jnp.float32 for x in p)
        # codebooks stay fp32
        v = jax.tree_util.tree_leaves(variables["vq"])
        assert all(x.dtype == jnp.float32 for x in v)


def test_commitment_beta_scales_latent_loss():
    import jax, jax.numpy as jnp
    from faceoff_tpu.models import VQVAE

    kw = dict(in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
              embed_dim=8, n_embed=32, dtype=jnp.float32)
    video = jax.random.uniform(
        jax.random.key(0), (1, 2, 32, 32, 6), minval=-1, maxval=1
    )
    m1 = VQVAE(**kw)
    v = m1.init(jax.random.key(1), video, train=False)
    _, d1 = m1.apply(v, video, train=False)
    m2 = VQVAE(**kw, commitment_beta=0.25)
    _, d2 = m2.apply(v, video, train=False)
    assert abs(float(d2) - 0.25 * float(d1)) < 1e-6


def test_revive_codes_restores_dead_entries():
    """revive_codes re-seeds EMA-dead codebook rows from batch latents
    while leaving live codes untouched."""
    import jax, jax.numpy as jnp, numpy as np
    from faceoff_tpu.models import VQVAE

    m = VQVAE(in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
              embed_dim=8, n_embed=32, dtype=jnp.float32)
    video = jax.random.uniform(
        jax.random.key(0), (1, 2, 32, 32, 6), minval=-1, maxval=1
    )
    variables = m.init(jax.random.key(1), video, train=False)

    # kill half the top codebook: zero its EMA usage
    vq = jax.tree_util.tree_map(lambda x: x, variables["vq"])
    import flax
    vq = flax.core.unfreeze(vq)
    cb = vq["quantize_t"]["codebook"]
    dead = np.zeros(cb.cluster_size.shape, bool)
    dead[:16] = True
    # fresh-init usage is all-zero (everything would read as dead), so mark
    # the live half explicitly
    cb = cb._replace(
        cluster_size=jnp.where(jnp.asarray(dead), 0.0, 1.0)
    )
    vq["quantize_t"]["codebook"] = cb

    _, updates = m.apply(
        {"params": variables["params"], "vq": vq},
        video, jax.random.key(2),
        method=VQVAE.revive_codes, mutable=["vq"],
    )
    new_cb = updates["vq"]["quantize_t"]["codebook"]
    # dead rows re-seeded (usage reset to 1, embeddings changed)
    np.testing.assert_allclose(np.asarray(new_cb.cluster_size[:16]), 1.0)
    assert not np.allclose(
        np.asarray(new_cb.embed[:, :16]), np.asarray(cb.embed[:, :16])
    )
    # live rows untouched
    np.testing.assert_array_equal(
        np.asarray(new_cb.embed[:, 16:]), np.asarray(cb.embed[:, 16:])
    )


@pytest.mark.parametrize("scope", ["all", "decoder", "encoder"])
def test_remat_parity(scope):
    """remat=True is a pure execution-plan change at EVERY remat_scope:
    identical param structure, outputs, and gradients (so checkpoints are
    interchangeable and the trainer's --remat/--remat_scope flags cannot
    alter training math)."""
    import jax
    import numpy as np

    kw = dict(in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
              embed_dim=8, n_embed=32, dtype=jnp.float32)
    x = jax.random.uniform(
        jax.random.key(0), (1, 4, 32, 32, 6), minval=-1, maxval=1
    )
    m0, m1 = VQVAE(**kw), VQVAE(remat=True, remat_scope=scope, **kw)
    v0 = m0.init(jax.random.key(1), x, train=False)
    v1 = m1.init(jax.random.key(1), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    d0, _ = m0.apply(v0, x, train=False)
    d1, _ = m1.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)

    def loss(params, model):
        out, lat = model.apply(
            {"params": params, "vq": v0["vq"]}, x, train=False
        )
        return jnp.mean(out ** 2) + lat

    g0 = jax.grad(loss)(v0["params"], m0)
    g1 = jax.grad(loss)(v0["params"], m1)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
