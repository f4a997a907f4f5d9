"""Unit tests for the pure-functional EMA vector quantizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.ops import vq as vq_ops


def make_codebook(dim=8, n_embed=16, seed=0):
    return vq_ops.init_codebook(jax.random.key(seed), dim, n_embed)


class TestNearestCode:
    def test_matches_bruteforce_l2(self):
        cb = make_codebook()
        x = jax.random.normal(jax.random.key(1), (64, 8))
        idx = vq_ops.nearest_code(x, cb.embed)
        # brute force squared distances
        d = np.linalg.norm(
            np.asarray(x)[:, None, :] - np.asarray(cb.embed).T[None, :, :], axis=-1
        )
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))

    def test_exact_code_maps_to_itself(self):
        cb = make_codebook()
        x = cb.embed.T  # each row is exactly a code
        idx = vq_ops.nearest_code(x, cb.embed)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(cb.n_embed))


class TestLookup:
    def test_shapes_and_straight_through(self):
        cb = make_codebook()
        x = jax.random.normal(jax.random.key(2), (4, 5, 8))
        quant, idx, diff = vq_ops.vq_lookup(cb, x)
        assert quant.shape == x.shape
        assert idx.shape == (4, 5)
        assert diff.shape == ()
        # straight-through: d quant / d x == identity
        f = lambda x: jnp.sum(vq_ops.vq_lookup(cb, x)[0] * 3.0)
        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(g), rtol=1e-6)

    def test_diff_is_commitment_mse(self):
        cb = make_codebook()
        x = jax.random.normal(jax.random.key(3), (32, 8))
        quant, idx, diff = vq_ops.vq_lookup(cb, x)
        q = np.asarray(cb.embed).T[np.asarray(idx)]
        np.testing.assert_allclose(
            float(diff), np.mean((q - np.asarray(x)) ** 2), rtol=1e-5
        )


class TestEmaUpdate:
    def test_stats(self):
        cb = make_codebook(dim=4, n_embed=6)
        flat = jax.random.normal(jax.random.key(4), (100, 4))
        idx = vq_ops.nearest_code(flat, cb.embed)
        counts, sums = vq_ops.vq_stats(flat, idx, 6)
        assert float(jnp.sum(counts)) == 100
        np.testing.assert_allclose(
            np.asarray(sums).sum(axis=1),
            np.asarray(flat).sum(axis=0),
            rtol=1e-2,
            atol=1e-2,
        )

    def test_codes_move_toward_data(self):
        """Repeated EMA updates on fixed data shrink quantization error."""
        cb = make_codebook(dim=4, n_embed=8, seed=5)
        data = jax.random.normal(jax.random.key(6), (512, 4)) * 2.0

        def err(cb):
            q, _, diff = vq_ops.vq_lookup(cb, data)
            return float(diff)

        e0 = err(cb)
        for _ in range(50):
            _, _, _, cb = vq_ops.vq_quantize_train(cb, data, decay=0.8)
        assert err(cb) < e0 * 0.75

    def test_update_is_deterministic(self):
        cb = make_codebook()
        x = jax.random.normal(jax.random.key(7), (64, 8))
        _, _, _, cb1 = vq_ops.vq_quantize_train(cb, x)
        _, _, _, cb2 = vq_ops.vq_quantize_train(cb, x)
        np.testing.assert_array_equal(np.asarray(cb1.embed), np.asarray(cb2.embed))


class TestCrossDevice:
    def test_psum_stats_match_global(self, devices):
        """Sharded stats + psum == global stats (the reference's NCCL
        all_reduce semantics, models/vqvae_conv3d_latent.py:60-64)."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        cb = make_codebook(dim=4, n_embed=8)
        x = jax.random.normal(jax.random.key(8), (8 * 16, 4))
        mesh = Mesh(np.array(devices), ("data",))

        def shard_fn(x):
            idx = vq_ops.nearest_code(x, cb.embed)
            counts, sums = vq_ops.vq_stats(x, idx, 8)
            return jax.lax.psum(counts, "data"), jax.lax.psum(sums, "data")

        counts_sh, sums_sh = shard_map(
            shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P()
        )(x)
        idx = vq_ops.nearest_code(x, cb.embed)
        counts, sums = vq_ops.vq_stats(x, idx, 8)
        np.testing.assert_allclose(np.asarray(counts_sh), np.asarray(counts), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sums_sh), np.asarray(sums), rtol=1e-5)


class TestPerplexity:
    def test_uniform_usage_is_n(self):
        idx = jnp.arange(16) % 4
        p = vq_ops.codebook_perplexity(idx, 4)
        np.testing.assert_allclose(float(p), 4.0, rtol=1e-4)

    def test_collapsed_usage_is_one(self):
        idx = jnp.zeros((16,), jnp.int32)
        p = vq_ops.codebook_perplexity(idx, 4)
        np.testing.assert_allclose(float(p), 1.0, rtol=1e-4)


class TestDeadCodeRevival:
    def test_dead_codes_reseeded(self):
        cb = make_codebook(dim=4, n_embed=8)
        # kill usage of half the codes
        cb = cb._replace(
            cluster_size=jnp.array([0.0, 5, 0, 5, 0, 5, 0, 5])
        )
        flat = jax.random.normal(jax.random.key(0), (64, 4)) + 10.0
        new = vq_ops.revive_dead_codes(cb, flat, jax.random.key(1))
        dead = np.array([0, 2, 4, 6])
        alive = np.array([1, 3, 5, 7])
        # dead codes moved into the data's range (mean ~10)
        assert np.asarray(new.embed).T[dead].mean() > 5.0
        np.testing.assert_array_equal(
            np.asarray(new.embed).T[alive], np.asarray(cb.embed).T[alive]
        )
        assert float(new.cluster_size[0]) == 1.0

    def test_no_dead_codes_noop(self):
        cb = make_codebook(dim=4, n_embed=8)
        cb = cb._replace(cluster_size=jnp.ones(8))
        flat = jax.random.normal(jax.random.key(0), (16, 4))
        new = vq_ops.revive_dead_codes(cb, flat, jax.random.key(1))
        np.testing.assert_array_equal(
            np.asarray(new.embed), np.asarray(cb.embed)
        )
