"""Bit-parity of the fused Pallas VQ kernel against the pure-XLA reference
implementation (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.ops import vq as vq_ops
from faceoff_tpu.ops import vq_pallas


@pytest.mark.parametrize("n", [512, 1024, 700])  # includes non-tile-multiple
def test_assign_matches_reference(n):
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    d, k = 64, 512
    flat = jax.random.normal(k1, (n, d), jnp.float32)
    embed = jax.random.normal(k2, (d, k), jnp.float32)

    idx_p, quant_p, counts_p, sums_p = vq_pallas.vq_assign(flat, embed)

    idx_r = vq_ops.nearest_code(flat, embed)
    counts_r, sums_r = vq_ops.vq_stats(flat, idx_r, k)
    quant_r = vq_ops.codebook_lookup(idx_r, embed)

    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_allclose(
        np.asarray(quant_p), np.asarray(quant_r), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(counts_p), np.asarray(counts_r), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sums_p), np.asarray(sums_r), rtol=1e-4, atol=1e-3
    )
    assert float(jnp.sum(counts_p)) == n  # padding rows excluded


def test_train_path_with_pallas_matches(monkeypatch):
    """vq_quantize_train(use_pallas=True) == pure path."""
    cb = vq_ops.init_codebook(jax.random.key(3), 64, 512)
    x = jax.random.normal(jax.random.key(4), (16, 8, 64))

    q1, i1, d1, cb1 = vq_ops.vq_quantize_train(cb, x, use_pallas=False)
    q2, i2, d2, cb2 = vq_ops.vq_quantize_train(cb, x, use_pallas=True)

    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cb1.embed), np.asarray(cb2.embed), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "n,k",
    [
        (1024, 4096),   # tile-multiple rows, tiled codebook
        (1500, 4096),   # rows not a multiple of the big row tile
        (1024, 3000),   # codebook not a multiple of TILE_K (padding masked)
    ],
)
def test_ktiled_assign_matches_reference(n, k):
    """Codebooks past the single-pass VMEM ceiling stream through the
    K-tiled two-kernel path; it must match the XLA reference exactly
    (the single-pass kernel VMEM-OOMs at K=8192 on a v5e)."""
    d = 64
    k1, k2 = jax.random.split(jax.random.key(7))
    flat = jax.random.normal(k1, (n, d), jnp.float32)
    embed = jax.random.normal(k2, (d, k), jnp.float32)
    assert k > vq_pallas._MAX_SINGLE_PASS_K  # exercises the tiled route

    idx_p, quant_p, counts_p, sums_p = vq_pallas.vq_assign(flat, embed)

    idx_r = vq_ops.nearest_code(flat, embed)
    counts_r, sums_r = vq_ops.vq_stats(flat, idx_r, k)
    quant_r = vq_ops.codebook_lookup(idx_r, embed)

    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_allclose(
        np.asarray(quant_p), np.asarray(quant_r), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(counts_p), np.asarray(counts_r), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sums_p), np.asarray(sums_r), rtol=1e-4, atol=1e-3
    )
    assert float(jnp.sum(counts_p)) == n
    assert idx_p.shape == (n,) and quant_p.shape == (n, d)
    assert counts_p.shape == (k,) and sums_p.shape == (d, k)
