"""LPIPS module tests: metric axioms + architecture shape checks."""

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.models.lpips import LPIPS, VGG16Slices, init_lpips


class TestVGGSlices:
    def test_tap_shapes(self):
        net = VGG16Slices()
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = net.init(jax.random.key(0), x)
        taps = net.apply(vars_, x)
        shapes = [t.shape for t in taps]
        # relu1_2..relu5_3 (reference models/lpips.py:139-152)
        assert shapes == [
            (1, 64, 64, 64),
            (1, 32, 32, 128),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 512),
        ]

    def test_13_convs(self):
        net = VGG16Slices()
        vars_ = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        convs = [k for k in vars_["params"] if k.startswith("conv")]
        assert len(convs) == 13  # VGG16


class TestLPIPS:
    def test_identity_is_zero(self):
        model, vars_ = init_lpips(jax.random.key(0), image_size=32)
        x = jax.random.uniform(
            jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1
        )
        d = model.apply(vars_, x, x)
        assert abs(float(d)) < 1e-6

    def test_differs_for_different_images(self):
        model, vars_ = init_lpips(jax.random.key(0), image_size=32)
        x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3), minval=-1, maxval=1)
        y = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), minval=-1, maxval=1)
        d = model.apply(vars_, x, y)
        assert abs(float(d)) > 0

    def test_grad_flows_to_pred(self):
        model, vars_ = init_lpips(jax.random.key(0), image_size=32)
        x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3), minval=-1, maxval=1)
        y = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), minval=-1, maxval=1)
        g = jax.grad(lambda y: model.apply(vars_, x, y))(y)
        assert float(jnp.sum(jnp.abs(g))) > 0
        assert np.isfinite(np.asarray(g)).all()
