"""Mesh-sharding tests: DP over clips, SP over frames (Conv3D halos come
from XLA's SPMD partitioner), and combined data x time meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from faceoff_tpu.models import VQVAE
from faceoff_tpu.parallel import batch_sharding, make_mesh, shard_batch


def tiny_model():
    return VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def model_vars():
    model = tiny_model()
    video = jnp.zeros((1, 8, 32, 32, 6))
    variables = model.init(jax.random.key(0), video, train=False)
    return model, variables


class TestMesh:
    def test_make_mesh_shapes(self, devices):
        m = make_mesh(data=4, time=2)
        assert m.devices.shape == (4, 2)
        assert m.axis_names == ("data", "time")
        m1 = make_mesh()
        assert m1.devices.size == 8

    def test_batch_sharding_specs(self, devices):
        m = make_mesh(data=4, time=2)
        s = batch_sharding(m, time_axis=1)
        assert s.spec == P("data", "time")


class TestShardedForward:
    def test_time_sharding_matches_unsharded(self, model_vars, devices):
        """Frame-axis (sequence-parallel) sharding: XLA partitions the
        Conv3D with halo exchanges; results must match the unsharded run."""
        model, variables = model_vars
        video = jax.random.normal(jax.random.key(1), (1, 8, 32, 32, 6))

        ref, ref_diff = jax.jit(
            lambda v: model.apply(variables, v, train=False)
        )(video)

        mesh = make_mesh(data=1, time=8)
        sharded = jax.device_put(
            video, NamedSharding(mesh, P(None, "time"))
        )
        out, diff = jax.jit(
            lambda v: model.apply(variables, v, train=False)
        )(sharded)

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(float(diff), float(ref_diff), rtol=1e-4)

    def test_data_time_combined(self, model_vars, devices):
        model, variables = model_vars
        video = jax.random.normal(jax.random.key(2), (4, 4, 32, 32, 6))
        ref, _ = jax.jit(lambda v: model.apply(variables, v, train=False))(video)

        mesh = make_mesh(data=4, time=2)
        sharded = jax.device_put(
            video, NamedSharding(mesh, P("data", "time"))
        )
        out, _ = jax.jit(lambda v: model.apply(variables, v, train=False))(sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
