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

    def test_sharded_gan_steps(self, devices):
        """GAN gen/disc steps run with clip-sharded batches over the mesh
        (the reference's multi-GPU disc trainer path, DDP -> mesh)."""
        from faceoff_tpu.models.discriminators import (
            MultiscaleDiscriminator2D,
            MultiscaleDiscriminator3D,
        )
        from faceoff_tpu.train import create_train_state
        from faceoff_tpu.train.gan import create_gan_state, make_gan_steps

        model = tiny_model()
        d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
        d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)
        B, T, HW, SF = 8, 6, 32, 4
        gt = jax.random.uniform(
            jax.random.key(0), (B, T, HW, HW, 3), minval=-1, maxval=1
        )
        batch = {"input": jnp.concatenate([gt, gt], -1), "gt": gt}
        gen_state = create_train_state(
            model, jax.random.key(1), batch["input"], lr=1e-4
        )
        state = create_gan_state(
            gen_state, d_img, d_3d, jax.random.key(2),
            sample_frames=SF, image_hw=HW, disc_lr=1e-4,
        )
        gen_step, disc_step = make_gan_steps(
            model, d_img, d_3d, sample_frames=SF, donate=False
        )
        mesh = make_mesh(data=8)
        sharded = shard_batch(batch, mesh)
        state, gm = gen_step(state, sharded, jax.random.key(3))
        state, dm = disc_step(state, sharded, jax.random.key(4))
        assert np.isfinite(float(gm["g_loss"]))
        assert np.isfinite(float(dm["d_3d_loss"]))

    def test_long_clip_time_sharded_train_step(self, devices):
        """Long-clip (T=64) TRAINING with the frame axis sharded 8-way —
        the sequence-parallel regime (SURVEY §5: shard T with halo
        exchanges around the Conv3D receptive field; here XLA's SPMD
        partitioner inserts them). The sharded optimizer step must match
        the unsharded one: loss, metrics, and updated parameters."""
        from faceoff_tpu.train import create_train_state, make_train_step

        model = tiny_model()
        t_frames = 64
        gt = jax.random.uniform(
            jax.random.key(5), (1, t_frames, 32, 32, 3), minval=-1, maxval=1
        )
        batch = {"input": jnp.concatenate([gt, gt], -1), "gt": gt}
        state = create_train_state(
            model, jax.random.key(6), batch["input"], lr=1e-3
        )
        step = make_train_step(model, donate=False)

        ref_state, ref_m = step(state, batch)

        mesh = make_mesh(data=1, time=8)
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(None, "time"))
            ),
            batch,
        )
        repl = NamedSharding(mesh, P())
        state_r = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl)
            if isinstance(x, jax.Array) else x,
            state,
        )
        out_state, m = step(state_r, sharded)

        np.testing.assert_allclose(
            float(m["loss"]), float(ref_m["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m["mse"]), float(ref_m["mse"]), rtol=1e-5
        )
        for ref_leaf, leaf in zip(
            jax.tree_util.tree_leaves(ref_state.params),
            jax.tree_util.tree_leaves(out_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref_leaf),
                rtol=1e-4, atol=1e-5,
            )

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
