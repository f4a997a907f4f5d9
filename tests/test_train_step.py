"""End-to-end train-step smoke tests: loss decreases on a tiny synthetic
problem; metrics are finite; sharded execution matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.train import create_train_state, make_train_step, make_eval_step
from faceoff_tpu.train.state import make_optimizer, current_lr


def tiny_model():
    return VQVAE(
        in_channels=6,
        channel=16,
        n_res_block=1,
        n_res_channel=8,
        embed_dim=8,
        n_embed=32,
        dtype=jnp.float32,
    )


def make_batch(key, b=1, t=4, hw=32):
    k1, k2 = jax.random.split(key)
    gt = jax.random.uniform(k1, (b, t, hw, hw, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (b, t, hw, hw, 3), minval=-1, maxval=1)
    return {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}


class TestTrainStep:
    def test_loss_decreases(self):
        model = tiny_model()
        batch = make_batch(jax.random.key(0))
        state = create_train_state(
            model, jax.random.key(1), batch["input"], lr=1e-3
        )
        step = make_train_step(model, donate=False)
        losses = []
        for _ in range(30):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

    def test_step_counter_and_lr(self):
        model = tiny_model()
        batch = make_batch(jax.random.key(0))
        tx = make_optimizer(1e-3, "cycle", n_iter=100)
        state = create_train_state(model, jax.random.key(1), batch["input"], tx=tx)
        step = make_train_step(model, donate=False)
        state, _ = step(state, batch)
        state, _ = step(state, batch)
        assert int(state.step) == 2
        assert np.isfinite(current_lr(state))

    def test_step_emits_lr_metric_tracking_schedule(self):
        """The jitted step outputs lr as a fresh metric buffer (so logging
        never reads — or aliases — the donated train state). The emitted
        value must track the schedule exactly: after step k the state holds
        the lr used at iteration k-1 (schedule evaluated at count k-1)."""
        from faceoff_tpu.train.schedule import make_schedule

        model = tiny_model()
        batch = make_batch(jax.random.key(0))
        n_iter = 50
        tx = make_optimizer(1e-3, "cycle", n_iter=n_iter)
        sched = make_schedule("cycle", 1e-3, n_iter)
        state = create_train_state(
            model, jax.random.key(1), batch["input"], tx=tx
        )
        step = make_train_step(model, donate=False)
        for k in range(3):
            state, metrics = step(state, batch)
            assert "lr" in metrics
            np.testing.assert_allclose(
                float(metrics["lr"]), float(sched(k)), rtol=1e-6,
                err_msg=f"step {k}",
            )

    def test_eval_step(self):
        model = tiny_model()
        batch = make_batch(jax.random.key(0))
        state = create_train_state(model, jax.random.key(1), batch["input"])
        eval_step = make_eval_step(model)
        out, metrics = eval_step(state, batch)
        assert out.shape == batch["gt"].shape
        assert np.isfinite(float(metrics["mse"]))


class TestShardedTraining:
    def test_dp_metrics_match_single_device(self, devices):
        """Global-batch training under a sharded mesh must produce the same
        loss as unsharded execution (XLA inserts the collectives that the
        reference got from DDP + NCCL all_reduce)."""
        from faceoff_tpu.parallel import make_mesh, shard_batch

        model = tiny_model()
        batch = make_batch(jax.random.key(0), b=8)
        state = create_train_state(model, jax.random.key(1), batch["input"])
        step = make_train_step(model, donate=False)

        # single-device result
        s1, m1 = step(state, batch)

        mesh = make_mesh(data=8)
        sharded = shard_batch(batch, mesh)
        s2, m2 = step(state, sharded)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-4
        )
        # codebooks advanced identically
        l1 = jax.tree_util.tree_leaves(s1.vq)
        l2 = jax.tree_util.tree_leaves(s2.vq)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )


def test_remat_lpips_grad_parity():
    """jax.checkpoint around lpips_apply (the --remat_lpips flag) is a pure
    execution-plan change: identical loss and gradients, so the 512px
    memory lever cannot alter training math."""
    from faceoff_tpu.models.lpips import init_lpips

    model = tiny_model()
    batch = make_batch(jax.random.key(0), hw=64)
    lpips_model, lpips_vars = init_lpips(
        jax.random.key(2), image_size=64, dtype=jnp.float32
    )
    state = create_train_state(
        model, jax.random.key(1), batch["input"], lr=1e-3
    )

    plain = lambda v, a, b: lpips_model.apply(v, a, b)
    step0 = make_train_step(model, lpips_apply=plain, donate=False)
    step1 = make_train_step(
        model, lpips_apply=jax.checkpoint(plain), donate=False
    )

    s0, m0 = step0(state, batch, lpips_vars)
    s1, m1 = step1(state, batch, lpips_vars)

    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m0["perceptual"]), float(m1["perceptual"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s0.params),
        jax.tree_util.tree_leaves(s1.params),
    ):
        # recompute changes XLA fusion order, so allow float-accumulation
        # noise (observed: 1/2048 elements off by ~2e-6 on CPU)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
