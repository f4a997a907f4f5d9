"""GAN stage tests: alternating gen/disc steps run, losses finite,
parameter partitions update correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.models.discriminators import (
    MultiscaleDiscriminator2D,
    MultiscaleDiscriminator3D,
)
from faceoff_tpu.train import create_train_state
from faceoff_tpu.train.gan import GANTrainState, create_gan_state, make_gan_steps

SAMPLE_FRAMES = 4
HW = 32


@pytest.fixture(scope="module")
def setup():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (1, 6, HW, HW, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (1, 6, HW, HW, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}

    gen_state = create_train_state(model, k3, batch["input"], lr=1e-4)
    state = create_gan_state(
        gen_state, d_img, d_3d, jax.random.key(1),
        sample_frames=SAMPLE_FRAMES, image_hw=HW, disc_lr=1e-4,
    )
    gen_step, disc_step = make_gan_steps(
        model, d_img, d_3d, sample_frames=SAMPLE_FRAMES, donate=False
    )
    return state, batch, gen_step, disc_step


def _flat(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


class TestGANSteps:
    def test_alternating_steps_finite(self, setup):
        state, batch, gen_step, disc_step = setup
        for i in range(4):
            key = jax.random.key(100 + i)
            if i % 2 == 0:
                state, m = gen_step(state, batch, key)
                assert np.isfinite(float(m["g_loss"]))
                assert np.isfinite(float(m["g_2d"]))
                assert np.isfinite(float(m["g_3d"]))
            else:
                state, m = disc_step(state, batch, key)
                assert np.isfinite(float(m["d_3d_loss"]))
                assert np.isfinite(float(m["d_img_loss"]))

    def test_gen_step_updates_gen_only(self, setup):
        state, batch, gen_step, disc_step = setup
        new_state, _ = gen_step(state, batch, jax.random.key(0))
        # generator moved
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(_flat(state.gen.params), _flat(new_state.gen.params))
        )
        assert moved
        # discriminators untouched
        for a, b in zip(
            _flat(state.d_img_params), _flat(new_state.d_img_params)
        ):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(
            _flat(state.d_3d_params), _flat(new_state.d_3d_params)
        ):
            np.testing.assert_array_equal(a, b)

    def test_disc_step_updates_discs_only(self, setup):
        state, batch, gen_step, disc_step = setup
        new_state, _ = disc_step(state, batch, jax.random.key(0))
        for a, b in zip(_flat(state.gen.params), _flat(new_state.gen.params)):
            np.testing.assert_array_equal(a, b)
        moved_img = any(
            not np.array_equal(a, b)
            for a, b in zip(
                _flat(state.d_img_params), _flat(new_state.d_img_params)
            )
        )
        moved_3d = any(
            not np.array_equal(a, b)
            for a, b in zip(
                _flat(state.d_3d_params), _flat(new_state.d_3d_params)
            )
        )
        assert moved_img and moved_3d


def test_gan_state_checkpoint_roundtrip_exact(setup, tmp_path):
    """The FULL adversarial state (gen + both discs + all optimizer states)
    round-trips bit-exactly through the checkpoint manager — the reference
    saves module weights only and silently resets disc optimizers on
    resume (disc_trainers/train_vqvae_mocoganhd_disc_single.py:321-328)."""
    import dataclasses

    from faceoff_tpu.io.checkpoint import CheckpointManager

    state, batch, gen_step, disc_step = setup
    # advance a few steps so optimizer states are non-trivial
    for i in range(3):
        step = gen_step if i % 2 == 0 else disc_step
        state, _ = step(state, batch, jax.random.key(i))

    def bundle(s):
        return {
            f.name: getattr(s, f.name)
            for f in dataclasses.fields(s)
            if f.metadata.get("pytree_node", True) and f.name != "gen"
        }

    gen_mgr = CheckpointManager(str(tmp_path / "g"))
    disc_mgr = CheckpointManager(str(tmp_path / "g" / "disc"))
    gen_mgr.save(3, state.gen)
    disc_mgr.save(3, bundle(state))

    # restore into a freshly-initialized state: every leaf must match
    fresh = state.replace(
        gen=state.gen.replace(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.zeros_like, state.gen.params),
        )
    )
    gen_restored = gen_mgr.restore(fresh.gen)
    bundle_restored = disc_mgr.restore(bundle(fresh))
    restored = fresh.replace(gen=gen_restored, **bundle_restored)

    for a, b in zip(_flat(state), _flat(restored)):
        np.testing.assert_array_equal(a, b)

    # restored state trains identically to the original
    s1, m1 = disc_step(state, batch, jax.random.key(99))
    s2, m2 = disc_step(restored, batch, jax.random.key(99))
    np.testing.assert_allclose(
        float(m1["d_3d_loss"]), float(m2["d_3d_loss"]), rtol=1e-6
    )


def test_gan_steps_with_device_pipeline():
    """Raw {frames, landmarks} batches prepare on-device inside the fused
    GAN steps."""
    from faceoff_tpu.data.device_pipeline import prepare_train_batch
    from faceoff_tpu.data.synthetic import face_landmarks

    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)
    T = 6
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, T, HW, HW, 3)).astype(np.uint8)
    lms = np.stack(
        [[face_landmarks((HW / 2, HW / 2), HW * 0.3) for _ in range(T)]]
    ).astype(np.float32)
    raw = {"frames": jnp.asarray(frames), "landmarks": jnp.asarray(lms)}

    gen_state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, T, HW, HW, 6)), lr=1e-4
    )
    state = create_gan_state(
        gen_state, d_img, d_3d, jax.random.key(1),
        sample_frames=SAMPLE_FRAMES, image_hw=HW, disc_lr=1e-4,
    )
    gen_step, disc_step = make_gan_steps(
        model, d_img, d_3d, sample_frames=SAMPLE_FRAMES,
        prepare_fn=prepare_train_batch, donate=False,
    )
    state, gm = gen_step(state, raw, jax.random.key(2))
    state, dm = disc_step(state, raw, jax.random.key(3))
    assert np.isfinite(float(gm["g_loss"]))
    assert np.isfinite(float(dm["d_3d_loss"]))


def test_gan_multi_step_matches_sequential(setup):
    """make_gan_multi_step(K) over K microbatches == K sequential
    alternating gen/disc steps with the same batches and keys: identical
    final state (all parameter partitions + optimizer states) and the
    same per-iteration losses."""
    from faceoff_tpu.models.discriminators import (
        MultiscaleDiscriminator2D,
        MultiscaleDiscriminator3D,
    )
    from faceoff_tpu.train.gan import make_gan_multi_step

    state, batch, gen_step, disc_step = setup
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)

    k = 4
    keys = jax.random.split(jax.random.key(7), k)
    rng = np.random.default_rng(9)
    batches = {
        name: jnp.asarray(
            np.stack([
                np.asarray(batch[name]) * (1.0 - 0.05 * j) for j in range(k)
            ])
        )
        for name in ("input", "gt")
    }

    # sequential reference: gen on even, disc on odd (step_count from 0)
    seq_state = state
    seq_losses = []
    for j in range(k):
        b = {n: batches[n][j] for n in batches}
        if j % 2 == 0:
            seq_state, m = gen_step(seq_state, b, keys[j])
            seq_losses.append(float(m["g_loss"]))
        else:
            seq_state, m = disc_step(seq_state, b, keys[j])
            seq_losses.append(float(m["d_3d_loss"]))

    multi = make_gan_multi_step(
        model, d_img, d_3d, k, sample_frames=SAMPLE_FRAMES, donate=False
    )
    out_state, seq_metrics = multi(state, batches, keys)

    got = [
        float(seq_metrics["gen"]["g_loss"][j // 2]) if j % 2 == 0
        else float(seq_metrics["disc"]["d_3d_loss"][j // 2])
        for j in range(k)
    ]
    # per-iteration losses match the independently-jitted gen/disc steps
    np.testing.assert_allclose(got, seq_losses, rtol=1e-5)

    # exact-state check vs a pair-at-a-time chain of the SAME compiled
    # bodies (the independently-jitted steps fuse differently; Adam then
    # amplifies sub-ulp gradient differences on near-zero disc-bias grads
    # into +-lr sign flips, so cross-program bitwise parity is not a
    # valid expectation — same-program parity is)
    multi2 = make_gan_multi_step(
        model, d_img, d_3d, 2, sample_frames=SAMPLE_FRAMES, donate=False
    )
    chain_state = state
    for j in range(0, k, 2):
        chain_state, _ = multi2(
            chain_state,
            {n: batches[n][j: j + 2] for n in batches},
            keys[j: j + 2],
        )
    for a, b in zip(
        _flat((chain_state.gen.params, chain_state.d_img_params,
               chain_state.d_3d_params)),
        _flat((out_state.gen.params, out_state.d_img_params,
               out_state.d_3d_params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    with pytest.raises(ValueError, match="even"):
        make_gan_multi_step(
            model, d_img, d_3d, 3, sample_frames=SAMPLE_FRAMES
        )


def test_adv_scale_gates_adversarial_terms(setup):
    """adv_scale=0 (discriminator warmup) makes the gen step a pure
    reconstruction step: g_2d/g_3d still reported but not in the loss,
    and the update matches a recon-only objective direction (loss ==
    recon + latent)."""
    state, batch, gen_step, disc_step = setup
    key = jax.random.key(42)
    _, m_on = gen_step(state, batch, key, None, 1.0)
    _, m_off = gen_step(state, batch, key, None, 0.0)
    # same forward -> same recon/latent/adversarial raw values
    np.testing.assert_allclose(
        float(m_on["mse"]), float(m_off["mse"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_on["g_2d"]), float(m_off["g_2d"]), rtol=1e-6
    )
    # gated loss excludes the adversarial terms
    np.testing.assert_allclose(
        float(m_off["g_loss"]),
        float(m_off["mse"]) + float(m_off["latent"]),
        rtol=1e-5,
    )
    assert abs(
        float(m_on["g_loss"])
        - (float(m_on["mse"]) + float(m_on["latent"])
           + 0.25 * float(m_on["g_2d"]) + 0.25 * float(m_on["g_3d"]))
    ) < 1e-5


def test_custom_adversarial_weights(setup):
    """--g2d_weight/--g3d_weight reach the compiled loss: with custom
    weights the gen loss is recon + latent + w2d*g_2d + w3d*g_3d
    (reference config.py:9-10 hardcodes 0.25; the CLI exposes them for
    balancing adversarial vs reconstruction pressure)."""
    state, batch, _, _ = setup
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )
    d_img = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
    d_3d = MultiscaleDiscriminator3D(ndf=8, n_layers=2, num_D=2)
    gen_step, _ = make_gan_steps(
        model, d_img, d_3d, sample_frames=SAMPLE_FRAMES, donate=False,
        g_2d_weight=0.05, g_3d_weight=0.1,
    )
    _, m = gen_step(state, batch, jax.random.key(7), None, 1.0)
    assert abs(
        float(m["g_loss"])
        - (float(m["mse"]) + float(m["latent"])
           + 0.05 * float(m["g_2d"]) + 0.1 * float(m["g_3d"]))
    ) < 1e-5


def test_gan_cli_exposes_adversarial_weight_flags():
    from faceoff_tpu.cli.train_faceoff_gan import build_parser

    args = build_parser().parse_args(
        ["--data_root", "x", "--g2d_weight", "0.02", "--g3d_weight",
         "0.03", "--img_disc_weight", "0.4", "--vid_disc_weight", "0.6"]
    )
    assert args.g2d_weight == 0.02 and args.g3d_weight == 0.03
    assert args.img_disc_weight == 0.4 and args.vid_disc_weight == 0.6
    # defaults match the reference's config.py:9-13
    d = build_parser().parse_args(["--data_root", "x"])
    assert d.g2d_weight == 0.25 and d.g3d_weight == 0.25
    assert d.img_disc_weight == 0.5 and d.vid_disc_weight == 0.5


def test_adv_scale_schedule_ramp():
    from faceoff_tpu.train.gan import adv_scale_schedule

    # hard switch (ramp=0): 0 through the warmup, 1 after
    assert adv_scale_schedule(99, start=100) == 0.0
    assert adv_scale_schedule(100, start=100) == 1.0
    # linear ramp reaches 1 exactly at start+ramp steps
    vals = [adv_scale_schedule(s, start=100, ramp=4) for s in
            (99, 100, 101, 102, 103, 104, 1000)]
    assert vals == [0.0, 0.25, 0.5, 0.75, 1.0, 1.0, 1.0]
    # the schedule is ABSOLUTE in run step: a resume at step S evaluates
    # to the same value the uninterrupted run would have had at S — the
    # warmup/ramp must never restart on a supervisor retry
    assert adv_scale_schedule(1512, start=100, ramp=0) == 1.0
    mid_ramp = adv_scale_schedule(102, start=100, ramp=4)
    assert mid_ramp == adv_scale_schedule(102, start=100, ramp=4)
    assert 0.0 < mid_ramp < 1.0
