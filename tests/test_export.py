"""Serving-bundle export (serve/export.py): the serialized StableHLO
programs must reproduce the live model exactly, and the bundle loader
must work from the artifact + meta.json alone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models import VQVAE
from faceoff_tpu.serve.export import (
    export_offline,
    load_bundle,
    save_bundle,
)

SIZE, FRAMES = 32, 4


@pytest.fixture(scope="module")
def tiny():
    model = VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, use_pallas=False,
    )
    video = jax.random.uniform(
        jax.random.key(1), (1, FRAMES, SIZE, SIZE, 6), minval=-1, maxval=1
    )
    variables = model.init(jax.random.key(0), video, train=False)
    return model, variables, video


def test_offline_export_matches_live_forward(tiny):
    model, variables, video = tiny
    exp = export_offline(model, variables, frames=FRAMES, size=SIZE)
    got = exp.call(video)
    dec, _ = model.apply(variables, video, train=False)
    want = dec[..., :3].astype(jnp.float32)
    assert got.shape == (1, FRAMES, SIZE, SIZE, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_bundle_roundtrip_offline_and_streaming(tiny, tmp_path):
    model, variables, video = tiny
    out = str(tmp_path / "bundle")
    meta = save_bundle(out, model, variables, frames=FRAMES, size=SIZE)
    assert meta["format"] == "faceoff_tpu.serving_bundle.v1"

    bundle = load_bundle(out)

    # offline: serialized program == live forward
    got = bundle.offline(video)
    dec, _ = model.apply(variables, video, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dec[..., :3]), rtol=1e-5, atol=1e-5
    )

    # streaming: deserialized push/flush reproduce the native streamer
    from faceoff_tpu.serve.streaming import make_stream_steps

    init_state, push_step, flush_step, delay, _ = make_stream_steps(
        model, variables
    )
    assert bundle.delay == delay

    state_a = init_state(1, SIZE, SIZE)
    state_b = bundle.init_state()
    outs_a, outs_b = [], []
    for t in range(FRAMES):
        frame = video[:, t]
        state_a, oa = push_step(state_a, frame)
        state_b, ob = bundle.push(state_b, frame)
        outs_a.append(oa)
        outs_b.append(ob)
    for _ in range(delay):
        state_a, oa = flush_step(state_a, jnp.int32(FRAMES))
        state_b, ob = bundle.flush(state_b, FRAMES)
        outs_a.append(oa)
        outs_b.append(ob)
    for oa, ob in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(ob), np.asarray(oa), rtol=1e-5, atol=1e-5
        )


def test_loader_rejects_non_bundle(tmp_path):
    (tmp_path / "meta.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError):
        load_bundle(str(tmp_path))
