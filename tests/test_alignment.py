"""Alignment-regression network tests: shapes, training signal, and the
end-to-end chain from the dataset's alignment mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.models.alignment import AlignmentNet
from faceoff_tpu.train.alignment import (
    create_alignment_state,
    make_alignment_step,
)


def test_forward_shape():
    model = AlignmentNet(widths=(8, 16), dtype=jnp.float32)
    x = jnp.zeros((4, 64, 64, 6))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (4, 3)
    assert out.dtype == jnp.float32


def test_loss_decreases_on_fixed_batch():
    model = AlignmentNet(widths=(8, 16), dtype=jnp.float32)
    key = jax.random.key(0)
    batch = {
        "input": jax.random.uniform(key, (1, 4, 32, 32, 6), minval=-1),
        "transforms": jnp.asarray([[[2.0, -1.0, 3.0]] * 4]),
    }
    state = create_alignment_state(
        model, jax.random.key(1), batch["input"][:, 0], lr=1e-2
    )
    step = make_alignment_step(model, donate=False)
    losses = []
    for _ in range(40):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.2


def test_dataset_alignment_chain(tmp_path):
    synthetic.generate_dataset(str(tmp_path), n_videos=1, n_frames=6, size=64)
    ds = TemporalAlignmentDataset(str(tmp_path), "train", 3, resolution=64)
    item = ds.get_item_alignment(0, np.random.default_rng(0))
    batch = {
        "input": np.concatenate(
            [item["source"], item["background"]], axis=-1
        )[None],
        "transforms": item["transforms"][None],
    }
    model = AlignmentNet(widths=(8, 16), dtype=jnp.float32)
    state = create_alignment_state(
        model, jax.random.key(0), jnp.asarray(batch["input"][:, 0])
    )
    step = make_alignment_step(model, donate=False)
    state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["mae_rotation"]))
