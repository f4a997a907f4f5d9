#!/usr/bin/env python
"""Benchmark: train frames/sec/chip at 256px, T=8 clips (the BASELINE.md
north-star metric), measured on whatever accelerator JAX exposes.

Runs the real jitted train step (forward incl. VQ EMA update, MSE+latent+
LPIPS losses, backward, Adam) on synthetic on-device data — isolating
device throughput from the host input pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
comparison point is an estimate of the reference's per-GPU training rate:
1 clip x 30 frames per step per GPU (reference utils.py:55-73) at ~1 s/step
for the ~20M-param VQVAE-2 + dual VGG16 LPIPS forward on a V100-class GPU
=> ~30 frames/s/GPU. vs_baseline = measured_fps_per_chip / 30.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REF_FPS_PER_GPU_EST = 30.0

B, T, HW = 1, 8, 256
WARMUP, ITERS = 3, 20


def main():
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    n_chips = jax.device_count()

    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (B, T, HW, HW, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (B, T, HW, HW, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}

    state = create_train_state(model, k3, batch["input"], lr=3e-4)

    lpips_model, lpips_vars = init_lpips(jax.random.key(1), image_size=HW)
    lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)

    train_step = make_train_step(
        model, lpips_apply=lpips_apply, donate=False
    )

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, lpips_vars)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(state, batch, lpips_vars)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    frames_per_sec = B * T * ITERS / dt
    fps_per_chip = frames_per_sec / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip_256px_T8",
                "value": round(fps_per_chip, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps_per_chip / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
