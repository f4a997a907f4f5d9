#!/usr/bin/env python
"""Derive the reference training-rate baseline from first principles.

The reference publishes no throughput numbers (BASELINE.md), so BENCH's
`vs_baseline` needs a defensible denominator. This tool computes one:

1. Compile the full training step at the REFERENCE operating point —
   fp32 (the reference never uses AMP), batch = 1 clip x 30 frames per
   GPU (reference utils.py:55-73), 256x256, MSE + latent + LPIPS losses,
   Adam — and read the FLOP count from XLA's cost analysis. The math
   (VQVAE-2 convs + dual VGG16 forward + backward) is identical across
   frameworks, so the FLOP count transfers to the torch implementation.
2. Upper-bound the reference's per-GPU rate as
       peak_fp32 * MFU / flops_per_frame
   on a V100 (15.7 TFLOP/s fp32). MFU 0.5 is deliberately GENEROUS to
   the reference: large cuDNN convs reach 50-60% of peak in isolation,
   and the bound ignores DDP all-reduce, the VQ EMA all_reduce in the
   forward (models/vqvae_conv3d_latent.py:63-64), optimizer overhead, and
   the batch_size=1/2-worker host input pipeline that in practice starves
   the GPU (SURVEY §3.1). A real reference run is slower than this bound,
   so speedup multipliers computed against it are conservative.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/derive_baseline.py
Writes BASELINE_DERIVED.json and prints it.
"""

import json

import jax
import jax.numpy as jnp

V100_PEAK_FP32 = 15.7e12  # TFLOP/s, NVIDIA datasheet
GENEROUS_MFU = 0.5
B, T, HW = 1, 30, 256  # reference utils.py:55-73: 1 clip x 30 frames/GPU


def main():
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state, make_train_step

    model = VQVAE(in_channels=6, dtype=jnp.float32, use_pallas=False)
    batch = {
        "input": jnp.zeros((B, T, HW, HW, 6), jnp.float32),
        "gt": jnp.zeros((B, T, HW, HW, 3), jnp.float32),
    }
    state = create_train_state(model, jax.random.key(0), batch["input"])
    lpips_model, lpips_vars = init_lpips(
        jax.random.key(1), image_size=HW, dtype=jnp.float32
    )
    step = make_train_step(
        model,
        lpips_apply=lambda v, a, b: lpips_model.apply(v, a, b),
        donate=False,
    )
    compiled = (
        jax.jit(step._fun if hasattr(step, "_fun") else step)
        .lower(state, batch, lpips_vars)
        .compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost["flops"])
    flops_per_frame = flops / (B * T)
    ref_fps_bound = V100_PEAK_FP32 * GENEROUS_MFU / flops_per_frame
    out = {
        "train_step_flops_fp32_B1_T30_256px": flops,
        "flops_per_frame": flops_per_frame,
        "v100_peak_fp32": V100_PEAK_FP32,
        "generous_mfu": GENEROUS_MFU,
        "ref_frames_per_sec_per_gpu_upper_bound": round(ref_fps_bound, 2),
        "note": (
            "upper bound: ignores DDP/EMA all_reduce, optimizer, and the "
            "reference's batch_size=1 host input pipeline; real runs are "
            "slower, so vs_baseline multipliers are conservative"
        ),
    }
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_DERIVED.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
