#!/usr/bin/env python
"""Benchmark: train frames/sec/chip at 256px, T=8 clips (the BASELINE.md
north-star metric), measured on whatever accelerator JAX exposes.

Runs the real jitted train step (forward incl. VQ EMA update, MSE+latent+
LPIPS losses, backward, Adam) on synthetic on-device data — isolating
device throughput from the host input pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is a FLOP-DERIVED UPPER BOUND on the reference's per-GPU rate
(tools/derive_baseline.py, results in BASELINE_DERIVED.json): XLA's cost
analysis of the full train step at the reference operating point (fp32,
1 clip x 30 frames/GPU, 256px, MSE+latent+LPIPS, Adam) gives 179.5
GFLOP/frame; at V100 peak fp32 (15.7 TFLOP/s) and a generous 50% MFU that
bounds the reference at 43.72 frames/s/GPU. Real reference runs are slower
(DDP + EMA all_reduce + batch_size=1 host pipeline ignored by the bound),
so vs_baseline multipliers are conservative.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

# FLOP-derived V100 upper bound; see tools/derive_baseline.py
REF_FPS_PER_GPU_EST = 43.72

B, T, HW = 1, 8, 256
WARMUP, ITERS = 3, 20


def bench_e2e(device_pipeline: bool, batch: int = 1):
    """End-to-end training throughput incl. the input pipeline on a
    synthetic on-disk dataset: host geometry path vs the on-device
    hull/perturb/composite path (--mode e2e / e2e_host).

    Host batches are double-buffered onto the device
    (data.pipeline.prefetch_to_device) so the transfer of batch k+1
    overlaps step k, and `batch` clips ride each dispatch — both amortize
    the relay dispatch latency that bounded the round-1 e2e number."""
    import tempfile

    from jax.sharding import SingleDeviceSharding

    from faceoff_tpu.data import synthetic
    from faceoff_tpu.data.dataset import TemporalAlignmentDataset
    from faceoff_tpu.data.pipeline import prefetch_to_device
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.train import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    b = batch
    with tempfile.TemporaryDirectory() as root:
        synthetic.generate_dataset(
            root, n_videos=max(4, 2 * b), n_frames=T + 4, size=HW
        )
        ds = TemporalAlignmentDataset(root, "train", T, resolution=HW)

        model = VQVAE(
            in_channels=6,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            use_pallas=on_tpu,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((b, T, HW, HW, 6)), lr=3e-4
        )

        if device_pipeline:
            from faceoff_tpu.data.device_pipeline import (
                RawClipLoader,
                prepare_train_batch,
            )

            loader = RawClipLoader(ds, batch_clips=b, num_workers=8)
            # input prep fused into the train step: one dispatch per step
            train_step = make_train_step(
                model, prepare_fn=prepare_train_batch, donate=False
            )

            def run_one(step_idx, staged):
                return train_step(
                    state, staged, None, jax.random.key(step_idx)
                )
        else:
            train_step = make_train_step(model, donate=False)
            from faceoff_tpu.data.pipeline import DataLoader

            loader = DataLoader(ds, batch_clips=b, num_workers=8)

            def run_one(step_idx, staged):
                return train_step(state, staged)

        sharding = SingleDeviceSharding(jax.devices()[0])
        keep = ("frames", "landmarks") if device_pipeline else ("input", "gt")

        def host_batches(n):
            served = 0
            while served < n:
                for raw in loader:
                    yield {k: raw[k] for k in keep}
                    served += 1
                    if served >= n:
                        return

        # warmup (compile)
        staged = next(prefetch_to_device(host_batches(1), sharding))
        _, m = run_one(0, staged)
        float(m["loss"])  # host read: reliable sync

        n_steps = 0
        t0 = time.perf_counter()
        for staged in prefetch_to_device(host_batches(12), sharding, depth=3):
            _, m = run_one(n_steps, staged)
            n_steps += 1
        float(m["loss"])  # host read: reliable sync
        dt = time.perf_counter() - t0
        fps = b * T * n_steps / dt
    label = "device" if device_pipeline else "host"
    print(
        json.dumps(
            {
                "metric": f"e2e_train_frames_per_sec_{label}_pipeline_b{b}",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_resident(batch: int = 16, spc: int = 1):
    """End-to-end training throughput with the device-RESIDENT corpus
    (--mode e2e_resident): the whole decoded dataset staged to HBM once,
    clip sampling + hull/perturb/composite + LPIPS train step fused into
    one program — the host only dispatches. This is the real trainer's
    operating point under --resident_data; the round-3 e2e gap (620 f/s
    device step vs 142-164 f/s system) was host transfer + dispatch, both
    of which this mode removes."""
    import tempfile

    from faceoff_tpu.data import synthetic
    from faceoff_tpu.data.dataset import TemporalAlignmentDataset
    from faceoff_tpu.data.resident import (
        build_resident_corpus,
        make_resident_prepare,
    )
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state, make_train_step
    from faceoff_tpu.train.train_step import make_multi_step

    on_tpu = jax.default_backend() == "tpu"
    b = batch
    with tempfile.TemporaryDirectory() as root:
        # corpus sized like the real-footage one (~30 clips)
        synthetic.generate_dataset(
            root, n_videos=max(8, b), n_frames=T + 8, size=HW
        )
        ds = TemporalAlignmentDataset(root, "train", T, resolution=HW)
        corpus = build_resident_corpus(ds)

        model = VQVAE(
            in_channels=6,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            use_pallas=on_tpu,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((b, T, HW, HW, 6)), lr=3e-4
        )
        lpips_model, lpips_vars = init_lpips(
            jax.random.key(1), image_size=HW,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        lpips_apply = lambda v, x, y: lpips_model.apply(v, x, y)
        prepare = make_resident_prepare(corpus, b, T)
        raw = {"frames": corpus.frames, "landmarks": corpus.landmarks}
        key = jax.random.key(2)

        if spc > 1:
            multi = make_multi_step(
                model, spc, lpips_apply=lpips_apply, prepare_fn=prepare,
                donate=False, scan_batches=False,
            )
            keys = jax.random.split(key, spc)

            def run_once(state):
                return multi(state, raw, lpips_vars, keys)
        else:
            step = make_train_step(
                model, lpips_apply=lpips_apply, prepare_fn=prepare,
                donate=False,
            )

            def run_once(state):
                return step(state, raw, lpips_vars, key)

        for _ in range(WARMUP):
            state, m = run_once(state)
        float(m["loss"])  # host read: reliable sync

        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = run_once(state)
        float(m["loss"])
        dt = time.perf_counter() - t0
        fps = b * T * max(spc, 1) * ITERS / dt
    name = f"e2e_train_frames_per_sec_resident_b{b}"
    if spc > 1:
        name += f"_scan{spc}"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_profile(batch: int = 16, hw: int = HW, remat: bool = False,
                  remat_scope: str = "all", remat_lpips: bool = False):
    """Roofline at the operating point (--mode profile): AOT-compile the
    SAME b16 train step the headline measures, pull XLA's cost analysis
    (FLOPs + HBM bytes accessed), time it, and print one JSON line with
    achieved TFLOP/s, HBM GB/s, % of peak bandwidth, and MFU — the
    numbers VERDICT round-3 asked to publish for the b16 regime (the
    round-2 roofline text described the b1 step only).

    Peak constants are the v5e datasheet: 197 bf16 TFLOP/s, 819 GB/s."""
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    b = batch
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
        remat=remat,
        remat_scope=remat_scope,
    )
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    gt = jax.random.uniform(k1, (b, T, hw, hw, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (b, T, hw, hw, 3), minval=-1, maxval=1)
    batch_d = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}
    state = create_train_state(model, k3, batch_d["input"], lr=3e-4)
    lpips_model, lpips_vars = init_lpips(
        jax.random.key(1), image_size=hw,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    lpips_apply = lambda v, a, c: lpips_model.apply(v, a, c)
    if remat_lpips:
        lpips_apply = jax.checkpoint(lpips_apply)
    step = make_train_step(model, lpips_apply=lpips_apply, donate=False)

    compiled = jax.jit(step).lower(state, batch_d, lpips_vars).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_hbm = float(cost.get("bytes accessed", 0.0))

    for _ in range(WARMUP):
        state, m = compiled(state, batch_d, lpips_vars)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = compiled(state, batch_d, lpips_vars)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / ITERS * 1e3

    peak_tflops, peak_gbps = 197e12, 819e9
    tflops = flops / (ms / 1e3) / 1e12
    gbps = bytes_hbm / (ms / 1e3) / 1e9
    print(
        json.dumps(
            {
                "metric": f"roofline_{hw}px_T8_b{b}",
                "value": round(ms, 3),
                "unit": "ms/step",
                "vs_baseline": None,
                "flop_per_step": flops,
                "hbm_bytes_per_step": bytes_hbm,
                "achieved_tflops": round(tflops, 2),
                "achieved_hbm_gbps": round(gbps, 1),
                "pct_peak_hbm_bw": round(100 * gbps * 1e9 / peak_gbps, 1),
                "mfu_pct": round(100 * tflops * 1e12 / peak_tflops, 1),
                "frames_per_sec": round(b * T * 1e3 / ms, 1),
            }
        )
    )


def bench_multi(k: int = 8):
    """K distinct optimizer steps per dispatch via lax.scan
    (train_step.make_multi_step) — measures launch-overhead-amortized
    training throughput."""
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state
    from faceoff_tpu.train.train_step import make_multi_step

    on_tpu = jax.default_backend() == "tpu"
    n_chips = jax.device_count()
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    key = jax.random.key(0)
    k1, k3 = jax.random.split(key)
    gt = jax.random.uniform(k1, (k, B, T, HW, HW, 3), minval=-1, maxval=1)
    batches = {"input": jnp.concatenate([gt, gt], axis=-1), "gt": gt}
    state = create_train_state(model, k3, batches["input"][0], lr=3e-4)
    lpips_model, lpips_vars = init_lpips(
        jax.random.key(1), image_size=HW,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    multi = make_multi_step(
        model, k, lpips_apply=lambda v, a, b: lpips_model.apply(v, a, b),
        donate=False,
    )
    keys = jax.random.split(jax.random.key(2), k)

    for _ in range(2):
        state, m = multi(state, batches, lpips_vars, keys)
    float(m["loss"])

    calls = 6
    t0 = time.perf_counter()
    for _ in range(calls):
        state, m = multi(state, batches, lpips_vars, keys)
    float(m["loss"])
    dt = time.perf_counter() - t0
    fps = B * T * k * calls / dt / max(n_chips, 1)
    print(
        json.dumps(
            {
                "metric": f"train_frames_per_sec_per_chip_256px_T8_scan{k}",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_infer(batch: int = 1):
    """Offline serving throughput: the jitted eval forward (no grads, no
    EMA update) on (batch, T, 256, 256, 6) clips — the chunked swap
    inference path (cli/swap.py)."""
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.train import create_train_state, make_eval_step

    on_tpu = jax.default_backend() == "tpu"
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    b = batch
    gt = jax.random.uniform(
        jax.random.key(0), (b, T, HW, HW, 3), minval=-1, maxval=1
    )
    batch_d = {"input": jnp.concatenate([gt, gt], axis=-1), "gt": gt}
    state = create_train_state(model, jax.random.key(1), batch_d["input"])
    eval_step = make_eval_step(model)

    import numpy as np

    for _ in range(WARMUP):
        out, _ = eval_step(state, batch_d)
    np.asarray(out).ravel()[:1]

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, _ = eval_step(state, batch_d)
    np.asarray(out).ravel()[:1]  # device->host read: reliable sync
    dt = time.perf_counter() - t0
    fps = b * T * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"infer_frames_per_sec_256px_b{b}",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_gan(scan: int = 0):
    """Adversarial fine-tuning throughput (mocoganhd recipe at the
    reference's 16-frame window): alternating gen/disc optimizer steps,
    optionally K iterations per dispatch via make_gan_multi_step."""
    import numpy as np

    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.discriminators import (
        MultiscaleDiscriminator2D,
        MultiscaleDiscriminator3D,
    )
    from faceoff_tpu.train import create_train_state
    from faceoff_tpu.train.gan import (
        create_gan_state,
        make_gan_multi_step,
        make_gan_steps,
    )

    on_tpu = jax.default_backend() == "tpu"
    t, sf = 16, 16
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    d_img = MultiscaleDiscriminator2D()
    d_3d = MultiscaleDiscriminator3D(n_frames=sf)
    gt = jax.random.uniform(
        jax.random.key(0), (B, t, HW, HW, 3), minval=-1, maxval=1
    )
    batch = {"input": jnp.concatenate([gt, gt], axis=-1), "gt": gt}
    gen_state = create_train_state(model, jax.random.key(1), batch["input"])
    state = create_gan_state(
        gen_state, d_img, d_3d, jax.random.key(2),
        sample_frames=sf, image_hw=HW,
    )

    if scan > 1:
        multi = make_gan_multi_step(
            model, d_img, d_3d, scan, sample_frames=sf, donate=False
        )
        batches = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (scan,) + x.shape), batch
        )
        keys = jax.random.split(jax.random.key(3), scan)

        def one(i):
            nonlocal state
            state, m = multi(state, batches, keys)
            return m["gen"]["g_loss"]

        steps_per_call = scan
    else:

        gen_step, disc_step = make_gan_steps(
            model, d_img, d_3d, sample_frames=sf, donate=False
        )

        def one(i):
            nonlocal state
            state, m = gen_step(state, batch, jax.random.key(2 * i))
            state, dm = disc_step(state, batch, jax.random.key(2 * i + 1))
            return m["g_loss"]

        steps_per_call = 2  # one gen + one disc per call

    for i in range(2):
        out = one(i)
    np.asarray(out).ravel()[:1]

    calls = 6
    t0 = time.perf_counter()
    for i in range(calls):
        out = one(i)
    np.asarray(out).ravel()[:1]
    dt = time.perf_counter() - t0
    fps = B * t * steps_per_call * calls / dt
    name = f"gan_train_frames_per_sec_256px_T16_scan{scan}" if scan > 1 \
        else "gan_train_frames_per_sec_256px_T16"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_stream(batch: int = 1, frames_per_call: int = 1):
    """Online serving latency: frame-at-a-time swap inference through the
    streaming path (faceoff_tpu.serve.streaming) on the flagship model at
    256px — the latency-critical deployment mode (one device program per
    frame, 3-frame pipeline delay). batch > 1 = that many CONCURRENT
    independent streams per program (multi-tenant serving): latency is
    per frame-step, aggregate throughput is batch/latency.
    frames_per_call > 1 = K frames per dispatch via push_many (ring
    buffers advance inside a lax.scan) — amortizes the relay RTT over K
    frames; the reported value is the amortized ms/frame."""
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.serve import StreamingSwapper

    on_tpu = jax.default_backend() == "tpu"
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 4, HW, HW, 6)), train=False
    )
    sw = StreamingSwapper(
        model, variables, height=HW, width=HW, batch=batch
    )
    k = max(1, frames_per_call)
    frame = jax.random.uniform(
        jax.random.key(1), (batch, HW, HW, 6), minval=-1, maxval=1
    )

    import numpy as np

    if k > 1:
        frames_k = jnp.broadcast_to(frame, (k,) + frame.shape)

        def push_once():
            return sw.push_many(frames_k)[-1]
    else:
        def push_once():
            return sw.push(frame)

    for _ in range(max(1, (sw.delay + 2 + k - 1) // k)):  # compile + warm
        out = push_once()
    np.asarray(out)

    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = push_once()
        np.asarray(out)  # device->host read per call: real latency
        lat.append((time.perf_counter() - t0) / k)
    ms = sorted(x * 1e3 for x in lat)
    p50 = ms[len(ms) // 2]
    fps = batch * 1e3 / p50
    name = "stream_swap_latency_ms_per_frame_256px"
    if batch > 1:
        name += f"_b{batch}"
    if k > 1:
        name += f"_k{k}"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(p50, 2),
                "unit": "ms/frame (p50)" if k == 1
                else f"ms/frame (p50, amortized over {k}/dispatch)",
                "vs_baseline": round(fps / REF_FPS_PER_GPU_EST, 3),
            }
        )
    )


def bench_swap_session(frames_per_call: int = 1):
    """Full online SwapSession latency: HOST (frame, landmarks) pairs in,
    swapped frame out — covers the host->device transfer path (src+tgt
    stacked into one uint8 put + one landmark put per frame) fused with
    the cross-identity geometry and the streaming VQVAE forward. This is
    the end-user live-serving number; `--mode stream` measures only the
    device-side frame-step. frames_per_call > 1 = push_many: K frame
    pairs ride ONE transfer + ONE dispatch (amortized ms/frame
    reported)."""
    import numpy as np

    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.serve import SwapSession

    on_tpu = jax.default_backend() == "tpu"
    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 4, HW, HW, 6)), train=False
    )
    sess = SwapSession(model, variables, height=HW, width=HW)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (HW, HW, 3), dtype=np.uint8)
    # plausible in-frame landmarks (the geometry only needs a sane hull)
    lms = (rng.uniform(0.3, 0.7, (68, 2)) * HW).astype(np.float32)
    k = max(1, frames_per_call)

    if k > 1:
        fk, lk = [frame] * k, [lms] * k

        def push_once():
            return sess.push_many(fk, lk, fk, lk)[-1]
    else:
        def push_once():
            return sess.push(frame, lms, frame, lms)

    for _ in range(max(1, (sess.delay + 2 + k - 1) // k)):  # compile + warm
        out = push_once()
    np.asarray(out)

    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = push_once()
        np.asarray(out)  # device->host read per call: real latency
        lat.append((time.perf_counter() - t0) / k)
    ms = sorted(x * 1e3 for x in lat)
    p50 = ms[len(ms) // 2]
    name = "swap_session_latency_ms_per_frame_256px"
    if k > 1:
        name += f"_k{k}"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(p50, 2),
                "unit": "ms/frame (p50, host frames in)" if k == 1
                else f"ms/frame (p50, host frames in, {k}/dispatch)",
                "vs_baseline": round(
                    (1e3 / p50) / REF_FPS_PER_GPU_EST, 3
                ),
            }
        )
    )


def main(batch_clips: int = 16, remat: bool = False, hw: int = HW,
         no_pallas: bool = False, remat_scope: str = "all",
         frames: int = None, remat_lpips: bool = False):
    """The headline metric. batch_clips=16 is the measured best per-chip
    operating point on a v5e (BENCHMARKS.md round-3 sweep: 386 b1 ->
    441 b4 -> 464 b8 -> 620 b16 -> 528 b32 f/s; the larger folded frame
    batch tiles the MXU better until b32 hits HBM pressure); batch 1
    remains reachable via --batch 1 for the reference-shaped comparison.

    hw: spatial resolution. 256 is the reference's HARD output cap
    (reference README.md:83, TemporalAlignment/dataset.py:230); the
    model here is fully convolutional, so --hw 512 measures a capability
    the reference does not have at all (pair with --remat and a smaller
    --batch for HBM headroom)."""
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.models.lpips import init_lpips
    from faceoff_tpu.train import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    n_chips = jax.device_count()
    b = batch_clips
    t = frames or T

    model = VQVAE(
        in_channels=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=on_tpu and not no_pallas,
        remat=remat,
        remat_scope=remat_scope,
    )

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    gt = jax.random.uniform(k1, (b, t, hw, hw, 3), minval=-1, maxval=1)
    bg = jax.random.uniform(k2, (b, t, hw, hw, 3), minval=-1, maxval=1)
    batch = {"input": jnp.concatenate([gt, bg], axis=-1), "gt": gt}

    state = create_train_state(model, k3, batch["input"], lr=3e-4)

    lpips_model, lpips_vars = init_lpips(
        jax.random.key(1), image_size=hw,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)
    if remat_lpips:
        # rematerialize the VGG towers: the 512px memory lever (the
        # towers' full-resolution activations dominate the backward's
        # footprint there); a small throughput loss at 256px
        lpips_apply = jax.checkpoint(lpips_apply)

    train_step = make_train_step(
        model, lpips_apply=lpips_apply, donate=False
    )

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, lpips_vars)
    float(metrics["loss"])  # host read: the only reliable sync barrier

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(state, batch, lpips_vars)
    # block_until_ready can return before remote execution completes on
    # tunneled backends; a device->host value read cannot.
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    frames_per_sec = b * t * ITERS / dt
    fps_per_chip = frames_per_sec / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": f"train_frames_per_sec_per_chip_{hw}px_T{t}_b{b}",
                "value": round(fps_per_chip, 2),
                "unit": "frames/s/chip",
                # the FLOP-derived reference bound is a 256px operating
                # point; at any other resolution the reference has no
                # comparable number (it hard-caps at 256 — reference
                # README.md:83), so the ratio would mislead
                "vs_baseline": round(fps_per_chip / REF_FPS_PER_GPU_EST, 3)
                if hw == HW else None,
            }
        )
    )


if __name__ == "__main__":
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=["step", "multi", "e2e", "e2e_host", "e2e_resident",
                 "stream", "swap_session", "infer", "gan", "profile"],
        default="step",
        help="step: device-only train step (driver default); "
             "multi: K steps per dispatch via lax.scan; "
             "e2e: incl. input pipeline with on-device geometry; "
             "e2e_host: incl. input pipeline with host cv2 geometry; "
             "e2e_resident: device-RESIDENT corpus — staging + fused "
             "sampling/geometry/train, zero per-step host traffic "
             "(--scan K folds K optimizer steps per dispatch); "
             "stream: online frame-at-a-time serving latency "
             "(--batch N = N concurrent streams; --frames_per_call K "
             "amortizes one dispatch over K frames); "
             "infer: offline eval-forward serving throughput; "
             "gan: adversarial-stage throughput (--scan K for the "
             "pair-scan path)",
    )
    ap.add_argument("--batch", type=int, default=None,
                    help="clips per step (step mode default 16 — the "
                         "measured best per-chip operating point; e2e/"
                         "stream/infer modes default 1)")
    ap.add_argument("--scan", type=int, default=0,
                    help="gan mode: K iterations per dispatch (0 = off)")
    ap.add_argument("--frames_per_call", type=int, default=1,
                    help="stream/swap_session modes: K frames per "
                         "dispatch via push_many (lax.scan over the ring "
                         "buffers) — the serving twin of --steps_per_call")
    ap.add_argument("--remat", action="store_true",
                    help="step mode: rematerialize enc/dec activations in "
                         "the backward (HBM-traffic vs recompute A/B)")
    ap.add_argument("--no_pallas", action="store_true",
                    help="step mode: pure-XLA VQ path A/B")
    ap.add_argument("--remat_scope", choices=["all", "decoder", "encoder"],
                    default="all",
                    help="step mode with --remat: submodule scope "
                         "('decoder' = recompute only the full-res tail)")
    ap.add_argument("--remat_lpips", action="store_true",
                    help="step mode: rematerialize the LPIPS VGG towers "
                         "(the 512px memory lever)")
    ap.add_argument("--frames", type=int, default=None,
                    help="step mode: clip length T (default 8)")
    ap.add_argument("--hw", type=int, default=HW,
                    help="step mode: spatial resolution (256 = the "
                         "reference's hard cap; 512 exercises the "
                         "beyond-reference resolution path)")
    cli = ap.parse_args()
    mode = cli.mode
    if mode == "step":
        main(batch_clips=cli.batch if cli.batch else 16, remat=cli.remat,
             hw=cli.hw, no_pallas=cli.no_pallas,
             remat_scope=cli.remat_scope, frames=cli.frames,
             remat_lpips=cli.remat_lpips)
    elif mode == "multi":
        bench_multi()
    elif mode == "stream":
        bench_stream(batch=cli.batch or 1,
                     frames_per_call=cli.frames_per_call)
    elif mode == "swap_session":
        bench_swap_session(frames_per_call=cli.frames_per_call)
    elif mode == "infer":
        bench_infer(batch=cli.batch or 1)
    elif mode == "gan":
        bench_gan(scan=cli.scan)
    elif mode == "e2e_resident":
        bench_resident(batch=cli.batch or 16, spc=max(1, cli.scan))
    elif mode == "profile":
        bench_profile(batch=cli.batch or 16, hw=cli.hw, remat=cli.remat,
                      remat_scope=cli.remat_scope,
                      remat_lpips=cli.remat_lpips)
    else:
        bench_e2e(device_pipeline=(mode == "e2e"), batch=cli.batch or 1)
