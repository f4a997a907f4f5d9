"""Inference CLI: swap a source actor's face onto a target video.

The user-facing deliverable of the system (the reference exposes this only
through `--test --crossid/--custom_validation` validation runs,
train_faceoff_perceptual.py:187-188): given two preprocessed video dirs
(frames + landmark npz, see the dataset contract) and a trained
checkpoint, writes the swapped video plus the intermediate streams.

    python -m faceoff_tpu.cli.swap --source SRC_DIR --target TGT_DIR \
        --checkpoint_dir CKPT [--ckpt STEP] --out swapped.mp4
"""

from __future__ import annotations

import argparse
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.data import geometry
from faceoff_tpu.data.dataset import (
    _landmark_paths,
    denormalize,
    load_frame,
    normalize,
)
from faceoff_tpu.cli import common
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.io.video import save_frames_as_video
from faceoff_tpu.train import create_train_state, make_eval_step


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="source video dir (face)")
    p.add_argument("--target", required=True,
                   help="target video dir (pose/background)")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--ckpt", default=None, help="step (default latest)")
    p.add_argument("--out", default="swapped.mp4")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--chunk", type=int, default=32,
                   help="frames per device batch")
    p.add_argument("--save_streams", action="store_true",
                   help="also write composite/background/naive streams")
    p.add_argument("--blend", choices=["paste", "poisson"], default="paste",
                   help="how the naive combined baseline stream is blended "
                        "(written with --save_streams): hard paste "
                        "(reference combine_images) or iterative Laplacian "
                        "poisson blending (reference "
                        "face_translation_videos3_utils.py:79-82)")
    p.add_argument("--poisson_iters", type=int, default=1024,
                   help="Jacobi iterations for --blend poisson")
    p.add_argument("--device_pipeline", action="store_true",
                   help="run the hull/Umeyama/warp/composite geometry on "
                        "the accelerator, fused into one program per chunk "
                        "with the model forward (host only decodes frames)")
    p.add_argument("--streaming", action="store_true",
                   help="frame-at-a-time online inference (constant memory, "
                        "3-frame latency) instead of chunked batches; "
                        "prints per-frame latency stats")
    p.add_argument("--frames_per_call", type=int, default=1,
                   help="streaming: K frames per device dispatch via "
                        "push_many (one relay round trip per K frames — "
                        "amortizes dispatch latency without adding model "
                        "delay)")
    common.add_model_flags(p)
    return p


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    src_paths = _landmark_paths(args.source)
    tgt_paths = _landmark_paths(args.target)
    n = min(len(src_paths), len(tgt_paths))
    if args.max_frames:
        n = min(n, args.max_frames)
    if n == 0:
        raise SystemExit("no overlapping frames with landmarks")

    naives = []  # the crude paste / poisson-blend baseline the model refines
    if args.device_pipeline:
        # host only decodes; hull/Umeyama/warp/composite run on device.
        # Processed in fixed-size chunks (padded tail) so arbitrarily long
        # videos reuse ONE compiled program at bounded device memory.
        from faceoff_tpu.ops.swap import prepare_swap_batch

        sources, backgrounds = [], []
        for i in range(0, n, args.chunk):
            raw = {"src": [], "src_lms": [], "tgt": [], "tgt_lms": []}
            pairs = list(
                zip(src_paths[i: i + args.chunk],
                    tgt_paths[i: i + args.chunk])
            )
            for sp, tp in pairs:
                s_img, s_lms = load_frame(sp, args.size)
                t_img, t_lms = load_frame(tp, args.size)
                raw["src"].append(s_img)
                raw["src_lms"].append(s_lms)
                raw["tgt"].append(t_img)
                raw["tgt_lms"].append(t_lms)
            pad = args.chunk - len(pairs)
            stacked = {}
            for k, v in raw.items():
                arr = np.stack(v)
                if pad:
                    arr = np.pad(
                        arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1)
                    )
                stacked[k] = arr
            streams = prepare_swap_batch(
                jnp.asarray(stacked["src"]), jnp.asarray(stacked["src_lms"]),
                jnp.asarray(stacked["tgt"]), jnp.asarray(stacked["tgt_lms"]),
                poisson=(args.blend == "poisson"),
                poisson_iters=args.poisson_iters,
            )
            sources += list(np.asarray(streams["source"]))[: len(pairs)]
            backgrounds += list(
                np.asarray(streams["background"])
            )[: len(pairs)]
            naives += list(np.asarray(streams["combined"]))[: len(pairs)]
    else:
        # host-side geometry: hull -> warp -> composite per frame pair
        sources, backgrounds = [], []
        for sp, tp in zip(src_paths[:n], tgt_paths[:n]):
            s_img, s_lms = load_frame(sp, args.size)
            t_img, t_lms = load_frame(tp, args.size)
            out = geometry.generate_warped_image(
                s_lms, t_lms, s_img, t_img,
                poisson=(args.blend == "poisson"),
            )
            sources.append(normalize(out["source_face_transformed"]))
            backgrounds.append(normalize(out["target_without_face_features"]))
            naives.append(normalize(out["combined"]))

    model = common.build_vqvae(args)
    sample = jnp.zeros((1, args.chunk, args.size, args.size, 6), jnp.float32)
    state = create_train_state(model, jax.random.key(0), sample)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore_weights(
        state, None if args.ckpt in (None, "latest") else int(args.ckpt)
    )
    print(f"restored checkpoint step {int(state.step)}")
    if args.streaming:
        frames_out = _run_streaming(args, model, state, sources, backgrounds)
    else:
        frames_out = _run_chunked(args, model, state, sources, backgrounds, n)

    save_frames_as_video(frames_out, args.out, fps=args.fps)
    print(f"wrote {args.out} ({len(frames_out)} frames)")

    if args.save_streams:
        stem = osp.splitext(args.out)[0]
        save_frames_as_video(
            [denormalize(f) for f in sources], f"{stem}_composite.mp4",
            fps=args.fps,
        )
        save_frames_as_video(
            [denormalize(f) for f in backgrounds], f"{stem}_background.mp4",
            fps=args.fps,
        )
        save_frames_as_video(
            [denormalize(f) for f in naives],
            f"{stem}_naive_{args.blend}.mp4", fps=args.fps,
        )
        print(f"wrote {stem}_composite.mp4, {stem}_background.mp4, "
              f"{stem}_naive_{args.blend}.mp4")


def _run_streaming(args, model, state, sources, backgrounds):
    """Frame-at-a-time online inference (faceoff_tpu.serve.streaming):
    constant memory, `delay`-frame latency, one device program per frame."""
    import time

    from faceoff_tpu.serve import StreamingSwapper

    variables = {"params": state.params, "vq": state.vq}
    sw = StreamingSwapper(
        model, variables, height=args.size, width=args.size
    )
    k = max(1, getattr(args, "frames_per_call", 1))
    frames_out, lat_ms = [], []
    if k > 1:
        stacked = [
            np.concatenate([s, b], axis=-1)[None]
            for s, b in zip(sources, backgrounds)
        ]
        for i in range(0, len(stacked), k):
            group = stacked[i: i + k]
            t0 = time.perf_counter()
            outs = sw.push_many(jnp.asarray(np.stack(group)))
            if outs:
                outs = [np.asarray(o) for o in outs]  # real sync
                dt_ms = (time.perf_counter() - t0) * 1e3
                lat_ms += [dt_ms / len(group)] * len(outs)
                frames_out += [denormalize(o[0, ..., :3]) for o in outs]
    else:
        for src, bg in zip(sources, backgrounds):
            frame = np.concatenate([src, bg], axis=-1)[None]
            t0 = time.perf_counter()
            out = sw.push(jnp.asarray(frame))
            if out is not None:
                out = np.asarray(out)  # device->host read: real sync
                lat_ms.append((time.perf_counter() - t0) * 1e3)
                frames_out.append(denormalize(out[0, ..., :3]))
    for out in sw.flush():
        frames_out.append(denormalize(np.asarray(out)[0, ..., :3]))
    if len(lat_ms) > 2:
        steady = np.asarray(sorted(lat_ms[1:]))  # drop the compile frame
        print(
            f"streaming latency/frame: mean {steady.mean():.1f} ms, "
            f"p50 {steady[len(steady) // 2]:.1f} ms, "
            f"p90 {steady[int(len(steady) * 0.9)]:.1f} ms "
            f"(pipeline delay {sw.delay} frames)"
        )
    return frames_out


def _run_chunked(args, model, state, sources, backgrounds, n):
    eval_step = make_eval_step(model)

    frames_out = []
    for i in range(0, n, args.chunk):
        chunk_src = np.stack(sources[i: i + args.chunk])
        chunk_bg = np.stack(backgrounds[i: i + args.chunk])
        pad = args.chunk - len(chunk_src)
        if pad:  # static shapes: pad the tail chunk
            chunk_src = np.pad(chunk_src, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunk_bg = np.pad(chunk_bg, ((0, pad), (0, 0), (0, 0), (0, 0)))
        batch = {
            "input": jnp.asarray(
                np.concatenate([chunk_src, chunk_bg], axis=-1)[None]
            ),
            "gt": jnp.zeros(
                (1, args.chunk, args.size, args.size, 3), jnp.float32
            ),
        }
        out, _ = eval_step(state, batch)
        out_np = np.asarray(out[0])[: args.chunk - pad if pad else args.chunk]
        frames_out += [denormalize(f) for f in out_np]
        print(f"swapped {min(i + args.chunk, n)}/{n} frames", flush=True)
    return frames_out


if __name__ == "__main__":
    main()
