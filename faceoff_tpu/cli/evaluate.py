"""Evaluation CLI: quantitative reconstruction report on a validation set.

Fills the reference's evaluation gap (visual-only validation, SURVEY §4):
computes MSE / L1 / PSNR / SSIM / LPIPS over the self-supervised
validation items and prints one JSON report.

    python -m faceoff_tpu.cli.evaluate --data_root DATA \
        --checkpoint_dir CKPT [--ckpt STEP] [--lpips_weights W.npz]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.cli import common
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.evaluation import evaluate_reconstruction
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.models.lpips import (
    init_lpips,
    lpips_weights_trunk_only,
    resolve_lpips_weights,
)
from faceoff_tpu.train import create_train_state, make_eval_step


def main(argv=None):
    from faceoff_tpu.parallel.collectives import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=16)
    p.add_argument("--lpips_weights", default=None,
                   help=".npz from tools/convert_lpips.py, or 'auto'")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--naive_baseline", choices=["paste", "poisson"],
                   default=None,
                   help="with --crossid: also report Fréchet distances for "
                        "the NAIVE blended composite (hard paste or poisson "
                        "blend, reference face_translation_videos3_utils.py"
                        ":184-190) — quantifies how much the model improves "
                        "over the crude blend")
    p.add_argument("--crossid", action="store_true",
                   help="cross-identity evaluation: swapped clips have no "
                        "pixel ground truth (the reference can only eyeball "
                        "them), so report Fréchet feature distances between "
                        "the swapped outputs and the real target clips "
                        "(fd_vgg appearance + fd_vgg_motion temporal)")
    common.add_model_flags(p)
    common.add_curation_flags(p)
    args = p.parse_args(argv)

    model = common.build_vqvae(args)
    sample = jnp.zeros((1, args.frames, args.size, args.size, 6), jnp.float32)
    state = create_train_state(model, jax.random.key(0), sample)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore_weights(
        state, None if args.ckpt in (None, "latest") else int(args.ckpt)
    )
    eval_step = make_eval_step(model)

    # resolve ONCE ('auto' probes/converts via discover_lpips_weights);
    # every tagging decision below keys off the RESOLVED value
    lpips_npz = resolve_lpips_weights(args.lpips_weights)
    lpips_model, lpips_vars = init_lpips(
        jax.random.key(1), image_size=args.size,
        weights_npz=lpips_npz,
    )
    lpips_apply = lambda v, a, b: lpips_model.apply(v, a, b)
    # metric-key suffix records exactly what the extractor was: '' = real
    # LPIPS weights, '_untrained_lin' = real VGG trunk but random lin
    # heads (bare torchvision checkpoint), '_random_vgg' = fully random
    if lpips_npz is None:
        lpips_tag = "_random_vgg"
        # a fixed-seed random VGG is a usable *training* signal but NOT the
        # reference metric — report it under a different key so it is never
        # mistaken for LPIPS parity (convert real weights with
        # tools/convert_lpips.py from the taming vgg.pth)
        print(
            "WARNING: no LPIPS weights resolved; using a fixed-seed RANDOM "
            "VGG. Reporting the metric as 'lpips_random_vgg' — it is NOT "
            "comparable to the reference LPIPS.",
            flush=True,
        )
    elif lpips_weights_trunk_only(lpips_npz):
        lpips_tag = "_untrained_lin"
        print(
            f"WARNING: {lpips_npz} carries the VGG trunk only; the learned "
            "lin heads are random-init. Reporting the metric as "
            "'lpips_untrained_lin' — NOT comparable to the reference LPIPS.",
            flush=True,
        )
    else:
        lpips_tag = ""

    ds = TemporalAlignmentDataset(
        args.data_root, "val", args.frames, resolution=args.size,
        cross_identity=args.crossid,
        naive_blend=(args.naive_baseline or "") if args.crossid else "",
        exclude_list=args.exclude_list,
    )
    loader = DataLoader(
        ds, batch_clips=1, shuffle=False, num_workers=args.num_workers
    )

    reports = []
    preds, reals, naives = [], [], []
    for i, batch in enumerate(loader):
        if i >= args.max_batches:
            break
        out, _ = eval_step(
            state,
            {
                "input": jnp.asarray(batch["input"]),
                "gt": jnp.asarray(batch["gt"]),
            },
        )
        if args.crossid:
            preds.append(np.asarray(out))
            reals.append(np.asarray(batch["gt"]))
            if "naive" in batch:
                naives.append(np.asarray(batch["naive"]))
            continue
        rep = evaluate_reconstruction(
            out, jnp.asarray(batch["gt"]),
            lpips_apply=lpips_apply, lpips_vars=lpips_vars,
        )
        rep = {k: float(v) for k, v in rep.items()}
        if lpips_tag and "lpips" in rep:
            rep[f"lpips{lpips_tag}"] = rep.pop("lpips")
        reports.append(rep)

    if args.crossid:
        from faceoff_tpu.evaluation import make_fd_video

        fd = make_fd_video(lpips_vars)
        vals = fd(
            jnp.asarray(np.concatenate(reals)),
            jnp.asarray(np.concatenate(preds)),
        )
        summary = {k: round(float(v), 5) for k, v in vals.items()}
        if naives:
            nvals = fd(
                jnp.asarray(np.concatenate(reals)),
                jnp.asarray(np.concatenate(naives)),
            )
            summary.update({
                f"{k}_naive_{args.naive_baseline}": round(float(v), 5)
                for k, v in nvals.items()
            })
        if lpips_tag:
            # degraded extractor (random VGG / untrained lin heads):
            # relative tracking only
            summary = {f"{k}{lpips_tag}": v for k, v in summary.items()}
        summary["n_clips"] = len(preds)
    else:
        summary = {
            k: round(float(np.mean([r[k] for r in reports])), 5)
            for k in reports[0]
        }
        summary["n_clips"] = len(reports)
    summary["checkpoint_step"] = int(state.step)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
