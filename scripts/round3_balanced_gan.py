#!/usr/bin/env python
"""Round-3 follow-up: a BALANCED adversarial fine-tune from an
under-converged perceptual checkpoint.

The undertrained-run diagnosis (artifacts/round3_undertrained): at the
reference's hardcoded generator-side weights (0.25/0.25,
/root/reference/config.py:9-10) the adversarial terms dwarf a small
reconstruction loss ~80x, so stage B trades reconstruction away
(PSNR 23.9 -> 14.4, fd_vgg 0.030 -> 0.868). This script runs the same
stage B with the new --g2d_weight/--g3d_weight/--adversarial_ramp knobs
balanced against the measured recon scale, from an EARLIER stage-A
checkpoint (default step 500) where the Frechet metric is not yet
saturated — the regime the GAN recipe exists for.

Reuses the round3_undertrained fixture + stage-A checkpoints in
$R3B_WORK (default /tmp/r3_b). Artifacts: artifacts/round3_balanced/.
Headline check: stage B must IMPROVE fd_vgg over the stage-A checkpoint
WITHOUT collapsing PSNR.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
ART = os.environ.get("R3B_ART", osp.join(REPO, "artifacts", "round3_balanced"))
WORK = os.environ.get("R3B_WORK", "/tmp/r3_b")
DATA = osp.join(WORK, "ds")
CK_A = os.environ.get("R3B_CKPT_A", osp.join(WORK, "ckpt_a"))
CKPT_STEP = os.environ.get("R3B_CKPT_STEP", "500")
SIZE = int(os.environ.get("R3B_SIZE", 256))
FRAMES = int(os.environ.get("R3B_FRAMES", 16))
STEPS = int(os.environ.get("R3B_GAN_STEPS", 1200))
ADV_START = int(os.environ.get("R3B_ADV_START", 200))
ADV_RAMP = int(os.environ.get("R3B_ADV_RAMP", 400))
G2D = os.environ.get("R3B_G2D", "0.02")
G3D = os.environ.get("R3B_G3D", "0.02")
B_FLAGS = os.environ.get("R3B_B_FLAGS", "--device_pipeline").split()
CK_B = osp.join(WORK, f"ckpt_b_balanced_{CKPT_STEP}")


def run(args, tag, timeout=2400, attempts=2):
    """timeout + fresh-process retry: the TPU-relay TCP link wedges
    intermittently; a new process reconnects fine."""
    print(f"[{tag}] $ {' '.join(args)}", flush=True)
    for attempt in range(attempts):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m"] + args, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                timeout=timeout,
            )
            break
        except subprocess.TimeoutExpired as e:
            out = e.stdout or ""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            with open(osp.join(ART, f"{tag}.log"), "w") as f:
                f.write(out)
            print(f"[{tag}] attempt {attempt + 1} timed out after "
                  f"{timeout}s — retrying in a fresh process", flush=True)
    else:
        raise SystemExit(f"{tag} timed out {attempts}x")
    log = osp.join(ART, f"{tag}.log")
    with open(log, "w") as f:
        f.write(proc.stdout)
    print(f"[{tag}] rc={proc.returncode} in {time.time() - t0:.0f}s "
          f"(log: {log})", flush=True)
    if proc.returncode != 0:
        print(proc.stdout[-4000:], flush=True)
        raise SystemExit(f"{tag} failed")
    return proc.stdout


def run_json(args, tag, **kw):
    side = osp.join(ART, f"{tag}.json")
    if osp.exists(side):
        with open(side) as f:
            res = json.load(f)
        print(f"[{tag}] cached: {side}", flush=True)
        return res
    out = run(args, tag, **kw)
    res = None
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                res = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if res is None:
        raise ValueError(f"{tag}: no JSON line in output")
    with open(side, "w") as f:
        json.dump(res, f)
    return res


def main():
    os.makedirs(ART, exist_ok=True)
    assert osp.isdir(DATA) and osp.isdir(CK_A), (
        f"needs the round3_undertrained fixture+checkpoints at {WORK}; "
        "run scripts/round3_quality_run.py with R3_WORK first"
    )
    report = {"note": (
        f"balanced adversarial fine-tune from stage-A step {CKPT_STEP}: "
        f"g2d/g3d {G2D}/{G3D} (reference 0.25/0.25), adversarial_start "
        f"{ADV_START} + linear ramp {ADV_RAMP}, {STEPS} steps at {SIZE}px; "
        "control with default weights: artifacts/round3_undertrained"
    )}

    eval_base = [
        "faceoff_tpu.cli.evaluate", "--data_root", DATA, "--size",
        str(SIZE), "--frames", str(FRAMES), "--max_batches", "12",
    ]
    report["stageA_eval"] = run_json(
        eval_base + ["--checkpoint_dir", CK_A, "--ckpt", CKPT_STEP],
        "stageA_eval")
    report["stageA_crossid_fd"] = run_json(
        eval_base + ["--checkpoint_dir", CK_A, "--ckpt", CKPT_STEP,
                     "--crossid", "--naive_baseline", "paste"],
        "stageA_crossid")

    if not osp.isdir(CK_B):
        run([
            "faceoff_tpu.cli.train_faceoff_gan",
            "--data_root", DATA, "--gan", "mocoganhd",
            "--size", str(SIZE),
            "--train_frames", str(FRAMES),
            "--sample_frames", str(FRAMES),
            "--val_frames", str(FRAMES), "--val_batches", "4",
            "--steps", str(STEPS),
            "--adversarial_start", str(ADV_START),
            "--adversarial_ramp", str(ADV_RAMP),
            "--g2d_weight", G2D, "--g3d_weight", G3D,
            "--validate_at", "200", "--num_workers", "8", *B_FLAGS,
            "--ckpt", CKPT_STEP, "--gen_checkpoint_dir", CK_A,
            "--metrics_path", osp.join(ART, "stageB_metrics.jsonl"),
            "--sample_folder", osp.join(WORK, "samples_b_balanced"),
            "--checkpoint_dir", CK_B,
        ], "stageB_train", timeout=4 * 3600)

    report["stageB_eval"] = run_json(
        eval_base + ["--checkpoint_dir", CK_B], "stageB_eval")
    report["stageB_crossid_fd"] = run_json(
        eval_base + ["--checkpoint_dir", CK_B,
                     "--crossid", "--naive_baseline", "paste"],
        "stageB_crossid")

    fd_a = report["stageA_crossid_fd"]["fd_vgg_random_vgg"]
    fd_b = report["stageB_crossid_fd"]["fd_vgg_random_vgg"]
    psnr_a = report["stageA_eval"]["psnr"]
    psnr_b = report["stageB_eval"]["psnr"]
    report["headline"] = {
        "fd_vgg_stageA": fd_a, "fd_vgg_stageB": fd_b,
        "psnr_stageA": psnr_a, "psnr_stageB": psnr_b,
        "fd_improved": bool(fd_b < fd_a),
        "psnr_held": bool(psnr_b > psnr_a - 1.0),
    }
    with open(osp.join(ART, "balanced_gan.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["headline"]))


if __name__ == "__main__":
    main()
