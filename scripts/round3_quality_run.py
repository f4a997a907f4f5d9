#!/usr/bin/env python
"""Round-3 quality evidence: one long two-stage run on TPU.

Runs, sequentially (one process may own the TPU at a time):
  1. a 24-video / 48-frame / 256px synthetic fixture
  2. stage A — ~6k perceptual steps (the canonical recipe incl. the
     one-cycle lr+momentum schedule), validating every 500 steps
  3. quantitative eval of the stage-A checkpoint (recon + cross-id Fréchet)
  4. stage B — 1.2k GAN steps (mocoganhd recipe, --adversarial_start
     warmup), validating every 200 steps with multi-batch fd_vgg
  5. quantitative eval of the stage-B checkpoint
  6. a multi-pair cross-identity swap grid

Artifacts land in artifacts/round3/: the two metrics JSONLs, both eval
reports, the swap grid PNG and report JSON. The headline claim to verify:
the GAN stage IMPROVES fd_vgg over the perceptual checkpoint.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
if REPO not in sys.path:  # script lives in scripts/, package in the root
    sys.path.insert(0, REPO)
ART = os.environ.get("R3_ART", osp.join(REPO, "artifacts", "round3"))
WORK = os.environ.get("R3_WORK", "/tmp/r3_quality")
DATA = osp.join(WORK, "ds")
# env overrides let a CPU smoke test drive the same orchestration
N_VIDEOS = int(os.environ.get("R3_VIDEOS", 24))
N_FRAMES = int(os.environ.get("R3_FRAMES", 48))
SIZE = int(os.environ.get("R3_SIZE", 256))
STAGE_A_EPOCHS = int(os.environ.get("R3_EPOCHS", 250))  # x24 steps/epoch -> 6000
STAGE_B_STEPS = int(os.environ.get("R3_GAN_STEPS", 1200))
ADV_START = int(os.environ.get("R3_ADV_START", 200))
VAL_AT_A = int(os.environ.get("R3_VAL_AT_A", 500))
VAL_AT_B = int(os.environ.get("R3_VAL_AT_B", 200))
FRAMES_B = int(os.environ.get("R3_FRAMES_B", 16))
EXTRA_MODEL = os.environ.get("R3_MODEL_FLAGS", "").split()
# the on-device input pipeline is the intended TPU operating point (the
# host cv2 geometry path is ~20x slower per step); overridable for smokes
A_FLAGS = os.environ.get("R3_A_FLAGS", "--device_pipeline").split()
B_FLAGS = os.environ.get("R3_B_FLAGS", "--device_pipeline").split()


STALL_EXIT_CODE = 117  # train CLIs' --stall_timeout fail-fast code


def run(args, tag, timeout=2400, attempts=2):
    """timeout + retry guard against a wedged TPU-relay connection
    (observed repeatedly: a client's TCP link to the relay dies, jax
    hangs forever with ~0% CPU; a FRESH process reconnects fine — so one
    retry usually recovers). Train stages additionally arm their own
    --stall_timeout watchdog, which exits STALL_EXIT_CODE mid-run much
    sooner than the whole-stage timeout; both paths retry here, and the
    train CLIs' resume-if-present `--ckpt/--resume latest` semantics make
    the retry continue from the last checkpoint."""
    print(f"[{tag}] $ {' '.join(args)}", flush=True)
    for attempt in range(attempts):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m"] + args, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                timeout=timeout,
            )
            if proc.returncode != STALL_EXIT_CODE:
                break
            log = osp.join(ART, f"{tag}.log")
            with open(log, "w") as f:
                f.write(proc.stdout)
            print(f"[{tag}] attempt {attempt + 1} stalled (exit "
                  f"{STALL_EXIT_CODE}) — retrying; resume continues from "
                  f"the last checkpoint", flush=True)
        except subprocess.TimeoutExpired as e:
            log = osp.join(ART, f"{tag}.log")
            out = e.stdout or ""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            with open(log, "w") as f:
                f.write(out)
            print(f"[{tag}] attempt {attempt + 1} timed out after "
                  f"{timeout}s — retrying in a fresh process", flush=True)
    else:
        raise SystemExit(f"{tag} stalled/timed out {attempts}x (log: {log})")
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
    """run() + parse the last JSON line, cached in {ART}/{tag}.json so a
    rerun after a relay wedge skips completed evals."""
    side = osp.join(ART, f"{tag}.json")
    if osp.exists(side):
        with open(side) as f:
            res = json.load(f)
        print(f"[{tag}] cached: {side}", flush=True)
        return res
    res = last_json(run(args, tag, **kw))
    with open(side, "w") as f:
        json.dump(res, f)
    return res


def last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise ValueError("no JSON line found")


def main():
    os.makedirs(ART, exist_ok=True)
    report = {"note": (
        f"round-3 two-stage quality run on one TPU v5e: {N_VIDEOS}-video/"
        f"{N_FRAMES}-frame synthetic fixture at {SIZE}px; stage A "
        f"{STAGE_A_EPOCHS * N_VIDEOS} perceptual steps (one-cycle lr+b1), "
        f"stage B {STAGE_B_STEPS} mocoganhd GAN steps with "
        f"--adversarial_start {ADV_START}"
    )}

    if not osp.isdir(DATA):
        os.makedirs(WORK, exist_ok=True)
        from faceoff_tpu.data import synthetic

        synthetic.generate_dataset(
            DATA, n_videos=N_VIDEOS, n_frames=N_FRAMES, size=SIZE
        )
        print(f"fixture: {N_VIDEOS} videos x {N_FRAMES} frames at {DATA}")

    ck_a = osp.join(WORK, "ckpt_a")
    ck_b = osp.join(WORK, "ckpt_b")
    m_a = osp.join(ART, "stageA_metrics.jsonl")
    m_b = osp.join(ART, "stageB_metrics.jsonl")

    # ---- stage A: perceptual pretraining (canonical recipe)
    if not osp.isdir(ck_a):
        run([
            "faceoff_tpu.cli.train_faceoff_perceptual",
            "--data_root", DATA, "--size", str(SIZE),
            "--epoch", str(STAGE_A_EPOCHS),
            "--train_frames", "8", "--val_frames", str(FRAMES_B),
            "--validate_at", str(VAL_AT_A), "--num_workers", "8",
            "--sched", "cycle", *EXTRA_MODEL, *A_FLAGS,
            # self-healing: fail fast on a relay wedge + resume on retry
            # (with --ckpt the CLI uses checkpoint_dir AS-IS, no suffix)
            "--stall_timeout", "1800", "--ckpt", "latest",
            "--metrics_path", m_a,
            "--sample_folder", osp.join(WORK, "samples_a"),
            "--checkpoint_dir", ck_a + "_tmp",
        ], "stageA_train", timeout=4 * 3600, attempts=4)
        # run dirs get a seed suffix; normalize to a stable name
        cand = [d for d in os.listdir(WORK) if d.startswith("ckpt_a_tmp")]
        os.rename(osp.join(WORK, sorted(cand)[-1]), ck_a)

    report["stageA_eval"] = run_json([
        "faceoff_tpu.cli.evaluate", "--data_root", DATA,
        "--checkpoint_dir", ck_a, "--size", str(SIZE),
        "--frames", str(FRAMES_B), "--max_batches", "12", *EXTRA_MODEL,
    ], "stageA_eval")
    report["stageA_crossid_fd"] = run_json([
        "faceoff_tpu.cli.evaluate", "--data_root", DATA,
        "--checkpoint_dir", ck_a, "--size", str(SIZE),
        "--frames", str(FRAMES_B), "--max_batches", "12", "--crossid",
        "--naive_baseline", "paste", *EXTRA_MODEL,
    ], "stageA_crossid")

    # ---- stage B: adversarial fine-tune (mocoganhd + warmup)
    if not osp.isdir(ck_b):
        run([
            "faceoff_tpu.cli.train_faceoff_gan",
            "--data_root", DATA, "--gan", "mocoganhd",
            "--size", str(SIZE),
            "--train_frames", str(FRAMES_B),
            "--sample_frames", str(FRAMES_B),
            "--val_frames", str(FRAMES_B), "--val_batches", "4",
            "--steps", str(STAGE_B_STEPS),
            "--adversarial_start", str(ADV_START),
            "--validate_at", str(VAL_AT_B), "--num_workers", "8",
            *EXTRA_MODEL, *B_FLAGS,
            "--ckpt", "latest", "--gen_checkpoint_dir", ck_a,
            # self-healing: watchdog + exact full-state resume on retry
            # (first launch falls through to the --ckpt warm start)
            "--stall_timeout", "1800", "--resume", "latest",
            "--metrics_path", m_b,
            "--sample_folder", osp.join(WORK, "samples_b"),
            "--checkpoint_dir", ck_b,
        ], "stageB_train", timeout=4 * 3600, attempts=4)

    report["stageB_eval"] = run_json([
        "faceoff_tpu.cli.evaluate", "--data_root", DATA,
        "--checkpoint_dir", ck_b, "--size", str(SIZE),
        "--frames", str(FRAMES_B), "--max_batches", "12", *EXTRA_MODEL,
    ], "stageB_eval")
    report["stageB_crossid_fd"] = run_json([
        "faceoff_tpu.cli.evaluate", "--data_root", DATA,
        "--checkpoint_dir", ck_b, "--size", str(SIZE),
        "--frames", str(FRAMES_B), "--max_batches", "12", "--crossid",
        "--naive_baseline", "paste", *EXTRA_MODEL,
    ], "stageB_crossid")

    # ---- multi-pair cross-identity swap grid from the final model
    pairs = [(i, i + 1) for i in range(0, min(8, N_VIDEOS - 1), 2)]
    grid_rows = []
    for si, ti in pairs:
        out_mp4 = osp.join(WORK, f"swap_{si}_{ti}.mp4")
        streams = osp.splitext(out_mp4)[0] + "_composite.mp4"
        if osp.exists(out_mp4) and osp.exists(streams):
            print(f"[swap_{si}_{ti}] cached: {out_mp4}", flush=True)
            grid_rows.append((si, ti, out_mp4))
            continue
        run([
            "faceoff_tpu.cli.swap",
            "--source", osp.join(DATA, f"video_{si:03d}"),
            "--target", osp.join(DATA, f"video_{ti:03d}"),
            "--checkpoint_dir", ck_b, "--out", out_mp4,
            "--size", str(SIZE), "--chunk", str(FRAMES_B),
            "--max_frames", str(FRAMES_B), "--save_streams",
            *EXTRA_MODEL,
        ], f"swap_{si}_{ti}")
        grid_rows.append((si, ti, out_mp4))

    _write_grid(grid_rows, osp.join(ART, "crossid_grid.png"))

    # headline check: adversarial stage must IMPROVE fd_vgg
    fd_a = report["stageA_crossid_fd"]["fd_vgg_random_vgg"]
    fd_b = report["stageB_crossid_fd"]["fd_vgg_random_vgg"]
    report["fd_vgg_improvement"] = {
        "stageA": fd_a, "stageB": fd_b, "improved": bool(fd_b < fd_a),
    }
    with open(osp.join(ART, "two_stage_quality.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["fd_vgg_improvement"]))
    print(f"report: {osp.join(ART, 'two_stage_quality.json')}")


def _write_grid(rows, out_png):
    """PNG grid: per pair, (source, target, naive composite, model output)
    first frames side by side."""
    import numpy as np

    from faceoff_tpu.io.video import read_video_frames

    tiles = []
    for si, ti, mp4 in rows:
        stem = osp.splitext(mp4)[0]
        model_f = read_video_frames(mp4)[0]
        comp_f = read_video_frames(f"{stem}_composite.mp4")[0]
        bg_f = read_video_frames(f"{stem}_background.mp4")[0]
        naive = f"{stem}_naive_paste.mp4"
        naive_f = (
            read_video_frames(naive)[0] if osp.exists(naive) else comp_f
        )
        tiles.append(np.concatenate([comp_f, bg_f, naive_f, model_f], axis=1))
    grid = np.concatenate(tiles, axis=0)
    try:
        import cv2

        cv2.imwrite(out_png, grid[..., ::-1])
    except Exception:
        from PIL import Image

        Image.fromarray(grid).save(out_png)
    print(f"grid: {out_png}")


if __name__ == "__main__":
    main()
