#!/usr/bin/env python
"""Extract REAL face-video clips from the reference's published result GIFs.

The reference repo ships no raw training data, but its `results/` GIFs
(reference README.md:14-22) embed real source/target face footage as
side-by-side video panels. This tool recovers that footage as a small
real-video corpus for training/evaluation evidence:

1. Decode each GIF (cv2).
2. Locate video panels by TEMPORAL VARIANCE: panel pixels change across
   frames while the poster background, labels and arrows are static.
3. Sort panels row-major and keep only the ones a per-GIF table marks as
   REAL footage (source/target columns — "output"/method panels are
   model-generated and excluded).
4. Write each kept panel as a 256px mp4 clip, ready for
   `python -m faceoff_tpu.cli.preprocess landmarks --clips <out>` which
   produces the training dataset contract (frames + *_landmarks.npz).

Run:
  python tools/extract_reference_footage.py --gif_dir /root/reference/results \
      --out /tmp/real_clips [--preview /tmp/panels]

PROVENANCE / CONSENT NOTE: the recovered panels are identifiable real-face
footage republished by the reference authors in their result GIFs. The
reference repo carries no license file and no statement of the subjects'
consent, so the upstream rights basis for this footage is UNVERIFIED. It
is used here strictly as in-environment evaluation/benchmark evidence for
reproducing the reference's published behavior (the footage the authors
themselves published for exactly that purpose); it is NOT redistributed
with this repo, and the extracted clips must not be treated as a
general-purpose training dataset or shipped anywhere without clearing the
underlying rights. The extractor refuses to run unless the caller
acknowledges this with --provenance_ack.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from faceoff_tpu.io.video import save_frames_as_video  # noqa: E402

# Which row-major panel indices hold REAL footage per GIF. Derived by
# inspecting each layout: 3-panel strips are (source, output, target);
# comparison strips are (source, target, method, method, method); the
# more_result sheet is two side-by-side 3x3 grids whose columns are
# (source, output, target). Pipeline/infographic GIFs overlay animated
# annotations on the panels and are excluded entirely.
REAL_PANELS = {
    "v2v_results1.gif": [0, 2],
    "v2v_results2.gif": [0, 2],
    "v2v_results3.gif": [0, 2],
    "v2v_results4.gif": [0, 2],
    "v2v_same_identity1.gif": [0, 2],
    "v2v_same_identity2.gif": [0, 2],
    "v2v_same_identity3.gif": [0, 2],
    "v2v_comparisons1.gif": [0, 1],
    "v2v_comparisons31.gif": [0, 1],
    # infographic strip: (source, output, target) + a small side motion
    # panel; the left motion panel falls below the size filter
    "v2v_faceswapping_looped2.gif": [0, 2],
    # rows of 6 = [src, out, tgt] x 2 grids; real = all but columns 1, 4
    "v2v_more_result.gif": [0, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17],
}

# GIFs whose panels touch (no gutters): each detected blob is a uniform
# rows x cols grid of panels and must be split into cells.
GRID_SPLIT = {"v2v_more_result.gif": (3, 3)}

MIN_SIDE = 55          # smallest plausible face panel (px)
ASPECT = (0.6, 1.6)    # face panels are near-square; excludes eye strips
STD_THRESH = 3.0       # temporal std above GIF dither noise
ROW_TOL = 40           # y-center tolerance when grouping rows


def read_gif(path: str) -> list[np.ndarray]:
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def detect_panels(
    frames: list[np.ndarray], grid: tuple[int, int] | None = None,
) -> list[tuple[int, int, int, int]]:
    """Boxes (x, y, w, h) of video panels, sorted row-major.

    With `grid=(rows, cols)`, every detected blob is split into a uniform
    grid of cells (for contact sheets whose panels touch with no gutters).
    """
    gray = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    ).astype(np.float32)
    std = gray.std(axis=0)
    mask = (std > STD_THRESH).astype(np.uint8)
    kernel = np.ones((5, 5), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel, iterations=1)
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel, iterations=1)

    n, _, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    boxes = []
    for i in range(1, n):
        x, y, w, h = (int(v) for v in stats[i, :4])
        if grid is not None:
            rows, cols = grid
            if w < cols * MIN_SIDE or h < rows * MIN_SIDE:
                continue
            cw, ch = w // cols, h // rows
            for r in range(rows):
                for c in range(cols):
                    boxes.append((x + c * cw, y + r * ch, cw, ch))
            continue
        if w < MIN_SIDE or h < MIN_SIDE:
            continue
        a = w / h
        if a > ASPECT[1]:
            # two+ panels merged side by side (tight gutters / dashed
            # borders bridge under morphology): split into equal cells
            k = max(2, round(a))
            cw = w // k
            if not (ASPECT[0] <= cw / h <= ASPECT[1]):
                continue
            for c in range(k):
                boxes.append((x + c * cw, y, cw, h))
            continue
        if a < ASPECT[0]:
            continue
        boxes.append((x, y, w, h))

    # trim static edges (label text bridged into the component, border
    # slivers): drop leading/trailing rows & cols whose mean temporal std
    # is near zero
    boxes = [_trim_static_edges(std, b) for b in boxes]
    boxes = [b for b in boxes if b[2] >= MIN_SIDE and b[3] >= MIN_SIDE]

    # row-major: group by y-center, sort rows by y then panels by x
    boxes.sort(key=lambda b: b[1] + b[3] / 2)
    rows: list[list[tuple]] = []
    for b in boxes:
        yc = b[1] + b[3] / 2
        if rows and abs(yc - (rows[-1][0][1] + rows[-1][0][3] / 2)) < ROW_TOL:
            rows[-1].append(b)
        else:
            rows.append([b])
    out = []
    for row in rows:
        out += sorted(row, key=lambda b: b[0])
    return out


def _trim_static_edges(
    std: np.ndarray, box: tuple[int, int, int, int], thresh: float = 2.0,
) -> tuple[int, int, int, int]:
    x, y, w, h = box
    sub = std[y: y + h, x: x + w]
    rows = sub.mean(axis=1) > thresh
    cols = sub.mean(axis=0) > thresh
    if not rows.any() or not cols.any():
        return box
    r0, r1 = int(np.argmax(rows)), h - int(np.argmax(rows[::-1]))
    c0, c1 = int(np.argmax(cols)), w - int(np.argmax(cols[::-1]))
    return (x + c0, y + r0, c1 - c0, r1 - r0)


def crop_panel(
    frames: list[np.ndarray], box: tuple[int, int, int, int],
    size: int, inset: int = 3,
) -> list[np.ndarray]:
    x, y, w, h = box
    x, y = x + inset, y + inset
    w, h = w - 2 * inset, h - 2 * inset
    out = []
    for f in frames:
        crop = f[y: y + h, x: x + w]
        out.append(
            cv2.resize(crop, (size, size), interpolation=cv2.INTER_CUBIC)
        )
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gif_dir", default="/root/reference/results")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--fps", type=int, default=15)
    p.add_argument(
        "--preview", default=None,
        help="also write first-frame panel crops as PNGs here",
    )
    p.add_argument(
        "--provenance_ack", action="store_true",
        help="acknowledge the PROVENANCE / CONSENT NOTE in this tool's "
             "docstring (unverified upstream rights; in-env evaluation "
             "evidence only, no redistribution)",
    )
    args = p.parse_args()
    if not args.provenance_ack:
        p.error(
            "this tool extracts identifiable real-face footage with "
            "unverified upstream rights — read the PROVENANCE / CONSENT "
            "NOTE in the module docstring and re-run with --provenance_ack"
        )

    os.makedirs(args.out, exist_ok=True)
    if args.preview:
        os.makedirs(args.preview, exist_ok=True)

    n_clips = 0
    for name, real_idx in sorted(REAL_PANELS.items()):
        path = osp.join(args.gif_dir, name)
        if not osp.exists(path):
            print(f"skip {name}: not found")
            continue
        frames = read_gif(path)
        boxes = detect_panels(frames, grid=GRID_SPLIT.get(name))
        need = max(real_idx) + 1
        if len(boxes) < need:
            print(
                f"WARN {name}: found {len(boxes)} panels, need {need} — skip"
            )
            continue
        stem = osp.splitext(name)[0]
        for j, idx in enumerate(real_idx):
            clip = crop_panel(frames, boxes[idx], args.size)
            out_mp4 = osp.join(args.out, f"{stem}_p{idx:02d}.mp4")
            save_frames_as_video(clip, out_mp4, fps=args.fps)
            if args.preview:
                cv2.imwrite(
                    osp.join(args.preview, f"{stem}_p{idx:02d}.png"),
                    cv2.cvtColor(clip[0], cv2.COLOR_RGB2BGR),
                )
            n_clips += 1
        print(f"{name}: {len(frames)} frames, {len(boxes)} panels, "
              f"kept {len(real_idx)}")
    print(f"wrote {n_clips} real clips -> {args.out}")


if __name__ == "__main__":
    main()
