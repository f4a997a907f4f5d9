"""Offline preprocessing CLI: raw videos -> training-ready dataset.

Covers both reference stages in one tool
(reference preprocessing/preprocess_dataset.py:288-297 and
preprocessing/landmark_generation.py:363-379):

    # stage 1: face-crop clip extraction
    python -m faceoff_tpu.cli.preprocess crop --videos raw/ --out clips/

    # stage 2: landmark generation (writes the dataset contract)
    python -m faceoff_tpu.cli.preprocess landmarks --clips clips/

    # both
    python -m faceoff_tpu.cli.preprocess all --videos raw/ --out clips/

Backends auto-select (mediapipe / face_alignment when installed, otherwise
the self-contained heuristic fallback — see
faceoff_tpu/preprocess/detectors.py).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    crop = sub.add_parser("crop")
    crop.add_argument("--videos", required=True)
    crop.add_argument("--out", required=True)
    crop.add_argument("--resolution", type=int, default=256)
    crop.add_argument("--min_frames", type=int, default=30)

    lms = sub.add_parser("landmarks")
    lms.add_argument("--clips", required=True)
    lms.add_argument("--resolution", type=int, default=256)
    lms.add_argument("--bad_list", default=None,
                     help="write quarantined clip paths as json")

    both = sub.add_parser("all")
    both.add_argument("--videos", required=True)
    both.add_argument("--out", required=True)
    both.add_argument("--resolution", type=int, default=256)
    both.add_argument("--min_frames", type=int, default=30)
    both.add_argument("--bad_list", default=None)

    args = p.parse_args(argv)

    if args.cmd in ("crop", "all"):
        from faceoff_tpu.preprocess.face_crop import process_videos

        written = process_videos(
            args.videos, args.out, resolution=args.resolution,
            min_frames=args.min_frames,
        )
        print(f"crop: wrote {len(written)} clips under {args.out}")

    if args.cmd in ("landmarks", "all"):
        from faceoff_tpu.preprocess.landmarks import (
            generate_landmarks_for_dataset,
        )

        clips_root = args.out if args.cmd == "all" else args.clips
        ok, bad = generate_landmarks_for_dataset(
            clips_root, resolution=args.resolution
        )
        print(f"landmarks: {len(ok)} clips ok, {len(bad)} quarantined")
        if args.bad_list:
            with open(args.bad_list, "w") as f:
                json.dump(bad, f, indent=1)
            print(f"quarantine list -> {args.bad_list}")


if __name__ == "__main__":
    main()
