"""Panel detection for the real-footage extractor (tools/
extract_reference_footage.py): synthetic poster frames with known moving
panels must be recovered row-major, split when merged, trimmed of static
label bleed."""

import numpy as np
import pytest

tools = pytest.importorskip("tools.extract_reference_footage")


def _poster_frames(n=12, seed=0):
    """A 200x400 static poster with two 80x80 video panels at known spots
    and a static text-like strip directly under the first panel."""
    rng = np.random.default_rng(seed)
    base = np.full((200, 400, 3), 230, np.uint8)
    base[150:160, 20:100] = 10  # static "label" under panel 1
    frames = []
    for _ in range(n):
        f = base.copy()
        f[40:120, 20:100] = rng.integers(0, 256, (80, 80, 3), np.uint8)
        f[40:120, 250:330] = rng.integers(0, 256, (80, 80, 3), np.uint8)
        frames.append(f)
    return frames


def test_detects_two_panels_row_major():
    boxes = tools.detect_panels(_poster_frames())
    assert len(boxes) == 2
    (x0, y0, w0, h0), (x1, y1, w1, h1) = boxes
    assert x0 < x1  # row-major: left panel first
    # close to the ground-truth boxes (morphology slop of a few px)
    assert abs(x0 - 20) <= 6 and abs(y0 - 40) <= 6
    assert abs(w0 - 80) <= 12 and abs(h0 - 80) <= 12
    assert abs(x1 - 250) <= 6


def test_merged_panels_split_by_aspect():
    """Two panels touching side by side (no gutter) come back as two
    near-square boxes, not one rejected wide blob."""
    rng = np.random.default_rng(1)
    frames = []
    for _ in range(10):
        f = np.full((200, 400, 3), 230, np.uint8)
        f[40:120, 20:180] = rng.integers(0, 256, (80, 160, 3), np.uint8)
        frames.append(f)
    boxes = tools.detect_panels(frames)
    assert len(boxes) == 2
    assert all(0.6 <= w / h <= 1.6 for _, _, w, h in boxes)


def test_grid_split():
    """grid=(rows, cols) splits one blob into row-major cells."""
    rng = np.random.default_rng(2)
    frames = []
    for _ in range(10):
        f = np.full((300, 400, 3), 230, np.uint8)
        f[30:270, 50:290] = rng.integers(0, 256, (240, 240, 3), np.uint8)
        frames.append(f)
    boxes = tools.detect_panels(frames, grid=(3, 3))
    assert len(boxes) == 9
    xs = sorted({x for x, _, _, _ in boxes})
    ys = sorted({y for _, y, _, _ in boxes})
    assert len(xs) == 3 and len(ys) == 3
    # row-major ordering
    assert boxes[0][1] == boxes[1][1] == boxes[2][1] == min(ys)
    assert boxes[0][0] < boxes[1][0] < boxes[2][0]


def test_static_label_not_included():
    """The static label strip under panel 1 must not extend its box."""
    boxes = tools.detect_panels(_poster_frames())
    x, y, w, h = boxes[0]
    assert y + h <= 130  # label strip starts at y=150
