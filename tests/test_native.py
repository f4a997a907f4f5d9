"""Native C++ frame loader tests: build, parity with the cv2 path, errors."""

import glob
import os.path as osp

import numpy as np
import pytest

from faceoff_tpu import native
from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import (
    _landmark_paths,
    load_frame,
    load_window_frames,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    synthetic.generate_dataset(str(root), n_videos=1, n_frames=6, size=128)
    return str(root)


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
class TestNativeLoader:
    def test_square_path_bit_exact(self, synth_root):
        vids = sorted(glob.glob(synth_root + "/*"))
        lms = _landmark_paths(vids[0])
        paths = [p.rsplit("_", 1)[0] + ".jpg" for p in lms]
        out = native.load_frames(paths, 128)
        assert out.shape == (6, 128, 128, 3)
        ref, _ = load_frame(lms[0], 128)
        np.testing.assert_array_equal(out[0], ref)

    def test_resize_close_to_cv2(self, synth_root):
        vids = sorted(glob.glob(synth_root + "/*"))
        lms = _landmark_paths(vids[0])
        paths = [p.rsplit("_", 1)[0] + ".jpg" for p in lms]
        out = native.load_frames(paths, 96)
        ref, _ = load_frame(lms[0], 96)
        diff = np.abs(out[0].astype(int) - ref.astype(int))
        assert diff.max() <= 2  # rounding differences only

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native.load_frames(["/nonexistent/frame.jpg"], 64)


class TestWindowLoader:
    def test_matches_per_frame_path(self, synth_root):
        vids = sorted(glob.glob(synth_root + "/*"))
        window = _landmark_paths(vids[0])[:4]
        frames, lms = load_window_frames(window, 128)
        assert frames.shape == (4, 128, 128, 3)
        assert lms.shape == (4, 68, 2)
        ref_img, ref_lms = load_frame(window[0], 128)
        np.testing.assert_array_equal(frames[0], ref_img)
        np.testing.assert_array_equal(lms[0], ref_lms)
