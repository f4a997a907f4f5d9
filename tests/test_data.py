"""Data pipeline tests: geometry golden values, perturbations, dataset
contract, loader batching."""

import numpy as np
import pytest

from faceoff_tpu.data import geometry, perturbations, synthetic
from faceoff_tpu.data.dataset import (
    TemporalAlignmentDataset,
    normalize,
    denormalize,
    pack_batch,
    list_videos,
)
from faceoff_tpu.data.pipeline import DataLoader


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    synthetic.generate_dataset(str(root), n_videos=3, n_frames=10, size=128)
    return str(root)


class TestGeometry:
    def test_resize_frame_pads_to_square(self):
        frame = np.full((100, 60, 3), 200, np.uint8)
        out = geometry.resize_frame(frame, 64)
        assert out.shape == (64, 64, 3)
        # padding columns are black
        assert out[:, 0].max() == 0 and out[:, -1].max() == 0
        assert out[:, 32].min() > 0

    def test_convex_hull_mask(self):
        pts = np.array([[10, 10], [50, 10], [50, 50], [10, 50]])
        mask = geometry.convex_hull_mask((64, 64, 3), pts)
        assert mask[30, 30, 0] == 255
        assert mask[5, 5, 0] == 0
        assert mask.dtype == np.uint8

    def test_enlarge_mask_grows(self):
        pts = np.array([[20, 20], [40, 20], [40, 40], [20, 40]])
        mask = geometry.convex_hull_mask((64, 64, 3), pts)
        big = geometry.enlarge_mask(mask, enlargement=5)
        assert big.sum() > mask.sum()
        assert (big.astype(int) - mask.astype(int)).min() >= 0  # superset

    def test_umeyama_recovers_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (5, 2))
        angle, scale, t = 0.3, 1.4, np.array([5.0, -3.0])
        R = np.array(
            [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
        )
        dst = scale * src @ R.T + t
        M = geometry.umeyama_similarity(src, dst)
        mapped = src @ M[:2, :2].T + M[:, 2]
        np.testing.assert_allclose(mapped, dst, atol=1e-6)

    def test_warp_to_landmarks_moves_content(self):
        img = np.zeros((64, 64, 3), np.uint8)
        img[10:20, 10:20] = 255
        src = np.array([[10, 10], [20, 10], [20, 20], [10, 20], [15, 15]], float)
        dst = src + 20
        warped, M = geometry.warp_to_landmarks(src, dst, img, (64, 64))
        assert warped[35, 35, 0] > 200  # content moved by +20
        assert warped[15, 15, 0] == 0

    def test_generate_warped_image_keys(self, synth_root):
        from faceoff_tpu.data.dataset import _landmark_paths, load_frame

        vids = list_videos(synth_root)
        s_img, s_lms = load_frame(_landmark_paths(vids[0])[0], 128)
        t_img, t_lms = load_frame(_landmark_paths(vids[1])[0], 128)
        out = geometry.generate_warped_image(s_lms, t_lms, s_img, t_img)
        assert out["combined"].shape == (128, 128, 3)
        # composite contains source face pixels where the warped face lives
        m = out["source_face_transformed"][..., 0] != 0
        assert m.any()
        np.testing.assert_array_equal(
            out["combined"][m], out["source_face_transformed"][m]
        )


class TestPerturbations:
    def test_translate(self):
        img = np.zeros((32, 32, 3), np.uint8)
        img[10, 10] = 255
        out = perturbations.translate(img, 3, 0)
        assert out[10, 13, 0] == 255

    def test_rotate_about_center_keeps_center(self):
        img = np.zeros((33, 33, 3), np.uint8)
        img[16, 16] = 255
        out = perturbations.rotate(img, 30, center=(16, 16))
        assert out[16, 16, 0] > 0

    def test_rescale_shapes(self):
        img = np.full((32, 32, 3), 255, np.uint8)
        up = perturbations.rescale(img, 1.1)
        down = perturbations.rescale(img, 0.9)
        assert up.shape == img.shape and down.shape == img.shape
        assert down[0, 0, 0] == 0  # shrunk content leaves border

    def test_barrel_identity_at_d1(self):
        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), np.uint8
        )
        out = perturbations.barrel_distort(img, 0, 0, 0, 1.0)
        # pure D term = identity mapping
        diff = np.abs(out.astype(int) - img.astype(int)).mean()
        assert diff < 1.0

    def test_barrel_moves_pixels(self):
        img = np.zeros((64, 64, 3), np.uint8)
        img[8:12, 8:12] = 255
        out = perturbations.barrel_distort(img, 0.5, 0.5, 0.2, 1.0)
        assert not np.array_equal(out, img)

    def test_arc_produces_output(self):
        img = np.full((64, 64, 3), 128, np.uint8)
        out = perturbations.arc_distort(img, 20)
        assert out.shape == img.shape
        assert out.sum() > 0

    def test_composite_always_perturbs(self):
        rng = np.random.default_rng(0)
        img = np.zeros((64, 64, 3), np.uint8)
        img[20:40, 20:40] = 128
        lms = synthetic.face_landmarks((32, 32), 20)
        for _ in range(10):
            out, gt = perturbations.perturb_image_composite(img, lms, rng)
            assert out.shape == img.shape
            assert set(gt) == {
                "translate_horizontal", "translate_vertical", "rotate_image",
            }

    def test_composite_deterministic_given_rng(self):
        img = np.zeros((64, 64, 3), np.uint8)
        img[20:40, 20:40] = 128
        lms = synthetic.face_landmarks((32, 32), 20)
        a, _ = perturbations.perturb_image_composite(
            img, lms, np.random.default_rng(7)
        )
        b, _ = perturbations.perturb_image_composite(
            img, lms, np.random.default_rng(7)
        )
        np.testing.assert_array_equal(a, b)


class TestDataset:
    def test_normalize_roundtrip(self):
        img = np.arange(0, 256, dtype=np.uint8).reshape(16, 16).repeat(3).reshape(16, 16, 3)
        n = normalize(img)
        assert n.min() >= -1 and n.max() <= 1
        np.testing.assert_array_equal(denormalize(n), img)

    def test_jitter_item_contract(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=128)
        item = ds.get_item(0, np.random.default_rng(0))
        assert set(item) == {"source", "background", "gt"}
        for k, v in item.items():
            assert v.shape == (4, 128, 128, 3), k
            assert v.dtype == np.float32
            assert v.min() >= -1.0 and v.max() <= 1.0
        # background and source occupy (mostly) disjoint pixels
        src_on = np.abs(item["source"][0] + 1).sum(-1) > 1e-3
        bg_on = np.abs(item["background"][0] + 1).sum(-1) > 1e-3
        overlap = (src_on & bg_on).mean()
        assert overlap < 0.5

    def test_cross_identity_item(self, synth_root):
        ds = TemporalAlignmentDataset(
            synth_root, "val", 3, resolution=128, cross_identity=True
        )
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["source"].shape == (3, 128, 128, 3)
        assert "source_original" in item
        assert "naive" not in item  # off by default

    def test_cross_identity_naive_blend_stream(self, synth_root):
        """naive_blend='paste'/'poisson' adds the naive composite baseline
        stream to cross-id items (reference
        face_translation_videos3_utils.py:184-190), and the two blends
        differ."""
        items = {}
        for blend in ("paste", "poisson"):
            ds = TemporalAlignmentDataset(
                synth_root, "val", 2, resolution=128, cross_identity=True,
                naive_blend=blend,
            )
            items[blend] = ds.get_item(0, np.random.default_rng(0))
        for blend, item in items.items():
            assert item["naive"].shape == (2, 128, 128, 3)
            assert item["naive"].min() >= -1 and item["naive"].max() <= 1
        assert not np.allclose(items["paste"]["naive"],
                               items["poisson"]["naive"])
        import pytest as _pytest

        with _pytest.raises(ValueError):
            TemporalAlignmentDataset(
                synth_root, "val", 2, cross_identity=True,
                naive_blend="bogus",
            )

    def test_alignment_item(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 3, resolution=128)
        item = ds.get_item_alignment(0, np.random.default_rng(0))
        assert item["transforms"].shape == (3, 3)

    def test_color_jitter_changes_source_only(self, synth_root):
        ds0 = TemporalAlignmentDataset(synth_root, "train", 2, resolution=128)
        ds1 = TemporalAlignmentDataset(
            synth_root, "train", 2, resolution=128, color_jitter_type="const"
        )
        a = ds0.get_item(0, np.random.default_rng(3))
        b = ds1.get_item(0, np.random.default_rng(3))
        np.testing.assert_array_equal(a["gt"], b["gt"])

    def test_grayscale(self, synth_root):
        ds = TemporalAlignmentDataset(
            synth_root, "train", 2, resolution=128, grayscale=True
        )
        item = ds.get_item(0, np.random.default_rng(0))
        g = item["gt"]
        np.testing.assert_array_equal(g[..., 0], g[..., 1])


class TestLoader:
    def test_batch_shapes(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=128)
        loader = DataLoader(ds, batch_clips=2, num_workers=2, seed=1)
        batch = next(iter(loader))
        assert batch["input"].shape == (2, 4, 128, 128, 6)
        assert batch["gt"].shape == (2, 4, 128, 128, 3)

    def test_epoch_advances_and_reshuffles(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 2, resolution=128)
        loader = DataLoader(ds, batch_clips=1, num_workers=1, seed=1)
        n1 = sum(1 for _ in loader)
        assert loader.epoch == 1
        assert n1 == len(loader)


class TestAlignedImage:
    def test_eye_alignment_transfer(self, synth_root):
        from faceoff_tpu.data.dataset import _landmark_paths, load_frame
        from faceoff_tpu.data.geometry import generate_aligned_image

        vids = list_videos(synth_root)
        s_img, s_lms = load_frame(_landmark_paths(vids[0])[0], 128)
        t_img, t_lms = load_frame(_landmark_paths(vids[1])[0], 128)
        out = generate_aligned_image(s_lms, t_lms, s_img, t_img)
        assert out["combined"].shape == (128, 128, 3)
        m = out["source_face_transformed"][..., 0] != 0
        assert m.any()
        # face lands near the target's eye centre
        from faceoff_tpu.data.geometry import eye_geometry

        _, tgt_center, _ = eye_geometry(t_lms)
        ys, xs = np.nonzero(m)
        cx, cy = xs.mean(), ys.mean()
        assert abs(cx - tgt_center[0]) < 25


def test_crossid_short_videos_static_shape(tmp_path):
    """Cross-identity items clamp the random start and pad short windows
    to the static clip length (the reference tolerates ragged clips,
    dataset.py:341-354; XLA cannot) — regression for evaluate --crossid
    crashing on videos shorter than frames+6."""
    from faceoff_tpu.data import synthetic
    from faceoff_tpu.data.dataset import TemporalAlignmentDataset

    synthetic.generate_dataset(str(tmp_path), n_videos=2, n_frames=4, size=64)
    ds = TemporalAlignmentDataset(
        str(tmp_path), "val", 8, resolution=64, cross_identity=True
    )
    for seed in range(4):
        item = ds.get_item(0, np.random.default_rng(seed))
        assert item["gt"].shape == (8, 64, 64, 3)
        assert item["source"].shape == (8, 64, 64, 3)
