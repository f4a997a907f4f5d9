#!/usr/bin/env python
"""Convert torch LPIPS weights to the faceoff_tpu `.npz` layout.

The reference obtains its perceptual metric from two torch checkpoints at
runtime (reference models/lpips.py:12-48): torchvision's VGG16 `features`
and the taming-transformers `vgg.pth` with the five learned `lin` heads.
This offline converter maps either/both into a flat `.npz` consumed by
faceoff_tpu.models.lpips.load_lpips_weights:

    python tools/convert_lpips.py \
        --vgg16 /path/to/vgg16-397923af.pth \
        --lpips /path/to/vgg.pth \
        --out lpips_weights.npz

Layout: `vgg/convB_C/kernel` (HWIO) + `vgg/convB_C/bias`, `linK/kernel`
(1,1,C,1). Torch conv kernels are OIHW and transpose to HWIO.
"""

import argparse

import numpy as np

# torchvision vgg16.features indices of the conv layers, in order, grouped
# by block (reference models/lpips.py:115-134 slices at 4/9/16/23/30).
_VGG16_CONV_IDS = [
    (0, "conv1_1"), (2, "conv1_2"),
    (5, "conv2_1"), (7, "conv2_2"),
    (10, "conv3_1"), (12, "conv3_2"), (14, "conv3_3"),
    (17, "conv4_1"), (19, "conv4_2"), (21, "conv4_3"),
    (24, "conv5_1"), (26, "conv5_2"), (28, "conv5_3"),
]


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _slice_of(idx: int) -> int:
    """VGG16 feature index -> LPIPS slice number (reference
    models/lpips.py:115-134 slices at 4/9/16/23/30)."""
    for s, stop in enumerate((4, 9, 16, 23, 30), start=1):
        if idx < stop:
            return s
    raise ValueError(idx)


def convert(vgg16_path=None, lpips_path=None):
    import torch

    out = {}
    if vgg16_path:
        sd = torch.load(vgg16_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        for idx, name in _VGG16_CONV_IDS:
            w = sd[f"features.{idx}.weight"].numpy()
            b = sd[f"features.{idx}.bias"].numpy()
            out[f"vgg/{name}/kernel"] = _oihw_to_hwio(w)
            out[f"vgg/{name}/bias"] = b

    if lpips_path:
        sd = torch.load(lpips_path, map_location="cpu")
        # The taming `vgg.pth` is a full LPIPS state dict: it carries the
        # VGG16 conv weights too (net.slice{s}.{idx}.*), so --vgg16 is only
        # needed when converting from a bare torchvision checkpoint.
        for idx, name in _VGG16_CONV_IDS:
            key = f"net.slice{_slice_of(idx)}.{idx}.weight"
            if key in sd:
                out[f"vgg/{name}/kernel"] = _oihw_to_hwio(sd[key].numpy())
                out[f"vgg/{name}/bias"] = sd[
                    f"net.slice{_slice_of(idx)}.{idx}.bias"
                ].numpy()
        for k in range(5):
            # taming layout: lin{k}.model.1.weight, shape (1, C, 1, 1)
            for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
                if cand in sd:
                    w = sd[cand].numpy()
                    out[f"lin{k}/kernel"] = _oihw_to_hwio(w)
                    break
            else:
                raise KeyError(f"lin{k} weight not found in {lpips_path}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", default=None, help="torchvision vgg16 .pth")
    ap.add_argument("--lpips", default=None, help="taming vgg.pth (lin heads)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if not (args.vgg16 or args.lpips):
        ap.error("need --vgg16 and/or --lpips")
    arrays = convert(args.vgg16, args.lpips)
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays)} arrays to {args.out}")


if __name__ == "__main__":
    main()
