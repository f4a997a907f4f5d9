"""LPIPS perceptual metric (VGG16 backbone) in Flax.

Re-implements the learned perceptual similarity used by the canonical
trainer (reference models/lpips.py:50-161, wrapped by loss.py:27-33):
five VGG16 feature slices (relu1_2 .. relu5_3), per-channel unit
normalization, learned 1x1 'lin' heads, spatial average, summed over levels.

Weights: the reference downloads torchvision VGG16 + the taming-transformers
`vgg.pth` lin weights at runtime (reference models/lpips.py:12-48,66-68).
This build has no network egress, so weights load from a local `.npz`
produced by `tools/convert_lpips.py`; when none is provided the module
falls back to a fixed-seed random VGG — random-feature perceptual losses
are a known-usable training signal, but for *metric parity* with the
reference the converted weights must be supplied.

Inputs are (N, H, W, 3) in [-1, 1], channels-last.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Per-channel input standardization (reference models/lpips.py:96-103).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (convs per block, channels); maxpool between blocks.
_VGG_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
_CHNS = tuple(c for _, c in _VGG_BLOCKS)


class VGG16Slices(nn.Module):
    """VGG16 `features` trunk returning the 5 LPIPS tap activations
    (reference models/lpips.py:115-152)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        taps = []
        for b, (n_convs, ch) in enumerate(_VGG_BLOCKS):
            if b > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{b + 1}_{c + 1}",
                )(x)
                x = nn.relu(x)
            taps.append(x)
        return taps


def _normalize_tensor(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Unit-normalize over the channel axis (reference models/lpips.py:155-157)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance: mean over batch of the summed per-level scores.

    __call__(target, pred) -> scalar (already .mean()'d as in reference
    loss.py:32-33).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)

        net = VGG16Slices(dtype=self.dtype, name="vgg")

        def prep(x):
            return (x.astype(self.dtype) - shift) / scale

        feats0 = net(prep(target))
        feats1 = net(prep(pred))

        total = 0.0
        for k, ch in enumerate(_CHNS):
            d = (_normalize_tensor(feats0[k]) - _normalize_tensor(feats1[k])) ** 2
            # learned 1x1 head, no bias (reference models/lpips.py:106-112)
            score = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{k}"
            )(d)
            total = total + jnp.mean(score.astype(jnp.float32), axis=(1, 2, 3))
        return jnp.mean(total)


def discover_lpips_weights(verbose: bool = True) -> Optional[str]:
    """Resolve `--lpips_weights auto`: probe standard drop locations for
    converted `.npz` weights or raw torch checkpoints, auto-converting the
    latter with the test-proven converter (tools/convert_lpips.py; torch
    is in-env). Returns an `.npz` path, or None — callers must then fall
    back LOUDLY to the fixed-seed random VGG and tag their metrics
    `*_random_vgg`.

    Search order (first hit wins):
      1. $FACEOFF_LPIPS_WEIGHTS (either format)
      2. ./lpips_weights.npz, ./vgg.pth (cwd), and the same next to the
         package root
      3. ~/.cache/faceoff_tpu/lpips_weights.npz (previous auto-conversion)
      4. torch caches: $TORCH_HOME or ~/.cache/torch/hub/checkpoints/
         {vgg.pth, vgg16-397923af.pth} — where torchvision and the
         reference's downloader leave them (reference models/lpips.py:40-48
         fetches the taming `vgg.pth` with the learned lin heads)
    """
    import os
    import os.path as osp

    home = osp.expanduser("~")
    torch_home = os.environ.get(
        "TORCH_HOME", osp.join(home, ".cache", "torch")
    )
    pkg_root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    cache_npz = osp.join(
        home, ".cache", "faceoff_tpu", "lpips_weights.npz"
    )
    candidates = []
    env = os.environ.get("FACEOFF_LPIPS_WEIGHTS")
    if env:
        candidates.append(env)
    for base in (os.getcwd(), pkg_root):
        candidates += [
            osp.join(base, "lpips_weights.npz"), osp.join(base, "vgg.pth")
        ]
    candidates.append(cache_npz)
    candidates += [
        osp.join(torch_home, "hub", "checkpoints", "vgg.pth"),
        osp.join(torch_home, "hub", "checkpoints", "vgg16-397923af.pth"),
    ]

    for path in candidates:
        if not path or not osp.isfile(path):
            continue
        if path.endswith(".npz"):
            if verbose:
                print(f"lpips auto: using converted weights {path}",
                      flush=True)
            return path
        # torch checkpoint: convert once, cache the npz
        try:
            import sys

            # append (not prepend) so the repo root can never shadow
            # installed top-level packages
            if pkg_root not in sys.path:
                sys.path.append(pkg_root)
            from tools.convert_lpips import convert

            try:
                arrays = convert(lpips_path=path)  # full LPIPS state dict
            except KeyError:
                arrays = convert(vgg16_path=path)  # bare torchvision VGG16
                if verbose:
                    print(
                        f"lpips auto: {path} has no learned lin heads "
                        "(bare VGG16) — converting the trunk only; the "
                        "lin heads stay random-init, so perceptual "
                        "metrics are NOT reference-comparable (callers "
                        "tag them *_untrained_lin via "
                        "lpips_weights_trunk_only)",
                        flush=True,
                    )
            os.makedirs(osp.dirname(cache_npz), exist_ok=True)
            np.savez(cache_npz, **arrays)
            if verbose:
                print(
                    f"lpips auto: converted {path} -> {cache_npz} "
                    f"({len(arrays)} arrays)", flush=True,
                )
            return cache_npz
        except Exception as e:  # unreadable/foreign checkpoint: keep looking
            if verbose:
                print(f"lpips auto: could not convert {path}: {e}",
                      flush=True)
    if verbose:
        print(
            "lpips auto: no weights found (drop a vgg.pth or "
            "lpips_weights.npz in the working directory, or set "
            "$FACEOFF_LPIPS_WEIGHTS) — falling back to the fixed-seed "
            "RANDOM VGG; perceptual metrics are NOT reference-comparable "
            "and are reported as *_random_vgg", flush=True,
        )
    return None


def resolve_lpips_weights(arg: Optional[str]) -> Optional[str]:
    """CLI helper: pass `--lpips_weights` values through, expanding the
    literal 'auto' via discover_lpips_weights()."""
    if arg == "auto":
        return discover_lpips_weights()
    return arg


def lpips_weights_trunk_only(npz_path: Optional[str]) -> bool:
    """True when the converted weights carry the VGG trunk but NOT the
    learned lin heads (a bare torchvision vgg16 checkpoint): the heads
    stay random-init, so perceptual metrics computed with them are not
    reference-comparable and callers must tag them `*_untrained_lin`."""
    if npz_path is None:
        return False
    with np.load(npz_path) as data:
        return not any(k.startswith("lin") for k in data.files)


def init_lpips(
    key: jax.Array,
    image_size: int = 64,
    weights_npz: Optional[str] = None,
    dtype: Any = jnp.float32,
):
    """Build (module, frozen variables). Loads converted weights when given."""
    model = LPIPS(dtype=dtype)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(key, dummy, dummy)
    if weights_npz is not None:
        variables = load_lpips_weights(variables, weights_npz)
    return model, variables


def load_lpips_weights(variables, npz_path: str):
    """Overlay converted torch weights onto the param tree.

    The `.npz` layout (written by tools/convert_lpips.py) uses flat keys
    `vgg/convB_C/kernel|bias` (HWIO) and `linK/kernel`.
    """
    import flax

    data = np.load(npz_path)
    params = flax.core.unfreeze(variables["params"])
    for key in data.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        expected = node[leaf].shape
        arr = data[key]
        if arr.shape != expected:
            raise ValueError(
                f"weight {key}: shape {arr.shape} != expected {expected}"
            )
        node[leaf] = jnp.asarray(arr)
    return {"params": flax.core.freeze(params)}
