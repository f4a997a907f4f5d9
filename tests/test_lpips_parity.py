"""LPIPS numerical parity vs a torch implementation of the reference
metric.

This environment has no network egress, so the *learned* weights
(torchvision VGG16 + taming vgg.pth lin heads; reference
models/lpips.py:12-48) cannot be fetched. Instead we prove the pipeline:
a torch LPIPS built exactly to the reference's architecture
(reference models/lpips.py:50-161) with RANDOM weights is exported in the
taming `vgg.pth` state-dict layout, converted by tools/convert_lpips.py,
and loaded into the JAX module — forward values must then agree to float32
tolerance. With the real `vgg.pth`, the identical path yields the real
metric, so metric parity reduces to supplying the file.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_lpips import convert  # noqa: E402

from faceoff_tpu.models.lpips import init_lpips  # noqa: E402

# VGG16 `features` plan (torchvision indices): conv indices and channels.
_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_SLICE_STOPS = (4, 9, 16, 23, 30)
_CHNS = (64, 128, 256, 512, 512)


def _build_torch_features():
    """torchvision-vgg16-compatible `features` stack (conv/relu/pool at the
    standard indices), randomly initialized."""
    layers = []
    conv_at = {idx: (ci, co) for idx, ci, co in _CONVS}
    pool_at = {4, 9, 16, 23, 30}
    for idx in range(31):
        if idx in conv_at:
            ci, co = conv_at[idx]
            layers.append(tnn.Conv2d(ci, co, 3, padding=1))
        elif idx in pool_at:
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.ReLU(inplace=False))
    return tnn.Sequential(*layers)


class _TorchLPIPS(tnn.Module):
    """The reference metric (reference models/lpips.py:50-161): scaling
    layer, 5 VGG slices, channel-unit-normalize, squared diff, 1x1 no-bias
    lin heads, spatial average, sum over levels. Dropout is identity in
    eval mode, matching the deterministic JAX module."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self.features = _build_torch_features()
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c in _CHNS]
        )

    def _slices(self, x):
        taps = []
        start = 0
        for stop in _SLICE_STOPS:
            for idx in range(start, stop):
                x = self.features[idx](x)
            taps.append(x)
            start = stop
        return taps

    @staticmethod
    def _unit(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x * x, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, target, pred):
        f0 = self._slices((target - self.shift) / self.scale)
        f1 = self._slices((pred - self.shift) / self.scale)
        val = 0.0
        for k in range(5):
            d = (self._unit(f0[k]) - self._unit(f1[k])) ** 2
            val = val + self.lins[k](d).mean(dim=[2, 3], keepdim=True)
        # reference loss.py:32-33 wraps the (N,1,1,1) output with .mean()
        return val.mean()

    def taming_state_dict(self):
        """Export in the taming vgg.pth layout (net.slice{s}.{idx}.*,
        lin{k}.model.1.weight) that tools/convert_lpips.py consumes."""
        sd = {}
        start, s = 0, 1
        for stop in _SLICE_STOPS:
            for idx in range(start, stop):
                mod = self.features[idx]
                if isinstance(mod, tnn.Conv2d):
                    sd[f"net.slice{s}.{idx}.weight"] = mod.weight.detach()
                    sd[f"net.slice{s}.{idx}.bias"] = mod.bias.detach()
            start, s = stop, s + 1
        for k, lin in enumerate(self.lins):
            sd[f"lin{k}.model.1.weight"] = lin.weight.detach()
        return sd


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.15, a.shape), -1, 1).astype(np.float32)
    return a, b


def test_jax_matches_torch_reference(pair, tmp_path):
    a, b = pair
    ref = _TorchLPIPS().eval()
    with torch.no_grad():
        want = float(
            ref(
                torch.from_numpy(a).permute(0, 3, 1, 2),
                torch.from_numpy(b).permute(0, 3, 1, 2),
            )
        )

    pth = tmp_path / "vgg.pth"
    torch.save(ref.taming_state_dict(), pth)
    arrays = convert(lpips_path=str(pth))
    # 13 conv kernels + 13 biases + 5 lin heads, all from the one file
    assert len(arrays) == 31
    npz = tmp_path / "lpips.npz"
    np.savez(npz, **arrays)

    model, variables = init_lpips(
        jax.random.key(0), image_size=64, weights_npz=str(npz)
    )
    got = float(model.apply(variables, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_identical_inputs_score_zero(pair, tmp_path):
    a, _ = pair
    model, variables = init_lpips(jax.random.key(0), image_size=64)
    got = float(model.apply(variables, jnp.asarray(a), jnp.asarray(a)))
    assert abs(got) < 1e-6


def test_auto_discovery_converts_dropped_pth(tmp_path, monkeypatch):
    """--lpips_weights auto: a user-dropped taming-style vgg.pth is found
    via $FACEOFF_LPIPS_WEIGHTS, auto-converted with the proven converter,
    cached as .npz, and the loaded weights change the metric vs the
    random-VGG fallback."""
    from faceoff_tpu.models.lpips import (
        discover_lpips_weights,
        resolve_lpips_weights,
    )

    ref = _TorchLPIPS().eval()
    pth = tmp_path / "vgg.pth"
    torch.save(ref.taming_state_dict(), pth)

    monkeypatch.setenv("FACEOFF_LPIPS_WEIGHTS", str(pth))
    monkeypatch.setenv("HOME", str(tmp_path))  # isolate the conversion cache
    npz = discover_lpips_weights()
    assert npz is not None and npz.endswith(".npz")
    data = np.load(npz)
    assert len(data.files) == 31

    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.2, -1, 1).astype(np.float32)
    _, v_auto = init_lpips(jax.random.key(0), image_size=64, weights_npz=npz)
    model, v_rand = init_lpips(jax.random.key(0), image_size=64)
    got_auto = float(model.apply(v_auto, jnp.asarray(a), jnp.asarray(b)))
    got_rand = float(model.apply(v_rand, jnp.asarray(a), jnp.asarray(b)))
    assert got_auto != pytest.approx(got_rand)

    # an .npz hit passes through resolve unchanged; 'auto' resolves to it
    monkeypatch.setenv("FACEOFF_LPIPS_WEIGHTS", npz)
    assert resolve_lpips_weights("auto") == npz
    assert resolve_lpips_weights(npz) == npz
    assert resolve_lpips_weights(None) is None

    # nothing findable -> loud None (random-VGG fallback stays the default)
    monkeypatch.delenv("FACEOFF_LPIPS_WEIGHTS")
    monkeypatch.chdir(tmp_path / "empty" if (tmp_path / "empty").mkdir()
                      is None else tmp_path)
    import os
    os.remove(npz)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "empty"))
    assert discover_lpips_weights(verbose=False) is None
