"""Torch->flax VQVAE checkpoint conversion: layout transforms verified
against real torch layers, full-tree round-trip, composition parity, and
the end-to-end CLI path through orbax."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_vqvae import (  # noqa: E402
    convert_state_dict,
    export_torch_state_dict,
    normalize_state_dict,
)

from faceoff_tpu.models import VQVAE  # noqa: E402
from faceoff_tpu.models.vqvae import Encoder  # noqa: E402

CFG = dict(
    in_channels=6, channel=8, n_res_block=2, n_res_channel=4,
    embed_dim=4, n_embed=16,
)


@pytest.fixture(scope="module")
def tiny():
    model = VQVAE(dtype=jnp.float32, **CFG)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 2, 16, 16, CFG["in_channels"]))
    )
    return model, variables


def test_roundtrip_exact(tiny):
    """export -> convert is the identity on the full parameter tree."""
    _, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    params, vq = convert_state_dict(sd)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for level in ("quantize_t", "quantize_b"):
        for field in ("embed", "cluster_size", "embed_avg"):
            np.testing.assert_array_equal(
                np.asarray(getattr(variables["vq"][level]["codebook"], field)),
                np.asarray(getattr(vq[level]["codebook"], field)),
            )


def test_exported_keys_match_reference_naming(tiny):
    """The torch side of the mapping uses the reference's exact
    state_dict keys (Sequential indices per
    models/vqvae_conv3d_latent.py:103-166,169-190,192-240)."""
    _, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    expected = [
        "enc_b.blocks.0.weight",       # first stride-4 conv
        "enc_b.blocks.4.weight",       # k3 tail conv
        "enc_b.blocks.5.conv.1.weight",  # ResBlock 0, 3x3
        "enc_b.blocks.6.conv.3.weight",  # ResBlock 1, 1x1
        "enc_t.blocks.2.weight",
        "enc_t.blocks.3.conv.1.weight",
        "dec_t.blocks.4.weight",       # stride-2 ConvTranspose
        "dec.blocks.4.weight",         # first stride-4 ConvTranspose
        "dec.blocks.6.weight",         # final ConvTranspose
        "upsample_t.weight",
        "quantize_conv_t.weight",
        "conv3d_encoded_b.conv3d.0.0.weight",
        "conv3d_encoded_t.conv3d.2.0.weight",
        "quantize_t.embed",
        "quantize_b.embed_avg",
    ]
    for k in expected:
        assert k in sd, k


def _torch_resblock(sd, prefix, in_ch, ch):
    blk = tnn.Sequential(
        tnn.ReLU(), tnn.Conv2d(in_ch, ch, 3, padding=1),
        tnn.ReLU(), tnn.Conv2d(ch, in_ch, 1),
    )
    blk[1].weight.data = torch.from_numpy(sd[f"{prefix}.conv.1.weight"])
    blk[1].bias.data = torch.from_numpy(sd[f"{prefix}.conv.1.bias"])
    blk[3].weight.data = torch.from_numpy(sd[f"{prefix}.conv.3.weight"])
    blk[3].bias.data = torch.from_numpy(sd[f"{prefix}.conv.3.bias"])
    return blk


def test_encoder_composition_parity(tiny):
    """A torch stride-4 encoder assembled per the reference structure
    (Conv-ReLU-Conv-ReLU-Conv, res blocks with skip, final ReLU;
    models/vqvae_conv3d_latent.py:103-131) run on the EXPORTED weights
    matches the flax Encoder on the original weights — catching any
    Sequential-index or layout mapping error a round-trip cannot."""
    _, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    ch, rch = CFG["channel"], CFG["n_res_channel"]

    convs = tnn.Sequential(
        tnn.Conv2d(CFG["in_channels"], ch // 2, 4, stride=2, padding=1),
        tnn.ReLU(),
        tnn.Conv2d(ch // 2, ch, 4, stride=2, padding=1),
        tnn.ReLU(),
        tnn.Conv2d(ch, ch, 3, padding=1),
    )
    for i in (0, 2, 4):
        convs[i].weight.data = torch.from_numpy(sd[f"enc_b.blocks.{i}.weight"])
        convs[i].bias.data = torch.from_numpy(sd[f"enc_b.blocks.{i}.bias"])
    res = [_torch_resblock(sd, f"enc_b.blocks.{5 + r}", ch, rch)
           for r in range(CFG["n_res_block"])]

    x = np.random.default_rng(0).standard_normal((2, 16, 16, 6)).astype(
        np.float32
    )
    with torch.no_grad():
        h = convs(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        for blk in res:
            h = h + blk(h)
        y_torch = tnn.functional.relu(h).numpy().transpose(0, 2, 3, 1)

    enc = Encoder(ch, CFG["n_res_block"], rch, stride=4, dtype=jnp.float32)
    y_flax = enc.apply({"params": variables["params"]["enc_b"]}, jnp.array(x))
    np.testing.assert_allclose(y_torch, np.asarray(y_flax), atol=1e-5)


def test_decoder_transpose_parity(tiny):
    """The stride-2 decoder's ConvTranspose mapping (flip + transpose)
    reproduces torch ConvTranspose2d(k4 s2 p1) numerics through the
    exported weights (reference Decoder :134-166)."""
    _, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    ct = tnn.ConvTranspose2d(CFG["channel"], CFG["embed_dim"], 4, stride=2,
                             padding=1)
    ct.weight.data = torch.from_numpy(sd["dec_t.blocks.4.weight"])
    ct.bias.data = torch.from_numpy(sd["dec_t.blocks.4.bias"])
    x = np.random.default_rng(1).standard_normal(
        (2, 8, 8, CFG["channel"])
    ).astype(np.float32)
    with torch.no_grad():
        y_torch = ct(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    from flax import linen as nn

    sub = variables["params"]["dec_t"]["ConvTranspose_0"]
    y_flax = nn.ConvTranspose(
        CFG["embed_dim"], (4, 4), strides=(2, 2), padding="SAME"
    ).apply({"params": sub}, jnp.array(x))
    np.testing.assert_allclose(
        y_torch.transpose(0, 2, 3, 1), np.asarray(y_flax), atol=1e-5
    )


def test_postnet_conv3d_parity(tiny):
    """Conv3d OIDHW->DHWIO mapping through the exported weights
    (reference Conv3dLatentPostnet :169-190 layer 0)."""
    _, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    ch = CFG["channel"]
    c3 = tnn.Conv3d(ch, ch, 3, padding=1)
    c3.weight.data = torch.from_numpy(sd["conv3d_encoded_b.conv3d.0.0.weight"])
    c3.bias.data = torch.from_numpy(sd["conv3d_encoded_b.conv3d.0.0.bias"])
    x = np.random.default_rng(2).standard_normal(
        (1, 4, 6, 6, ch)
    ).astype(np.float32)  # (B, T, H, W, C)
    with torch.no_grad():
        y_torch = c3(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        ).numpy().transpose(0, 2, 3, 4, 1)

    from flax import linen as nn

    sub = variables["params"]["postnet_b"]["Conv_0"]
    y_flax = nn.Conv(ch, (3, 3, 3), padding="SAME").apply(
        {"params": sub}, jnp.array(x)
    )
    np.testing.assert_allclose(y_torch, np.asarray(y_flax), atol=1e-5)


def test_cli_end_to_end(tiny, tmp_path):
    """torch.save -> convert_vqvae CLI -> orbax -> restore_weights
    reproduces the original model's forward exactly (incl. DDP
    `module.` prefixes, reference train_faceoff_perceptual.py:178-185)."""
    model, variables = tiny
    sd = export_torch_state_dict(variables["params"], variables["vq"])
    pt = tmp_path / "ref.pt"
    torch.save(
        {"model": {f"module.{k}": torch.from_numpy(v) for k, v in sd.items()}},
        pt,
    )

    import convert_vqvae

    out = tmp_path / "converted"
    convert_vqvae.main([
        "--torch_ckpt", str(pt), "--out", str(out), "--step", "7",
        "--in_channels", str(CFG["in_channels"]),
        "--channel", str(CFG["channel"]),
        "--n_res_block", str(CFG["n_res_block"]),
        "--n_res_channel", str(CFG["n_res_channel"]),
        "--embed_dim", str(CFG["embed_dim"]),
        "--n_embed", str(CFG["n_embed"]),
    ])

    from faceoff_tpu.io.checkpoint import CheckpointManager
    from faceoff_tpu.train import create_train_state

    fresh = create_train_state(
        model, jax.random.key(3), jnp.zeros((1, 2, 16, 16, 6))
    )
    restored = CheckpointManager(str(out)).restore_weights(fresh, 7)

    video = jnp.array(
        np.random.default_rng(4).standard_normal((1, 2, 16, 16, 6)),
        dtype=jnp.float32,
    )
    want, _ = model.apply(
        {"params": variables["params"], "vq": variables["vq"]}, video
    )
    got, _ = model.apply(
        {"params": restored.params, "vq": restored.vq}, video
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-6)


def test_normalize_strips_wrappers():
    sd = {"state_dict": {"module.a.weight": np.ones((1,), np.float32)}}
    out = normalize_state_dict(sd)
    assert list(out) == ["a.weight"]
