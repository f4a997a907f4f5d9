#!/usr/bin/env python
"""Convert a reference torch VQVAE checkpoint to a faceoff_tpu one.

A user switching from the reference brings trained generator checkpoints
saved by its trainers (`torch.save(model.state_dict())`,
reference train_faceoff_perceptual.py:140-143). This offline converter
maps that state_dict onto the faceoff_tpu `VQVAE` parameter tree and
writes a weights-only orbax checkpoint every CLI can load via
`--checkpoint_dir`/`--ckpt`:

    python tools/convert_vqvae.py --torch_ckpt vqvae_560.pt --out ckpt/ \
        [--in_channels 6 --channel 128 --n_res_block 2 --n_res_channel 32 \
         --embed_dim 64 --n_embed 512] [--step 0]

Architecture correspondence (reference models/vqvae_conv3d_latent.py:192-240
-> faceoff_tpu/models/vqvae.py): enc_b/enc_t strided encoders, 1x1
quantize_conv_t/b, EMA quantizers, dec_t, upsample_t, dec, and the two
Conv3D temporal postnets (reference `conv3d_encoded_{b,t}`, here
`postnet_{b,t}`). Layout transforms (all verified numerically in
tests/test_convert_vqvae.py):

  Conv2d  OIHW            -> HWIO              transpose(2,3,1,0)
  Conv3d  OIDHW           -> DHWIO             transpose(2,3,4,1,0)
  ConvT2d (I,O,kH,kW)     -> flipped (kH,kW,I,O)
          transpose(2,3,0,1)[::-1,::-1] — flax ConvTranspose's default
          no-flip convention equals torch's gradient-of-conv formulation
          only after a spatial kernel flip
  Quantize buffers embed/cluster_size/embed_avg -> VQCodebook unchanged
          (both store (dim, n_embed))

`export_torch_state_dict` is the exact inverse, used by the round-trip
test and for moving faceoff_tpu weights back to a torch runtime.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
from typing import Dict, List, Tuple

import numpy as np

# runnable as `python tools/convert_vqvae.py` from a source checkout
_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# (torch prefix, flax params path, kind) triples; kind selects the layout
# transform. Torch Sequential indices follow the reference constructors
# (Encoder :103-131, Decoder :134-166, Conv3dLatentPostnet :169-190).
_CONV2D, _CONV3D, _CONVT2D = "conv2d", "conv3d", "convT2d"


def _encoder_entries(name: str, stride: int, n_res_block: int) -> List:
    if stride == 4:
        seq = [(0, "Conv_0"), (2, "Conv_1"), (4, "Conv_2")]
        base = 5
    else:
        seq = [(0, "Conv_0"), (2, "Conv_1")]
        base = 3
    out = [(f"{name}.blocks.{i}", (name, fl), _CONV2D) for i, fl in seq]
    for r in range(n_res_block):
        out.append((f"{name}.blocks.{base + r}.conv.1",
                    (name, f"ResBlock_{r}", "Conv_0"), _CONV2D))
        out.append((f"{name}.blocks.{base + r}.conv.3",
                    (name, f"ResBlock_{r}", "Conv_1"), _CONV2D))
    return out


def _decoder_entries(name: str, stride: int, n_res_block: int) -> List:
    out = [(f"{name}.blocks.0", (name, "Conv_0"), _CONV2D)]
    for r in range(n_res_block):
        out.append((f"{name}.blocks.{1 + r}.conv.1",
                    (name, f"ResBlock_{r}", "Conv_0"), _CONV2D))
        out.append((f"{name}.blocks.{1 + r}.conv.3",
                    (name, f"ResBlock_{r}", "Conv_1"), _CONV2D))
    ct = n_res_block + 2  # Conv, R res blocks, ReLU, then transposes
    out.append((f"{name}.blocks.{ct}", (name, "ConvTranspose_0"), _CONVT2D))
    if stride == 4:
        out.append(
            (f"{name}.blocks.{ct + 2}", (name, "ConvTranspose_1"), _CONVT2D)
        )
    return out


def _postnet_entries(torch_name: str, flax_name: str) -> List:
    # reference Conv3dLatentPostnet: conv3d.{j} is Sequential(Conv3d[, ReLU])
    return [(f"{torch_name}.conv3d.{j}.0", (flax_name, f"Conv_{j}"), _CONV3D)
            for j in range(3)]


def layer_map(n_res_block: int = 2) -> List[Tuple[str, tuple, str]]:
    entries = []
    entries += _encoder_entries("enc_b", 4, n_res_block)
    entries += _encoder_entries("enc_t", 2, n_res_block)
    entries += [("quantize_conv_t", ("quantize_conv_t",), _CONV2D),
                ("quantize_conv_b", ("quantize_conv_b",), _CONV2D)]
    entries += _decoder_entries("dec_t", 2, n_res_block)
    entries += [("upsample_t", ("upsample_t",), _CONVT2D)]
    entries += _decoder_entries("dec", 4, n_res_block)
    entries += _postnet_entries("conv3d_encoded_b", "postnet_b")
    entries += _postnet_entries("conv3d_encoded_t", "postnet_t")
    return entries


def _to_flax(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == _CONV2D:
        return np.transpose(w, (2, 3, 1, 0))
    if kind == _CONV3D:
        return np.transpose(w, (2, 3, 4, 1, 0))
    if kind == _CONVT2D:
        return np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        )
    raise ValueError(kind)


def _to_torch(k: np.ndarray, kind: str) -> np.ndarray:
    if kind == _CONV2D:
        return np.transpose(k, (3, 2, 0, 1))
    if kind == _CONV3D:
        return np.transpose(k, (4, 3, 0, 1, 2))
    if kind == _CONVT2D:
        return np.ascontiguousarray(
            np.transpose(k[::-1, ::-1], (2, 3, 0, 1))
        )
    raise ValueError(kind)


def _set_path(tree: Dict, path: tuple, leaf: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def normalize_state_dict(sd: Dict) -> Dict[str, np.ndarray]:
    """Unwrap common torch checkpoint containers and DDP prefixes
    (the reference strips `module.` the same way,
    train_faceoff_perceptual.py:178-185)."""
    for key in ("state_dict", "model"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            dtype=np.float32,
        )
    return out


def convert_state_dict(
    sd: Dict[str, np.ndarray], n_res_block: int = 2
) -> Tuple[Dict, Dict]:
    """Torch state_dict -> (params, vq) trees for faceoff_tpu VQVAE.

    Raises on missing or unconsumed keys so a config mismatch (wrong
    n_res_block, non-generator checkpoint) fails loudly instead of
    silently converting a subset.
    """
    params: Dict = {}
    consumed = set()
    for t_name, f_path, kind in layer_map(n_res_block):
        w_key, b_key = f"{t_name}.weight", f"{t_name}.bias"
        if w_key not in sd:
            raise KeyError(f"torch checkpoint missing {w_key}")
        _set_path(params, f_path, "kernel", _to_flax(sd[w_key], kind))
        _set_path(params, f_path, "bias", sd[b_key])
        consumed |= {w_key, b_key}

    from faceoff_tpu.ops.vq import VQCodebook

    vq: Dict = {}
    for level in ("quantize_t", "quantize_b"):
        cb = VQCodebook(
            embed=sd[f"{level}.embed"],
            cluster_size=sd[f"{level}.cluster_size"],
            embed_avg=sd[f"{level}.embed_avg"],
        )
        vq[level] = {"codebook": cb}
        consumed |= {f"{level}.{s}" for s in
                     ("embed", "cluster_size", "embed_avg")}

    leftover = set(sd) - consumed
    if leftover:
        raise KeyError(
            f"unconsumed torch keys (config mismatch?): {sorted(leftover)[:8]}"
        )
    return params, vq


def export_torch_state_dict(
    params: Dict, vq: Dict, n_res_block: int = 2
) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: faceoff_tpu trees -> torch naming."""
    sd: Dict[str, np.ndarray] = {}
    for t_name, f_path, kind in layer_map(n_res_block):
        node = params
        for p in f_path:
            node = node[p]
        sd[f"{t_name}.weight"] = _to_torch(np.asarray(node["kernel"]), kind)
        sd[f"{t_name}.bias"] = np.asarray(node["bias"])
    for level in ("quantize_t", "quantize_b"):
        cb = vq[level]["codebook"]
        sd[f"{level}.embed"] = np.asarray(cb.embed)
        sd[f"{level}.cluster_size"] = np.asarray(cb.cluster_size)
        sd[f"{level}.embed_avg"] = np.asarray(cb.embed_avg)
    return sd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True,
                   help="orbax checkpoint dir (use as --checkpoint_dir)")
    p.add_argument("--step", type=int, default=0)
    p.add_argument("--in_channels", type=int, default=6)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--n_res_block", type=int, default=2)
    p.add_argument("--n_res_channel", type=int, default=32)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--n_embed", type=int, default=512)
    args = p.parse_args(argv)

    import torch

    sd = normalize_state_dict(
        torch.load(args.torch_ckpt, map_location="cpu")
    )
    params, vq = convert_state_dict(sd, args.n_res_block)

    import jax
    import jax.numpy as jnp

    from faceoff_tpu.io.checkpoint import CheckpointManager
    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.train import create_train_state

    model = VQVAE(
        in_channels=args.in_channels, channel=args.channel,
        n_res_block=args.n_res_block, n_res_channel=args.n_res_channel,
        embed_dim=args.embed_dim, n_embed=args.n_embed,
    )
    sample = jnp.zeros((1, 2, 32, 32, args.in_channels))
    state = create_train_state(model, jax.random.key(0), sample)

    # shape-check against the freshly initialized tree, then swap in
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, state.params)
    new_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    if ref_shapes != new_shapes:
        raise ValueError(
            "converted tree shape mismatch — wrong --channel/--embed_dim/"
            f"--n_res_block for this checkpoint?\nmodel: {ref_shapes}\n"
            f"converted: {new_shapes}"
        )
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), t
    )
    state = state.replace(params=cast(params), vq=cast(vq))
    ckpt = CheckpointManager(args.out)
    ckpt.save(args.step, state)
    ckpt.close()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {n:,} generator params -> {args.out} (step {args.step})")


if __name__ == "__main__":
    main()
