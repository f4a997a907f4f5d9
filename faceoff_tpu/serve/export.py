"""Ahead-of-time model export for deployment (jax.export / StableHLO).

The reference deploys by shipping the Python model code plus a `.pt`
state_dict and re-running the torch module in every serving process
(reference train_faceoff_perceptual.py:178-185 is also its only load
path). The TPU-native serving contract is different: lower the jitted
program ONCE to StableHLO with the trained weights baked in as
constants, serialize it, and run it anywhere a JAX runtime exists — no
model code, no flax, no checkpoint plumbing in the serving binary.

Two surfaces are exported:

  offline  — the chunked swap forward used by `cli/swap.py`
             (`video (B, T, H, W, 6) -> frames (B, T, H, W, 3)`)
  streaming — the per-frame online-inference primitives from
             `serve/streaming.py` (`push(state, frame)`,
             `flush(state, total)`) with their ring-buffer state

A bundle directory holds one `.stablehlo` artifact per function plus a
`meta.json` sidecar describing shapes, dtypes, the streaming delay and
the zero-state spec, so a loader can reconstruct everything without the
model class. `load_bundle` is that loader.

Cross-platform: pass `platforms=("tpu", "cpu")` to lower one artifact
for both backends (export-time lowering does not need the device).
Pallas-kernel models are lowered per-platform by XLA custom calls, so
exports default to the portable XLA VQ path (`use_pallas=False` models).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from types import SimpleNamespace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from faceoff_tpu.models.vqvae import VQVAE

_OFFLINE = "offline.stablehlo"
_PUSH = "streaming_push.stablehlo"
_FLUSH = "streaming_flush.stablehlo"
_META = "meta.json"


def export_offline(
    model: VQVAE,
    variables,
    *,
    frames: int,
    size: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Export the eval forward: video (B, T, H, W, in_ch) f32 in [-1, 1]
    -> swapped frames (B, T, H, W, 3) f32. Weights are baked in."""

    def fn(video):
        dec, _ = model.apply(variables, video, train=False)
        return dec[..., :3].astype(jnp.float32)

    spec = jax.ShapeDtypeStruct(
        (batch, frames, size, size, model.in_channels), jnp.float32
    )
    return jax_export.export(
        jax.jit(fn), platforms=_norm_platforms(platforms)
    )(spec)


def export_streaming(
    model: VQVAE,
    variables,
    *,
    height: int,
    width: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[jax_export.Exported, jax_export.Exported, dict]:
    """Export the online-inference primitives. Returns
    (push, flush, state_spec) where push(state, frame) -> (state, out)
    and flush(state, total) -> (state, out); `state_spec` describes the
    zero initial state so the loader can build it without the model."""
    from faceoff_tpu.serve.streaming import make_stream_steps

    init_state, push_step, flush_step, delay = make_stream_steps(
        model, variables
    )
    state0 = init_state(batch, height, width)

    state_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state0
    )
    frame_sds = jax.ShapeDtypeStruct(
        (batch, height, width, model.in_channels), jnp.float32
    )
    total_sds = jax.ShapeDtypeStruct((), jnp.int32)

    plats = _norm_platforms(platforms)
    push = jax_export.export(push_step, platforms=plats)(
        state_sds, frame_sds
    )
    flush = jax_export.export(flush_step, platforms=plats)(
        state_sds, total_sds
    )

    def leaf_spec(x):
        return {"shape": list(x.shape), "dtype": str(x.dtype)}

    state_spec = {
        "bufs_b": [leaf_spec(b) for b in state0["bufs_b"]],
        "bufs_t": [leaf_spec(b) for b in state0["bufs_t"]],
        "s": leaf_spec(state0["s"]),
        "delay": delay,
    }
    return push, flush, state_spec


def save_bundle(
    out_dir: str,
    model: VQVAE,
    variables,
    *,
    frames: int,
    size: int,
    batch: int = 1,
    streaming: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export offline (+ optionally streaming) and write a self-contained
    bundle directory. Returns the meta dict."""
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "format": "faceoff_tpu.serving_bundle.v1",
        "in_channels": model.in_channels,
        "offline": {
            "file": _OFFLINE,
            "input_shape": [batch, frames, size, size, model.in_channels],
            "output_shape": [batch, frames, size, size, 3],
        },
    }

    off = export_offline(
        model, variables, frames=frames, size=size, batch=batch,
        platforms=platforms,
    )
    with open(osp.join(out_dir, _OFFLINE), "wb") as f:
        f.write(off.serialize())
    meta["platforms"] = list(off.platforms)

    if streaming:
        push, flush, state_spec = export_streaming(
            model, variables, height=size, width=size, batch=batch,
            platforms=platforms,
        )
        with open(osp.join(out_dir, _PUSH), "wb") as f:
            f.write(push.serialize())
        with open(osp.join(out_dir, _FLUSH), "wb") as f:
            f.write(flush.serialize())
        meta["streaming"] = {
            "push_file": _PUSH,
            "flush_file": _FLUSH,
            "frame_shape": [batch, size, size, model.in_channels],
            "state": state_spec,
        }

    with open(osp.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_bundle(bundle_dir: str) -> SimpleNamespace:
    """Load a serving bundle WITHOUT the model class: returns a namespace
    with `offline(video)`, and when the bundle includes streaming,
    `init_state()`, `push(state, frame)`, `flush(state, total)` and
    `delay`. All callables run the deserialized StableHLO programs."""
    with open(osp.join(bundle_dir, _META)) as f:
        meta = json.load(f)
    if meta.get("format") != "faceoff_tpu.serving_bundle.v1":
        raise ValueError(f"not a serving bundle: {bundle_dir}")

    def _load(name):
        with open(osp.join(bundle_dir, name), "rb") as f:
            return jax_export.deserialize(f.read())

    ns = SimpleNamespace(meta=meta)
    offline = _load(meta["offline"]["file"])
    ns.offline = lambda video: offline.call(video)

    if "streaming" in meta:
        sm = meta["streaming"]
        push = _load(sm["push_file"])
        flush = _load(sm["flush_file"])
        spec = sm["state"]

        def init_state():
            def zeros(ls):
                return jnp.zeros(ls["shape"], ls["dtype"])

            return {
                "bufs_b": tuple(zeros(b) for b in spec["bufs_b"]),
                "bufs_t": tuple(zeros(b) for b in spec["bufs_t"]),
                "s": zeros(spec["s"]),
            }

        ns.init_state = init_state
        ns.push = lambda state, frame: push.call(state, frame)
        ns.flush = lambda state, total: flush.call(
            state, jnp.asarray(total, jnp.int32)
        )
        ns.delay = spec["delay"]
    return ns


def _norm_platforms(platforms: Optional[Sequence[str]]):
    if platforms is None:
        return None
    return tuple(str(p).lower() for p in platforms)
