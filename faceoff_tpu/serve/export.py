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
`meta.json` sidecar describing shapes, dtypes and the streaming delay;
the zero initial state ships as its own exported program, so a loader
reconstructs everything without the model class. `load_bundle` is that
loader, and `export.py` is importable with only jax installed.

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
from typing import TYPE_CHECKING, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

if TYPE_CHECKING:  # annotation only — load_bundle must not pull in flax
    from faceoff_tpu.models.vqvae import VQVAE

_OFFLINE = "offline.stablehlo"
_PUSH = "streaming_push.stablehlo"
_FLUSH = "streaming_flush.stablehlo"
_INIT = "streaming_init.stablehlo"
_META = "meta.json"


def export_offline(
    model: "VQVAE",
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
    model: "VQVAE",
    variables,
    *,
    height: int,
    width: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[jax_export.Exported, jax_export.Exported, jax_export.Exported,
           int]:
    """Export the online-inference primitives. Returns
    (push, flush, init, delay) where push(state, frame) -> (state, out),
    flush(state, total) -> (state, out), and init() -> the zero initial
    state. Exporting `init` as a program (rather than describing the
    state schema in metadata) keeps the loader structurally correct by
    construction: whatever pytree make_stream_steps uses, the bundle
    reproduces it."""
    from faceoff_tpu.serve.streaming import make_stream_steps

    init_state, push_step, flush_step, delay, _ = make_stream_steps(
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

    def init_fn():
        # zeros constructed inside the traced fn lower to broadcast(0),
        # not embedded literals — the init artifact stays tiny
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), state_sds
        )

    plats = _norm_platforms(platforms)
    push = jax_export.export(push_step, platforms=plats)(
        state_sds, frame_sds
    )
    flush = jax_export.export(flush_step, platforms=plats)(
        state_sds, total_sds
    )
    init = jax_export.export(jax.jit(init_fn), platforms=plats)()
    return push, flush, init, delay


def save_bundle(
    out_dir: str,
    model: "VQVAE",
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
        push, flush, init, delay = export_streaming(
            model, variables, height=size, width=size, batch=batch,
            platforms=platforms,
        )
        with open(osp.join(out_dir, _PUSH), "wb") as f:
            f.write(push.serialize())
        with open(osp.join(out_dir, _FLUSH), "wb") as f:
            f.write(flush.serialize())
        with open(osp.join(out_dir, _INIT), "wb") as f:
            f.write(init.serialize())
        meta["streaming"] = {
            "push_file": _PUSH,
            "flush_file": _FLUSH,
            "init_file": _INIT,
            "frame_shape": [batch, size, size, model.in_channels],
            "delay": delay,
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
        init = _load(sm["init_file"])
        ns.init_state = lambda: init.call()
        ns.push = lambda state, frame: push.call(state, frame)
        ns.flush = lambda state, total: flush.call(
            state, jnp.asarray(total, jnp.int32)
        )
        ns.delay = sm["delay"]
    return ns


def _norm_platforms(platforms: Optional[Sequence[str]]):
    if platforms is None:
        return None
    return tuple(str(p).lower() for p in platforms)
