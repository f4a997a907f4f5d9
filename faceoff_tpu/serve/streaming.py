"""Streaming (online) swap inference: frame-at-a-time VQVAE forward with
explicit temporal state.

The offline forward (models/vqvae.py) consumes whole clips because the
TemporalPostnet Conv3D stacks see the full time axis at once — which is
also the only way the reference can run the model (reference
models/vqvae_conv3d_latent.py:243-259 takes the folded clip; there is no
online path). For live serving, each centered k-tap 'SAME' Conv3D layer is
re-expressed as a sliding window over per-layer ring buffers: when input
slice t arrives, a k=3 layer emits the output slice for time t-1 (its
window center), so an n-layer postnet introduces n·(k//2) frames of
latency and every slice is computed exactly once — no redundant window
recompute, one XLA program per frame.

Numerical parity with the offline clip forward (tests/test_streaming.py):

  * zero-initialized buffers reproduce the 'SAME' zero padding at the
    stream head;
  * flushing with zero encoder slices reproduces it at the tail;
  * because 'SAME' zero-pads EVERY layer's input independently, slices
    whose time index falls outside [0, T) are masked to zero at each
    layer boundary (a freshly-started stream would otherwise leak each
    layer's bias through the warmup frames).

Everything downstream of the postnets (1x1 projections, VQ lookup, top
decoder, final decoder) is per-frame 2D compute, so the quantize+decode of
one output slice fuses into the same jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.models.vqvae import VQVAE

_FAR_FUTURE = np.iinfo(np.int32).max  # 'total' while the stream is open


def _postnet_stream(
    pn_params: Dict[str, Any],
    bufs: Tuple[jnp.ndarray, ...],
    x: jnp.ndarray,
    s: jnp.ndarray,
    total: jnp.ndarray,
    *,
    dtype,
    n_layers: int,
    kernel: int,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """One streaming step through a TemporalPostnet conv stack.

    bufs[i]: (B, kernel-1, H, W, C) — layer i's most recent input slices.
    x: (B, H, W, C) — the new layer-0 input slice, for time index `s`.
    Returns (new_bufs, emitted slice for time s - n_layers*(kernel//2)).
    """
    d = kernel // 2
    sp = ((d, d), (d, d))  # spatial 'SAME' for odd kernels
    new_bufs = []
    h = x
    for i in range(n_layers):
        lp = pn_params[f"Conv_{i}"]
        window = jnp.concatenate([bufs[i], h[:, None]], axis=1)
        new_bufs.append(window[:, 1:])
        out = jax.lax.conv_general_dilated(
            window.astype(dtype),
            lp["kernel"].astype(dtype),
            (1, 1, 1),
            ((0, 0),) + sp,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + lp["bias"].astype(dtype)
        out = out[:, 0]  # the window center: time s - (i+1)*d
        if i < n_layers - 1:
            out = jax.nn.relu(out)
        t_i = s - (i + 1) * d
        valid = jnp.logical_and(t_i >= 0, t_i < total)
        h = jnp.where(valid, out, jnp.zeros_like(out))
    return tuple(new_bufs), h


def make_stream_steps(model: VQVAE, variables, prepare_fn=None):
    """Build the jitted streaming primitives for a VQVAE.

    Returns (init_state, push_step, flush_step, delay):
      init_state(batch, height, width) -> state pytree (zero buffers, s=0)
      push_step(state, frame)  -> (state, out)   frame: (B, H, W, in_ch)
      flush_step(state, total) -> (state, out)   zero encoder slices
    where `out` is the decoded (B, H, W, out_ch) float32 slice for input
    time `state.s - delay` (garbage while that index is out of range —
    StreamingSwapper tracks validity on the host).

    prepare_fn: optional `raw_pytree -> (B, H, W, in_ch) frame` input
    pipeline; it traces INTO push_step so preprocessing (e.g. the
    cross-identity swap geometry) and the model forward are one XLA
    program per frame.
    """
    if model.temporal_kernel % 2 != 1:
        raise ValueError("streaming requires an odd temporal kernel")
    n_layers = model.temporal_postnet_layers
    kernel = model.temporal_kernel
    delay = n_layers * (kernel // 2)
    dtype = model.dtype

    def init_state(batch: int, height: int, width: int):
        if height % 8 or width % 8:
            raise ValueError("height/width must be multiples of 8")
        h4, w4 = height // 4, width // 4
        h8, w8 = height // 8, width // 8
        ch = model.channel

        def bufs(h, w):
            return tuple(
                jnp.zeros((batch, kernel - 1, h, w, ch), dtype)
                for _ in range(n_layers)
            )

        return {
            "bufs_b": bufs(h4, w4),
            "bufs_t": bufs(h8, w8),
            "s": jnp.zeros((), jnp.int32),
        }

    def _blend_decode(state, enc_b, enc_t, total):
        params = variables["params"]
        s = state["s"]
        bufs_b, pb = _postnet_stream(
            params["postnet_b"], state["bufs_b"], enc_b, s, total,
            dtype=dtype, n_layers=n_layers, kernel=kernel,
        )
        bufs_t, pt = _postnet_stream(
            params["postnet_t"], state["bufs_t"], enc_t, s, total,
            dtype=dtype, n_layers=n_layers, kernel=kernel,
        )
        quant_t, quant_b, _, _, _ = model.apply(
            variables, pb, pt, train=False, method=VQVAE.encode_quantized
        )
        out = model.apply(variables, quant_t, quant_b, method=VQVAE.decode)
        new_state = {"bufs_b": bufs_b, "bufs_t": bufs_t, "s": s + 1}
        return new_state, out.astype(jnp.float32)

    def _push_one(state, frame):
        if prepare_fn is not None:
            frame = prepare_fn(frame)
        enc_b, enc_t = model.apply(
            variables, frame[:, None], method=VQVAE.only_encode
        )
        return _blend_decode(
            state, enc_b[:, 0], enc_t[:, 0], jnp.int32(_FAR_FUTURE)
        )

    push_step = jax.jit(_push_one)

    @jax.jit
    def push_many_step(state, frames):
        """K frames per dispatch: `frames` is the per-frame push input
        with a LEADING time axis on every leaf ((K, B, H, W, in_ch) for
        plain streams; K-stacked raw pytrees with a prepare_fn). The ring
        buffers advance inside a lax.scan, so on a dispatch-latency-bound
        link (a tunneled accelerator: 80-136 ms RTT measured) the per-call
        overhead amortizes over K frames. Emits the K output slices in
        order — numerically identical to K push_step calls."""
        return jax.lax.scan(_push_one, state, frames)

    @jax.jit
    def flush_step(state, total):
        ref = state["bufs_b"][0]
        enc_b = jnp.zeros(ref.shape[:1] + ref.shape[2:], dtype)
        ref_t = state["bufs_t"][0]
        enc_t = jnp.zeros(ref_t.shape[:1] + ref_t.shape[2:], dtype)
        return _blend_decode(state, enc_b, enc_t, total)

    return init_state, push_step, flush_step, delay, push_many_step


class StreamingSwapper:
    """Frame-at-a-time swap inference with constant memory and
    `delay = n_postnet_layers * (temporal_kernel // 2)` frames of latency.

    >>> sw = StreamingSwapper(model, variables, height=256, width=256)
    >>> for frame in live_frames:           # (B, H, W, 6) in [-1, 1]
    ...     out = sw.push(frame)            # (B, H, W, out_ch) or None
    >>> tail = sw.flush()                   # the last `delay` frames

    Outputs are numerically the offline clip forward's (same zero 'SAME'
    padding at head and tail).
    """

    def __init__(
        self,
        model: VQVAE,
        variables,
        *,
        height: int,
        width: int,
        batch: int = 1,
        prepare_fn=None,
    ):
        (self._init_state, self._push, self._flush, self.delay,
         self._push_many) = make_stream_steps(model, variables, prepare_fn)
        self._shape = (batch, height, width)
        self.reset()

    def reset(self) -> None:
        b, h, w = self._shape
        self._state = self._init_state(b, h, w)
        self._n_pushed = 0
        self._flushed = False

    def push(self, frame) -> Optional[jnp.ndarray]:
        """Feed one input frame (or raw pytree when constructed with a
        prepare_fn); returns the decoded frame for input time
        `n_pushed - delay` once the pipeline is warm, else None."""
        if self._flushed:
            raise RuntimeError(
                "stream already flushed — call reset() before starting a "
                "new stream (the ring buffers hold the previous stream's "
                "zero-padded tail and would corrupt the next clip's "
                "first frames)"
            )
        self._state, out = self._push(
            self._state, jax.tree_util.tree_map(jnp.asarray, frame)
        )
        self._n_pushed += 1
        if self._n_pushed - 1 - self.delay >= 0:
            return out
        return None

    def push_many(self, frames) -> List[jnp.ndarray]:
        """Feed K frames in ONE device dispatch (the serving twin of the
        trainer's --steps_per_call): `frames` is the per-frame push input
        with a leading K axis on every leaf — (K, B, H, W, in_ch) for
        plain streams, a K-stacked raw pytree with a prepare_fn. Returns
        the decoded frames that became valid during this call, in input
        order (numerically identical to K push() calls). On a
        dispatch-latency-bound link the per-frame cost drops to ~RTT/K."""
        if self._flushed:
            raise RuntimeError(
                "stream already flushed — call reset() before starting a "
                "new stream"
            )
        frames = jax.tree_util.tree_map(jnp.asarray, frames)
        k = jax.tree_util.tree_leaves(frames)[0].shape[0]
        prev = self._n_pushed
        self._state, outs = self._push_many(self._state, frames)
        self._n_pushed += k
        # output slice j carries input time prev + j - delay
        first_valid = max(0, self.delay - prev)
        return [outs[j] for j in range(first_valid, k)]

    def flush(self) -> List[jnp.ndarray]:
        """End the stream: emit the final frames held in the pipeline.
        The stream is finished afterwards — reset() starts the next one."""
        if self._flushed:
            raise RuntimeError("stream already flushed — call reset()")
        self._flushed = True
        total = jnp.int32(self._n_pushed)
        outs = []
        for j in range(self.delay):
            t_out = self._n_pushed + j - self.delay
            self._state, out = self._flush(self._state, total)
            if 0 <= t_out < self._n_pushed:
                outs.append(out)
        return outs


class SwapSession:
    """Complete online face-swap serving: feed raw (frame, landmarks)
    pairs for source and target, get swapped frames out.

    Per pushed frame, ONE jitted device program runs the cross-identity
    geometry (hull mask, Umeyama similarity on the 5 stable landmarks,
    warp, composite — ops/swap.prepare_swap_batch, the math of reference
    face_translation_videos3_utils.py:139-194) fused with the streaming
    VQVAE forward. The reference can only do this offline over whole
    preprocessed clips; this is the live-serving equivalent with a
    3-frame delay and constant memory.

    >>> sess = SwapSession(model, variables, height=256, width=256)
    >>> out = sess.push(src_frame, src_lms, tgt_frame, tgt_lms)  # or None
    >>> tail = sess.flush()

    Frames are (H, W, 3) uint8/float RGB in [0, 255]; landmarks (68, 2)
    pixel coords. Outputs are (H, W, 3) float32 in [-1, 1].
    """

    def __init__(self, model: VQVAE, variables, *, height: int, width: int):
        from faceoff_tpu.ops.swap import prepare_swap_batch

        if model.in_channels != 6:
            raise ValueError("SwapSession needs the 6-channel model")

        def prepare(raw):
            # frames: (2, H, W, 3) src‖tgt stacked; lms: (2, 68, 2) — the
            # host stacks them so ONE device transfer carries both streams
            # (4 separate puts per frame cost 4 relay round trips on a
            # tunneled accelerator)
            f, l = raw["frames"], raw["lms"]
            streams = prepare_swap_batch(
                f[0][None], l[0][None], f[1][None], l[1][None]
            )
            return streams["input"]

        self._swapper = StreamingSwapper(
            model, variables, height=height, width=width, batch=1,
            prepare_fn=prepare,
        )

    @property
    def delay(self) -> int:
        return self._swapper.delay

    def reset(self) -> None:
        self._swapper.reset()

    def push(
        self, src_frame, src_landmarks, tgt_frame, tgt_landmarks
    ) -> Optional[jnp.ndarray]:
        import numpy as np

        raw = {
            "frames": np.stack(
                [np.asarray(src_frame), np.asarray(tgt_frame)]
            ),
            "lms": np.stack([
                np.asarray(src_landmarks, np.float32),
                np.asarray(tgt_landmarks, np.float32),
            ]),
        }
        out = self._swapper.push(raw)
        if out is None:
            return None
        return out[0, ..., :3]

    def push_many(
        self, src_frames, src_landmarks, tgt_frames, tgt_landmarks
    ) -> List[jnp.ndarray]:
        """Feed K (src, tgt) frame pairs in ONE device transfer + ONE
        dispatch (`--frames_per_call K` in the swap CLI / bench). Inputs
        are length-K sequences of what push() takes; returns the swapped
        frames that became valid during the call, in order. Adds no
        latency beyond the model's fixed `delay` — only the dispatch
        cadence changes (K frames per relay round trip instead of one)."""
        import numpy as np

        raw = {
            "frames": np.stack([
                np.stack([np.asarray(s), np.asarray(t)])
                for s, t in zip(src_frames, tgt_frames)
            ]),
            "lms": np.stack([
                np.stack([
                    np.asarray(sl, np.float32), np.asarray(tl, np.float32)
                ])
                for sl, tl in zip(src_landmarks, tgt_landmarks)
            ]),
        }
        return [o[0, ..., :3] for o in self._swapper.push_many(raw)]

    def flush(self) -> List[jnp.ndarray]:
        return [o[0, ..., :3] for o in self._swapper.flush()]


def stream_video(model: VQVAE, variables, video: jnp.ndarray) -> jnp.ndarray:
    """Run a whole (B, T, H, W, C) clip through the streaming path and
    return the (B, T, H, W, out_ch) reconstruction — the streaming
    equivalent of `model.apply(variables, video)[0]`, for parity tests and
    the `--streaming` swap CLI."""
    b, t, h, w = video.shape[:4]
    sw = StreamingSwapper(model, variables, height=h, width=w, batch=b)
    outs = []
    for i in range(t):
        out = sw.push(video[:, i])
        if out is not None:
            outs.append(out)
    outs.extend(sw.flush())
    return jnp.stack(outs, axis=1)
