"""Online serving: streaming (frame-at-a-time) swap inference."""

from faceoff_tpu.serve.streaming import (
    StreamingSwapper,
    SwapSession,
    make_stream_steps,
    stream_video,
)

__all__ = [
    "StreamingSwapper",
    "SwapSession",
    "make_stream_steps",
    "stream_video",
]
