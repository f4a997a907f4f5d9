"""Online serving: streaming (frame-at-a-time) swap inference."""

from faceoff_tpu.serve.streaming import (
    StreamingSwapper,
    make_stream_steps,
    stream_video,
)

__all__ = ["StreamingSwapper", "make_stream_steps", "stream_video"]
