"""Online serving: streaming (frame-at-a-time) swap inference and
ahead-of-time StableHLO export bundles for deployment."""

from faceoff_tpu.serve.export import (
    export_offline,
    export_streaming,
    load_bundle,
    save_bundle,
)
from faceoff_tpu.serve.streaming import (
    StreamingSwapper,
    SwapSession,
    make_stream_steps,
    stream_video,
)

__all__ = [
    "StreamingSwapper",
    "SwapSession",
    "export_offline",
    "export_streaming",
    "load_bundle",
    "make_stream_steps",
    "save_bundle",
    "stream_video",
]
