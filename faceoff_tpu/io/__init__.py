from faceoff_tpu.io.video import save_frames_as_video, read_video_frames
from faceoff_tpu.io.checkpoint import CheckpointManager

__all__ = ["save_frames_as_video", "read_video_frames", "CheckpointManager"]
